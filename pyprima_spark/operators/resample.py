"""Time resampling: aggregate sub-hourly samples to coarser buckets.

Reference: 15-minute standard load profiles aggregated to hourly
(correction_functions.py:133-139 groups on the hour prefix). Spark-first:
``date_trunc`` + grouped agg — one shuffle on (bucket, series key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    unit: str,
    group_cols: list[str],
    aggs: list[Column],
    bucket_col: str = "bucket",
) -> DataFrame:
    bucket = F.date_trunc(unit, F.col(ts_col))
    return (
        df.withColumn(bucket_col, bucket)
        .groupBy(bucket_col, *group_cols)
        .agg(*aggs)
    )
