"""Cumulative-count name deduplication.

The reference deduplicates power-plant names by appending the per-name
cumcount, with the first occurrence left unsuffixed
(correction_functions.py:474: ``Name + cumcount().astype(str).replace("0","")``).

Spark-first: ``row_number`` over a window partitioned by the name and
ordered by a deterministic key. One shuffle on the name key; skew-safe
for realistic name cardinalities (AQE handles a hot 'unnamed' key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_names(
    df: DataFrame, name_col: str, order_col: str, out_col: str = "name_dedup"
) -> DataFrame:
    w = Window.partitionBy(name_col).orderBy(order_col)
    rn = F.row_number().over(w)
    suffix = F.when(rn == 1, F.lit("")).otherwise((rn - 1).cast("string"))
    return df.withColumn(out_col, F.concat(F.col(name_col), suffix))
