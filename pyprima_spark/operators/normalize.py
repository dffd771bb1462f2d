"""Group-relative normalization.

Two reference patterns:

* share-of-total within a group — sector shares per country
  (correction_functions.py:370-378): value / sum(value) over group;
* profile normalization to sum 1 over a whole series
  (correction_functions.py:46-47): the same with the series key as the
  group.

Both are a window sum over the group key — a single shuffle on the
group key, partial-aggregated map-side by Spark's window exchange; no
self-join, no collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def group_share(
    df: DataFrame,
    group_cols: Sequence[str],
    value: Column | str,
    out_col: str = "share",
    precision: int = 6,
) -> DataFrame:
    value = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(*group_cols)
    total = F.sum(value).over(w)
    share = F.when(total == 0, F.lit(0.0)).otherwise(value / total)
    return df.withColumn(out_col, F.round(share, precision))
