"""Weighted disaggregation + re-aggregation.

The reference's core move (generate_load_timeseries,
generate_intermediate_files.py:204-397): a country-level total is
allocated down to members (pixels) proportionally to a weight
(population / land-use factor), then the members are re-aggregated on a
different dimension (subregion).

Spark-first: one window to compute each member's weight share within
its group (shuffle on the group key), one join of group totals
(broadcast if the group dim is small), one re-aggregation on the target
dimension. The member table — the 100 TB side — is shuffled at most
once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def disaggregate(
    members: DataFrame,
    totals: DataFrame,
    group_cols: Sequence[str],
    weight: Column,
    total_col: str,
    out_col: str = "allocated",
) -> DataFrame:
    """Allocate ``totals[total_col]`` to members by weight share."""
    w = Window.partitionBy(*[members[c] for c in group_cols])
    wsum = F.sum(weight).over(w)
    share = F.when(wsum == 0, F.lit(0.0)).otherwise(weight / wsum)
    alloc = members.withColumn("__share", share)
    return alloc.join(totals, on=list(group_cols), how="inner").withColumn(
        out_col, F.col("__share") * F.col(total_col)
    ).drop("__share")
