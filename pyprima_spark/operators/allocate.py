"""Capped proportional allocation (water-filling).

Reference analogue: ``distribute_renewable_capacities_IRENA``
(lib/correction_functions.py:749-806) + the per-site placement in
``create_shapefiles_of_ren_power_plants``: a country total is spread
over candidate sites proportional to their potential, but no site may
exceed its cap; what the capped sites cannot take is re-distributed
over the remaining sites, iteratively, until the total is placed.

Spark-first layout: the loop is a FIXED number of rounds of window
aggregates over the group key — the site table (the scale side)
partitions once on the group and every round reuses that partitioning
(one Exchange, R sort-window passes, no driver-side iteration state).
Round count bounds convergence: each round saturates at least one site
per group that still binds, so ``rounds`` ≈ the number of distinct cap
tiers matters, not site count.

Determinism (oracle parity): weights and caps are integers by contract,
group weight sums are integer-exact, and the spent-so-far sum is an
exact DECIMAL sum cast back to double — every per-round float op is
then a deterministic function of identical doubles in both engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyprima_spark.functions.agg import DEC

EPS = 1e-9


def capped_allocate(
    sites: DataFrame,
    totals: DataFrame,
    group_cols: Sequence[str],
    weight_col: str,
    cap_col: str,
    total_col: str,
    rounds: int = 4,
    out_col: str = "alloc",
) -> DataFrame:
    """Allocate ``totals[total_col]`` over sites by ``weight_col``
    shares, clipped at ``cap_col`` per site, re-distributing the
    residual for ``rounds`` iterations."""
    df = sites.join(totals, on=list(group_cols), how="inner").withColumn(
        out_col, F.lit(0.0)
    )
    w = Window.partitionBy(*group_cols)
    for _ in range(rounds):
        active = (F.col(cap_col) - F.col(out_col)) > EPS
        sumw = (
            F.sum(F.when(active, F.col(weight_col)).otherwise(F.lit(0)))
            .over(w)
            .cast("double")
        )
        spent = F.sum(F.col(out_col).cast(DEC)).over(w).cast("double")
        rem = F.col(total_col) - spent
        give = F.when(
            active & (sumw > 0) & (rem > EPS),
            F.least(
                rem * F.col(weight_col) / sumw,
                F.col(cap_col) - F.col(out_col),
            ),
        ).otherwise(F.lit(0.0))
        df = df.withColumn(out_col, F.col(out_col) + give)
    return df
