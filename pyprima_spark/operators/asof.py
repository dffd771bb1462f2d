"""As-of (most-recent-prior) join — a temporal operator Spark lacks as a
built-in, expressed as a union + running ``last_value`` window instead
of a range join.

The reference's interval-matching (util.py:228-252
assign_values_based_on_series) is the static cousin of this; the as-of
join is its time-series form, needed whenever a stream of measurements
must be annotated with the latest preceding reference point (prices,
calibrations, model checkpoints).

Scale shape: both sides are unioned and shuffled ONCE on the join key,
then sorted within partitions — O(n log n) per key group, no
per-row probing, no range-join explosion. A naive
``left.ts >= right.ts`` join is a near-cartesian per key; the window
formulation is the plan you want at 100 TB: one Exchange + one Sort,
all whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    how: str = "inner",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the right row's values at the greatest
    ``right_ts <= left_ts`` with the same key (inner semantics: left
    rows with no prior right row are dropped).

    Ties at equal timestamps match (``>=``), mirroring DuckDB/kdb ASOF.

    Duplicate right rows at the same (key, ts) are resolved
    deterministically: the window sort is extended with the carried
    value columns (ascending), so the running ``last`` always lands on
    the greatest value tuple of the tie — no extra shuffle, and the
    result is reproducible across engines and runs (DuckDB's bare ASOF
    picks an arbitrary tied row; oracles must dedup with the same
    greatest-tuple rule).

    ``how="left"`` keeps left rows with no prior right row (carried
    columns null).  ``tolerance_us`` bounds the staleness of a match:
    a prior right row further than that many microseconds behind the
    left timestamp is treated as no match (pandas ``merge_asof``
    tolerance semantics).  Both are pure post-masks on the same
    single-shuffle window plan — no extra exchange.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (key, right_ts)]
    lhs = left.withColumn("_side", F.lit(1)).withColumn("_ets", F.col(left_ts))
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("_ets"),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    merged = lhs.unionByName(rhs, allowMissingColumns=True)
    # Right rows sort before left rows at equal ts so >= ties match;
    # value columns (nulls-first on left rows) break right-row ties at
    # identical (key, ts) so `last` is deterministic.
    w = (
        Window.partitionBy(key)
        .orderBy(
            "_ets",
            "_side",
            *[F.asc_nulls_first(f"{c}{suffix}") for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
    out = merged.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in carried]
    )
    matched = F.col(f"_f_{right_ts}{suffix}").isNotNull()
    if tolerance_us is not None:
        matched = matched & (
            F.unix_micros(F.col("_ets"))
            - F.unix_micros(F.col(f"_f_{right_ts}{suffix}"))
            <= F.lit(tolerance_us)
        )
    left_rows = out.filter(F.col("_side") == 1)
    if how == "inner":
        left_rows = left_rows.filter(matched)
        mask = [F.col(f"_f_{c}").alias(c) for c in carried]
    else:
        mask = [
            F.when(matched, F.col(f"_f_{c}")).alias(c) for c in carried
        ]
    return left_rows.select(*[F.col(c) for c in left.columns], *mask)
