"""Pure interval-overlap join via time-bucket chunking.

A join whose only predicate is a range (`probe.ts BETWEEN ival.start
AND ival.end`) has no equi-key, so Spark's built-in physical choice is
BroadcastNestedLoopJoin — O(|probe| x |intervals|) comparisons and a
broadcast of one whole side. That dies long before 100 TB.

The scalable layout manufactures an equi-key: every interval is
exploded onto each fixed-width time bucket it overlaps, while each
probe row lands in exactly ONE bucket. The join then hash-partitions
on the bucket id like any other equi-join, and the exact range
predicate is evaluated within buckets. Because the probe side maps to
a single bucket, a (probe, interval) pair can meet at most once — no
post-join dedup pass is needed.

Bucket width trades replication for selectivity: intervals are
replicated ceil(len/width)+1 times, and each bucket compares only
co-bucketed rows. Width ~ median interval length keeps both bounded.

Reference analogue: pyPRIMA clips rasters against region shapes by
first intersecting bounding boxes (spatial_functions.py:19-60) — the
same "cheap coarse key first, exact predicate second" pattern, here in
the time dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(ts: Column, width_s: int) -> Column:
    # unix seconds truncate sub-second digits; truncation is monotone,
    # so a probe strictly before an interval's end can never land in a
    # later bucket than the interval's last one.
    return F.floor(F.unix_timestamp(ts) / F.lit(width_s))


def interval_overlap_join(
    probe: DataFrame,
    intervals: DataFrame,
    probe_ts: str = "ts",
    start: str = "w_start",
    end: str = "w_end",
    width_s: int = 600,
) -> DataFrame:
    """Join each `probe` row to every interval with
    ``start <= probe_ts < end``, without a nested-loop plan.

    `probe` and `intervals` may share no key columns; all interval
    columns are carried through. Column name collisions must be
    resolved by the caller beforehand.
    """
    ival_b = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(_bucket(F.col(start), width_s), _bucket(F.col(end), width_s))
        ),
    )
    probe_b = probe.withColumn("_bk", _bucket(F.col(probe_ts), width_s))
    return (
        probe_b.join(ival_b, on="_bk")
        .filter((F.col(probe_ts) >= F.col(start)) & (F.col(probe_ts) < F.col(end)))
        .drop("_bk")
    )
