"""Slowly-changing-dimension (type 2) compaction of a change log.

Turns an append-only event log into versioned dimension rows: one row
per contiguous run of an attribute value per key, with
``[valid_from, valid_to)`` boundaries. The standard warehouse move for
"what was this user's state at time T" queries, and the batch analogue
of the reference's per-entity timeline assembly
(generate_intermediate_files.py:115-201, which stitches per-region
state series from point observations).

Plan shape: two windows over the same (key, ts) partitioning — a lag
to find run starts, then a lead over the filtered run-start rows for
the closing boundary. Catalyst reuses one sort/exchange for both
windows (same partition + order keys), so the whole operator is a
single shuffle of the log keyed by entity — bounded per-entity state,
no driver involvement, skew only if one entity dominates the log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    log: DataFrame,
    key: str,
    attr: str,
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Compact `log` into type-2 rows (key, attr value, valid_from,
    valid_to, version). `valid_to` is null for the open current row.

    `tiebreak` makes equal-timestamp ordering deterministic — the same
    total order must be mirrored by any oracle.
    """
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    runs = (
        log.withColumn("_prev", F.lag(attr).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr)))
        .drop("_prev")
    )
    w2 = Window.partitionBy(key).orderBy(ts, tiebreak)
    return (
        runs.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(w2))
        .withColumn("version", F.row_number().over(w2))
    )
