"""Stateful streaming rate-limit (quota) enforcement.

Online form of the batch ``rate_limit_flags`` audit (plans/round5.py):
every event beyond the Nth within a (user, hour) is throttled at
ingestion time.  State per key is ONE integer (events seen so far), the
minimal stateful-operator shape — bounded, mergeable, and append-mode
safe because the seen-counter is monotone: once an event is emitted
with its flag, no later batch can change it.

Keys are (user_id, hour) — the hour component means state stops growing
per user over time only if evicted; production would add an event-time
timeout one hour past the window (the sessions module demonstrates
exactly that eviction pattern); kept NoTimeout here so the availableNow
batch replay is deterministic.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RATE_LIMIT = 10

OUT_SCHEMA = "event_id long, event_type string, throttled boolean"


def _quota_group(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: Any
) -> Iterable[pd.DataFrame]:
    rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    seen = state.get[0] if state.exists else 0
    n = len(rows)
    state.update((int(seen + n),))
    yield pd.DataFrame(
        {
            "event_id": rows["event_id"].astype("int64"),
            "event_type": rows["event_type"],
            "throttled": [(seen + i) >= RATE_LIMIT for i in range(n)],
        }
    )


def quota_flags(events: DataFrame) -> DataFrame:
    """Per-event throttle flags from the stateful quota operator; input
    needs (user_id, ts, event_id, event_type) — batch or stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = events.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts",
        "event_id",
        "event_type",
    )
    return keyed.groupBy("user_id", "hour").applyInPandasWithState(
        _quota_group,
        outputStructType=OUT_SCHEMA,
        stateStructType="n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_quota_stream(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_quota"
) -> DataFrame:
    """Run the quota stream to completion (availableNow) and return the
    per-event-type throttle census (same columns as the batch audit)."""
    from pyprima_spark.streaming.events import stream_events

    out = quota_flags(stream_events(spark, sf_dir))
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    flagged = spark.table(query_name)
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("throttled"), 1).otherwise(0)).alias("n_throttled"),
        )
        .select(
            "event_type",
            "n_events",
            "n_throttled",
            F.expr("cast(n_throttled * 10000 div n_events as int)").alias(
                "throttled_bp"
            ),
        )
        .orderBy("event_type")
    )
