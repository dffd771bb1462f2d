"""Sinks: partitioned parquet and bucketed tables.

The reference writes one flat CSV/parquet per output
(generate_intermediate_files.py:116 `to_csv`, :131 hdf). At 100 TB a
flat file is unusable; the scale-correct sinks are:

* **Hive-partitioned parquet** — `partitionBy(keys)` lays files out as
  `key=value/` directories so downstream readers get partition PRUNING
  (a filter on the partition key never touches non-matching files).
* **Bucketed tables** — `bucketBy(n, key)` pre-shuffles rows into a
  fixed number of hash buckets per partition; two tables bucketed the
  same way join with ZERO shuffle (Catalyst sees the co-partitioning).
  This is how a 100 TB fact table joins a 10 TB fact table nightly
  without re-shuffling either side every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet sink.

    Rows are NOT repartitioned here by default: `partitionBy` splits
    each task's output by key, so k partition keys × t tasks gives up
    to k*t files. Callers with high task counts should
    `df.repartition(*partition_cols)` first (one shuffle) to get one
    file per key — the classic small-files trade-off made explicit.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Requires a session catalog (warehouse dir); joins between tables
    bucketed on the same column with the same bucket count skip both
    shuffle AND sort (SortMergeJoin reads pre-sorted buckets).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_orc(df, path: str) -> None:
    """ORC sink (overwrite) — the interchange format for Hive-era
    consumers; column pruning and predicate pushdown survive the
    round-trip (asserted in tests/test_sources_formats.py)."""
    df.write.mode("overwrite").orc(path)


def write_jsonl(df, path: str) -> None:
    """JSON-lines sink (overwrite) — one JSON object per line, the
    interchange format for streaming/LLM-pipeline consumers. Pair with
    readers.read_jsonl and an explicit schema to round-trip losslessly
    (microsecond timestamps included — the default format truncates to
    milliseconds)."""
    df.write.mode("overwrite").option(
        "timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ).json(path)
