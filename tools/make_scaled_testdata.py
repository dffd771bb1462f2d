"""Materialize an N×-scale replica of the driver's sf0.1 tables
(VERDICT r7 missing-item 3: /root/testdata tops out at sf0.1, so
full-catalog behaviour at sf1 was never measured — the 8× stress probe
covers only the dedup/ANN family).

Same manufacturing rule as tools/stress_probe.py, extended to every
table with FOREIGN-KEY-CONSISTENT offsets: replica r of table T adds
``r * (max_key + 1)`` to each key column, using the SAME base for a key
wherever it appears (o_custkey moves with c_custkey, l_orderkey with
o_orderkey, …), so joins land exactly as they do in the base data and
every replica is a disjoint, structurally identical shard. Dimension
tables (region, nation) are copied once — their key domains are part of
the schema's semantics, and FK columns referencing them are left
untouched. documents gets a per-replica text suffix (near-dup structure
per replica, not N-way exact duplicates) with n_chars recomputed;
embeddings a tiny per-replica first-coordinate rotation (LSH bucket
populations keep their shape).

The result is a directory bench.py can run the ENTIRE catalog against:

    python tools/make_scaled_testdata.py 10 /root/repo/testdata_sf1x
    SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1x python bench.py

Row counts scale exactly N×; distributions, join fanouts and time
ranges are those of the driver's own generator (event density per hour
grows N× — the correct reading for concurrency/session keys at a
bigger deployment, not a distribution drift).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"

# key column -> every (table, column) it appears as. One offset base per
# key keeps referential integrity across replicas.
KEY_FAMILIES = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

DIM_COPY = ("region", "nation")
FACTS = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _bases(spark) -> dict:
    """One offset base per key family: max over every appearance + 1."""
    bases = {}
    for fam, cols in KEY_FAMILIES.items():
        worst = 0
        for table, col in cols:
            df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
            worst = max(worst, df.agg(F.max(col)).collect()[0][0])
        bases[fam] = worst + 1
    return bases


def _replica(spark, table: str, r: int, bases: dict):
    df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
    offsets = {
        col: bases[fam]
        for fam, cols in KEY_FAMILIES.items()
        for t, col in cols
        if t == table
    }
    exprs = []
    for field in df.schema.fields:
        c = field.name
        if c in offsets:
            exprs.append(
                (F.col(c) + F.lit(r * offsets[c]))
                .cast(field.dataType)
                .alias(c)
            )
        elif table == "documents" and c == "text":
            exprs.append(
                F.concat(F.col("text"), F.lit(f" replica{r}")).alias("text")
            )
        elif table == "documents" and c == "n_chars":
            exprs.append(
                F.length(
                    F.concat(F.col("text"), F.lit(f" replica{r}"))
                )
                .cast(field.dataType)
                .alias("n_chars")
            )
        elif table == "embeddings" and c == "embedding":
            exprs.append(
                F.expr(
                    "transform(embedding, (x, i) -> CASE WHEN i = 0 "
                    f"THEN cast(x + {r} * 0.01 as float) ELSE x END)"
                ).alias("embedding")
            )
        else:
            exprs.append(F.col(c))
    return df.select(*exprs)


def _compact_to_single_file(dir_path: str) -> None:
    """Rewrite a Spark part-file directory as ONE parquet file at the
    same path — the driver's testdata layout. Every consumer is built
    for that shape: stream_events' pathGlobFilter matches the file
    name, DuckDB oracles read the bare path, and widen_scan exists
    precisely to re-spread single-big-file scans."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    table = pq.read_table(dir_path)
    fd, tmp = tempfile.mkstemp(suffix=".parquet", dir=os.path.dirname(dir_path))
    os.close(fd)
    pq.write_table(table, tmp)
    shutil.rmtree(dir_path)
    os.replace(tmp, dir_path)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1x"
    # SPARK_SCALED_KEEP_PARTFILES=1 skips the single-file compaction and
    # leaves Spark part-file directories — the cluster-shaped layout the
    # BENCH_sf1x partfile_dir_layout measurements run against. Default
    # stays driver-shaped single files (see _compact_to_single_file).
    keep_parts = os.environ.get("SPARK_SCALED_KEEP_PARTFILES") == "1"
    from pyprima_spark.session import build_session

    spark = build_session("make_scaled_testdata")
    bases = _bases(spark)
    for table in DIM_COPY:
        df = spark.read.parquet(os.path.join(SF_DIR, f"{table}.parquet"))
        path = os.path.join(out_dir, f"{table}.parquet")
        df.write.mode("overwrite").parquet(path)
        if not keep_parts:
            _compact_to_single_file(path)
        print(f"{table}: copied {df.count()} rows")
    for table in FACTS:
        out = _replica(spark, table, 0, bases)
        for r in range(1, n):
            out = out.unionByName(_replica(spark, table, r, bases))
        path = os.path.join(out_dir, f"{table}.parquet")
        out.write.mode("overwrite").parquet(path)
        if not keep_parts:
            _compact_to_single_file(path)
        print(f"{table}: wrote {spark.read.parquet(path).count()} rows")
    spark.stop()


if __name__ == "__main__":
    main()
