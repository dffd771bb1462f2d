"""Round-trip contracts for the JSONL and ORC source formats.

The bar: a table written to the alternate format and read back is
value-identical to the parquet original, and the columnar format keeps
the same pushdown/pruning behavior the engine relies on everywhere
else.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyprima_spark.catalog import load_table
from pyprima_spark.sources.readers import read_jsonl, read_orc
from pyprima_spark.sources.writers import write_jsonl, write_orc

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def _sorted_rows(df, cols):
    return [tuple(r) for r in df.select(*cols).orderBy(*cols).collect()]


def test_jsonl_round_trip_events(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "events_jsonl")
    write_jsonl(ev, path)
    back = read_jsonl(spark, path, EVENTS_DDL)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    assert _sorted_rows(back, cols) == _sorted_rows(ev, cols)


def test_jsonl_malformed_lines_null_out(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1, "b": "x"}\nnot json at all\n{"a": 2, "b": "y"}\n')
    df = read_jsonl(spark, str(p), "a bigint, b string")
    rows = [(r.a, r.b) for r in df.collect()]
    assert (1, "x") in rows and (2, "y") in rows and len(rows) == 3


def test_orc_round_trip_and_pushdown(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    path = str(tmp_path / "lineitem_orc")
    write_orc(li, path)
    back = read_orc(spark, path)
    cols = ["l_orderkey", "l_partkey", "l_quantity", "l_shipdate"]
    assert _sorted_rows(back, cols) == _sorted_rows(li, cols)

    pruned = back.filter(F.col("l_quantity") > 30).select("l_orderkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """A landed dataset whose later batches gained a column must read
    as ONE unified schema with nulls backfilled — the mergeSchema
    contract an append-only lake relies on when producers evolve."""
    base = tmp_path / "evolving"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(str(base / "batch=1"))
    spark.createDataFrame(
        [(3, "c", 30.5)], "id long, name string, score double"
    ).write.parquet(str(base / "batch=2"))
    df = spark.read.option("mergeSchema", "true").parquet(str(base))
    assert {f.name for f in df.schema.fields} >= {"id", "name", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and abs(rows[3].score - 30.5) < 1e-9


def test_binary_file_ingest_to_audio_features(spark, tmp_path):
    """Raw-file multimodal ingest (sources/readers.read_binary_files):
    real WAV files on disk enter through Spark's binaryFile source and
    flow into the REAL audio decoder unchanged — the lakehouse ingest
    step in front of operators/multimodal.py. Also checks the length
    predicate excludes an oversized blob and the glob excludes foreign
    extensions at listing time."""
    import io
    import wave as _wave

    import numpy as np

    from pyprima_spark.operators.multimodal import (
        WAV_FRAMERATE,
        audio_features_wav,
    )
    from pyprima_spark.sources.readers import read_binary_files

    media_dir = tmp_path / "media"
    media_dir.mkdir()
    amps = {0: 2048, 1: 4096, 2: 8192}
    for d, amp in amps.items():
        n = 800
        idx = np.arange(n)
        samples = np.where((idx // 16) % 2 == 0, amp, -amp).astype("<i2")
        buf = io.BytesIO()
        with _wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(WAV_FRAMERATE)
            w.writeframes(samples.tobytes())
        (media_dir / f"clip_{d}.wav").write_bytes(buf.getvalue())
    # decoys: a foreign extension and an oversized blob
    (media_dir / "notes.txt").write_bytes(b"not audio")
    (media_dir / "clip_big.wav").write_bytes(b"\x00" * 300_000)

    import pyspark.sql.functions as F

    raw = read_binary_files(
        spark, str(media_dir), glob="*.wav", max_bytes=100_000
    )
    media = raw.select(
        F.regexp_extract(F.col("path"), r"clip_(\d+)\.wav", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("content").alias("payload"),
    )
    feats = {r.doc_id: r for r in audio_features_wav(media).collect()}
    assert set(feats) == set(amps)  # decoys excluded by glob + length
    for d, amp in amps.items():
        r = feats[d]
        assert abs(r.peak - round(amp / 32768.0, 6)) < 1e-12, d
        assert abs(r.rms - r.peak) < 1e-12, d  # square wave
        assert abs(r.duration_s - round(800 / WAV_FRAMERATE, 6)) < 1e-12
