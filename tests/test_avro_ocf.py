"""Avro OCF source/sink tests (sources/avro_ocf.py, round 7):
byte-level codec roundtrips, verifying-parser refusals, and the Spark
write→read legs including file:// URI routing and nulls."""

from __future__ import annotations

import pytest

from pyprima_spark.sources.avro_ocf import (
    decode_avro_ocf,
    encode_avro_ocf,
    read_avro,
    write_avro_file,
)

_SCHEMA = {
    "type": "record",
    "name": "t",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
    ],
}

_ROWS = [
    {"id": 1, "name": "a", "score": 1.5},
    {"id": -9_000_000_000, "name": None, "score": -0.25},
    {"id": 7, "name": "üñï — unicode", "score": 1e300},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_codec_roundtrip_and_determinism(codec):
    payload = encode_avro_ocf(_ROWS, _SCHEMA, codec=codec)
    schema, back = decode_avro_ocf(payload)
    assert back == _ROWS
    assert schema["fields"][0]["name"] == "id"
    assert encode_avro_ocf(_ROWS, _SCHEMA, codec=codec) == payload


def test_multiblock_roundtrip():
    many = [{"id": i, "name": f"n{i}", "score": i / 8} for i in range(2500)]
    payload = encode_avro_ocf(many, _SCHEMA, codec="deflate", block_rows=700)
    _, back = decode_avro_ocf(payload)
    assert back == many


def test_parser_refusals():
    payload = encode_avro_ocf(_ROWS, _SCHEMA)

    with pytest.raises(ValueError, match="magic"):
        decode_avro_ocf(b"XXXX" + payload[4:])

    with pytest.raises(ValueError):
        decode_avro_ocf(payload[:-20])  # truncated block

    # corrupt the sync marker of the data block: must refuse
    corrupted = bytearray(payload)
    corrupted[-1] ^= 0xFF
    with pytest.raises(ValueError, match="sync"):
        decode_avro_ocf(bytes(corrupted))

    with pytest.raises(ValueError, match="codec"):
        encode_avro_ocf(_ROWS, _SCHEMA, codec="snappy")

    with pytest.raises(ValueError, match="unsupported field type"):
        encode_avro_ocf(
            [], {"type": "record", "name": "x",
                 "fields": [{"name": "m", "type": {"type": "map"}}]},
        )


def test_spark_write_read_roundtrip_via_file_uri(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, None, -0.25, False), (3, "c", 0.0, None)],
        "id bigint, name string, score double, ok boolean",
    )
    uri = "file://" + str(tmp_path / "t.avro")
    man = write_avro_file(df, uri, order_by=["id"]).collect()
    assert man[0].n_rows == 3

    back = read_avro(
        spark, uri, "id bigint, name string, score double, ok boolean"
    ).collect()
    got = sorted((r.id, r.name, r.score, r.ok) for r in back)
    assert got == [(1, "a", 1.5, True), (2, None, -0.25, False), (3, "c", 0.0, None)]


def test_spark_read_maps_fields_by_name(spark, tmp_path):
    df = spark.createDataFrame([(5, "x", 2.5)], "id bigint, name string, score double")
    path = str(tmp_path / "n.avro")
    write_avro_file(df, path).collect()
    # request a schema with a missing column and a subset, by name
    back = read_avro(spark, path, "score double, id bigint, missing string").collect()
    assert back[0].score == 2.5 and back[0].id == 5 and back[0].missing is None


def test_nullable_bigint_above_2_53_roundtrips_exactly(spark, tmp_path):
    """Review r7 finding: Arrow's null promotion to float64 silently
    rounded 64-bit ids above 2^53; the writer now ships integral
    columns as strings across the Arrow hop."""
    big = 9007199254740993  # 2^53 + 1, unrepresentable in float64
    df = spark.createDataFrame(
        [(big, "a"), (None, "b"), (big + 4, None)],
        "id bigint, name string",
    )
    path = str(tmp_path / "big.avro")
    write_avro_file(df, path, order_by=["name"]).collect()
    back = {r.name: r.id for r in read_avro(
        spark, path, "id bigint, name string").collect()}
    assert back == {"a": big, "b": None, None: big + 4}


def test_nan_double_documented_conflation(spark, tmp_path):
    """NaN in a nullable double writes as Avro null (pandas cannot
    distinguish Spark NULL from NaN across the Arrow hop) — and the
    writer must not crash on it."""
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 2.5), (3, None)], "id bigint, v double"
    )
    path = str(tmp_path / "nan.avro")
    write_avro_file(df, path).collect()
    back = {r.id: r.v for r in read_avro(spark, path, "id bigint, v double").collect()}
    assert back[2] == 2.5 and back[1] is None and back[3] is None


def test_wide_union_and_missing_schema_refused():
    with pytest.raises(ValueError, match="unsupported field type"):
        encode_avro_ocf(
            [], {"type": "record", "name": "x",
                 "fields": [{"name": "v", "type": ["null", "int", "string"]}]},
        )
    with pytest.raises(ValueError, match="unsupported field type"):
        encode_avro_ocf(
            [], {"type": "record", "name": "x",
                 "fields": [{"name": "v", "type": ["string", "null"]}]},
        )
    # OCF with an empty metadata map: must be ValueError, not KeyError
    import hashlib
    payload = b"Obj\x01" + b"\x00" + hashlib.md5(b"x").digest()
    with pytest.raises(ValueError, match="avro.schema"):
        decode_avro_ocf(payload)


def test_read_avro_ext_filter_none_reads_any_extension(spark, tmp_path):
    """ADVICE r7: the hardcoded '*.avro' pathGlobFilter silently dropped
    OCF files with other extensions; ext_filter=None must read them."""
    df = spark.createDataFrame([(7, "z")], "id bigint, name string")
    path = str(tmp_path / "data.ocf")
    write_avro_file(df, path).collect()
    # default filter skips the .ocf file entirely (empty, not wrong)
    assert read_avro(spark, path, "id bigint, name string").count() == 0
    back = read_avro(
        spark, path, "id bigint, name string", ext_filter=None
    ).collect()
    assert [(r.id, r.name) for r in back] == [(7, "z")]
