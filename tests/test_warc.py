"""WARC source/sink tests (sources/warc.py): record codec roundtrips,
verifying-parser refusals, gzip member handling, the HTTP split
helper, and the Spark write→read legs."""

from __future__ import annotations

import gzip
import io

import pytest

from pyprima_spark.sources.warc import (
    decode_warc_file,
    encode_warc_record,
    read_warc,
    split_http_response,
    write_warc_file,
)

_H = {
    "WARC-Record-ID": "<urn:uuid:0001>",
    "WARC-Type": "resource",
    "WARC-Date": "2026-08-16T00:00:00Z",
    "WARC-Target-URI": "https://example.org/a",
    "Content-Type": "text/plain",
}


def _gz_member(rec: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(rec)
    return buf.getvalue()


def test_record_roundtrip_plain_and_gz():
    r1 = encode_warc_record(_H, b"hello world")
    r2 = encode_warc_record({**_H, "WARC-Record-ID": "<urn:uuid:0002>"}, b"")
    for payload in (r1 + r2, _gz_member(r1) + _gz_member(r2)):
        recs = decode_warc_file(payload)
        assert len(recs) == 2
        assert recs[0][0]["WARC-Record-ID"] == "<urn:uuid:0001>"
        assert recs[0][1] == b"hello world"
        assert recs[1][1] == b""
        assert recs[0][0]["Content-Length"] == "11"


def test_multi_record_single_gzip_member():
    r1 = encode_warc_record(_H, b"a")
    r2 = encode_warc_record({**_H, "WARC-Record-ID": "<urn:uuid:0002>"}, b"b")
    recs = decode_warc_file(_gz_member(r1 + r2))
    assert [r[1] for r in recs] == [b"a", b"b"]


def test_folded_header_line():
    rec = encode_warc_record(_H, b"x")
    # splice a folded continuation into the Target-URI line
    folded = rec.replace(
        b"WARC-Target-URI: https://example.org/a\r\n",
        b"WARC-Target-URI: https://example.org\r\n /a\r\n",
    )
    headers, content = decode_warc_file(folded)[0]
    assert headers["WARC-Target-URI"] == "https://example.org /a"
    assert content == b"x"


def test_parser_refusals():
    rec = encode_warc_record(_H, b"hello world")

    with pytest.raises(ValueError, match="version marker"):
        decode_warc_file(b"HTTP/1.1 200 OK\r\n\r\n")

    with pytest.raises(ValueError, match="truncated WARC content"):
        decode_warc_file(rec[:-6])

    # shrink Content-Length so the terminator lands mid-body
    bad = rec.replace(b"Content-Length: 11", b"Content-Length: 10")
    with pytest.raises(ValueError, match="terminator"):
        decode_warc_file(bad)

    with pytest.raises(ValueError, match="mandatory"):
        encode_warc_record({"WARC-Type": "resource"}, b"")

    with pytest.raises(ValueError, match="mandatory"):
        decode_warc_file(
            b"WARC/1.0\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
        )

    with pytest.raises(ValueError, match="CR/LF"):
        encode_warc_record({**_H, "WARC-Target-URI": "a\r\nb"}, b"")

    with pytest.raises(ValueError, match="gzip"):
        decode_warc_file(b"\x1f\x8b\x00bad")


def test_split_http_response():
    content = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>hi"
    head, body = split_http_response(content)
    assert head.startswith("HTTP/1.1 200 OK")
    assert body == b"<html>hi"
    with pytest.raises(ValueError, match="separator"):
        split_http_response(b"no separator here")


@pytest.mark.parametrize("compress", [True, False])
def test_spark_write_read_roundtrip(spark, tmp_path, compress):
    rows = [
        (f"<urn:uuid:{i:04d}>", "resource", f"https://e.org/{i}",
         "2026-08-16T00:00:00Z", "text/plain", f"doc {i}".encode())
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "record_id string, warc_type string, target_uri string,"
        " warc_date string, content_type string, content binary",
    )
    name = "c.warc.gz" if compress else "c.warc"
    uri = "file://" + str(tmp_path / name)
    man = write_warc_file(df, uri, compress=compress).collect()
    assert man[0]["n_records"] == 20

    back = read_warc(spark, str(tmp_path))
    got = sorted(back.collect(), key=lambda r: r["record_id"])
    assert len(got) == 20
    assert got[3]["target_uri"] == "https://e.org/3"
    assert bytes(got[3]["content"]) == b"doc 3"

    # byte-identical rerun (mtime pinned, records sorted)
    uri2 = "file://" + str(tmp_path / ("d." + name))
    write_warc_file(df, uri2, compress=compress).collect()
    import pathlib

    assert (tmp_path / name).read_bytes() == (
        tmp_path / ("d." + name)
    ).read_bytes()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6), st.binary(max_size=80)),
        max_size=6,
    ),
    st.booleans(),
)
def test_warc_property_roundtrip(items, compress):
    recs = [
        encode_warc_record(
            {
                "WARC-Record-ID": f"<urn:uuid:{i}-{n}>",
                "WARC-Type": "resource",
                "WARC-Date": "2026-08-16T00:00:00Z",
            },
            body,
        )
        for i, (n, body) in enumerate(items)
    ]
    blob = b"".join(_gz_member(r) for r in recs) if compress else b"".join(recs)
    back = decode_warc_file(blob)
    assert [c for _, c in back] == [b for _, b in items]
    assert all(h["WARC-Type"] == "resource" for h, _ in back)


def test_header_value_latin1_lenient():
    # Real crawl archives carry Latin-1/raw bytes in header values
    # (e.g. URIs); values decode with U+FFFD replacement so one bad
    # header cannot make the whole archive file unreadable.
    rec = encode_warc_record(_H, b"x")
    bad = rec.replace(
        b"WARC-Target-URI: https://example.org/a",
        b"WARC-Target-URI: https://example.org/caf\xe9",
    )
    # re-fix Content-Length framing is unaffected (header-only edit)
    headers, content = decode_warc_file(bad)[0]
    assert headers["WARC-Target-URI"] == "https://example.org/caf�"
    assert content == b"x"


def test_sharded_write_read_roundtrip(spark, tmp_path):
    """write_warc_shards: segment count exact (incl. empty shards),
    byte-identical reruns, and read_warc recovers every record."""
    from pyprima_spark.sources.warc import write_warc_shards

    rows = [
        (
            f"<urn:uuid:{i:04d}>",
            "resource",
            f"https://s{i % 3}.example/{i}",
            "2026-08-16T00:00:00Z",
            "text/plain",
            f"body {i}".encode(),
        )
        for i in range(23)
    ]
    df = spark.createDataFrame(
        rows,
        "record_id string, warc_type string, target_uri string,"
        " warc_date string, content_type string, content binary",
    )
    out1 = "file://" + str(tmp_path / "seg1")
    man = write_warc_shards(df, out1, n_shards=6).collect()
    assert [m["shard"] for m in man] == list(range(6))
    assert sum(m["n_records"] for m in man) == 23
    names = sorted(p.name for p in (tmp_path / "seg1").iterdir())
    assert names == [f"seg-{k:05d}-of-00006.warc.gz" for k in range(6)]

    back = read_warc(spark, str(tmp_path / "seg1")).collect()
    assert sorted(r["record_id"] for r in back) == sorted(
        r[0] for r in rows
    )
    assert all(bytes(r["content"]).startswith(b"body ") for r in back)

    # byte-identical rerun from a differently-partitioned input
    out2 = "file://" + str(tmp_path / "seg2")
    write_warc_shards(df.repartition(7), out2, n_shards=6).collect()
    for k in range(6):
        a = (tmp_path / "seg1" / f"seg-{k:05d}-of-00006.warc.gz").read_bytes()
        b = (tmp_path / "seg2" / f"seg-{k:05d}-of-00006.warc.gz").read_bytes()
        assert a == b

    # a shard count far above the row count still writes every file
    out3 = "file://" + str(tmp_path / "seg3")
    man3 = write_warc_shards(df.limit(2), out3, n_shards=5).collect()
    assert len(man3) == 5
    assert sum(m["n_records"] for m in man3) == 2
    empties = [m for m in man3 if m["n_records"] == 0]
    assert empties and all(m["n_bytes"] == 0 for m in empties)
