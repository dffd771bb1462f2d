"""End-to-end corpus pipeline: WARC crawl archive → documents-shaped
ingest → curation stack → sharded TFRecord export → read-back.
Exercises pipeline.ingest_warc / export_curated_tfrecord over the
verifying WARC and TFRecord codecs."""

from __future__ import annotations

import os

from pyprima_spark.pipeline import export_curated_tfrecord, ingest_warc
from pyprima_spark.sources.tfrecord import read_tfrecord
from pyprima_spark.sources.warc import write_warc_file


def _crawl_df(spark):
    rows = []
    for i in range(12):
        # distinct token stream per page: pages must NOT near-dup each
        # other, or the minhash cluster stage collapses the whole crawl;
        # real stopwords keep the quality gate's stop-ratio happy
        body = " ".join(f"the word{i}x{j} of" for j in range(30))
        http = f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{body} page {i}"
        rows.append(
            (
                f"<urn:uuid:{i:04d}>",
                "response",
                f"https://site{i % 3}.example/p{i}",
                "2026-08-16T00:00:00Z",
                "application/http; msgtype=response",
                http.encode(),
            )
        )
    # an exact duplicate pair (same body, different record ids): the
    # page body pattern with an unused index — passes the quality gate
    # exactly like the pages, shares no shingles with them
    dup_body = " ".join(f"the word99x{j} of" for j in range(30))
    rows.append(
        (
            "<urn:uuid:9001>",
            "resource",
            "https://dup.example/a",
            "2026-08-16T00:00:00Z",
            "text/plain",
            f"{dup_body} duplicated".encode(),
        )
    )
    rows.append(
        (
            "<urn:uuid:9002>",
            "resource",
            "https://dup.example/b",
            "2026-08-16T00:00:00Z",
            "text/plain",
            f"{dup_body} duplicated".encode(),
        )
    )
    # a junk-quality record and a non-document record type
    rows.append(
        (
            "<urn:uuid:9003>",
            "resource",
            "https://junk.example/x",
            "2026-08-16T00:00:00Z",
            "text/plain",
            b"#### #### ####",
        )
    )
    rows.append(
        (
            "<urn:uuid:9004>",
            "warcinfo",
            None,
            "2026-08-16T00:00:00Z",
            "application/warc-fields",
            b"software: test",
        )
    )
    return spark.createDataFrame(
        rows,
        "record_id string, warc_type string, target_uri string,"
        " warc_date string, content_type string, content binary",
    )


def test_warc_to_tfrecord_pipeline(spark, tmp_path):
    (tmp_path / "crawl").mkdir()
    warc_uri = "file://" + str(tmp_path / "crawl" / "seg-00000.warc.gz")
    write_warc_file(_crawl_df(spark), warc_uri).collect()

    docs = ingest_warc(spark, str(tmp_path / "crawl"))
    rows = docs.collect()
    # warcinfo dropped; 12 responses + 3 resources remain
    assert len(rows) == 15
    by_src = {r["source"] for r in rows}
    assert "dup.example" in by_src and "site0.example" in by_src
    page0 = [r for r in rows if r["text"].endswith("page 0")]
    assert len(page0) == 1
    # HTTP headers stripped from response bodies
    assert not page0[0]["text"].startswith("HTTP/1.1")
    assert page0[0]["n_chars"] == len(page0[0]["text"])
    assert len({r["doc_id"] for r in rows}) == 15  # stable distinct ids

    # land the ingest as the documents table of a corpus dir, then run
    # the curation stack + TFRecord export against it
    corpus_dir = str(tmp_path / "corpus")
    docs.write.mode("overwrite").parquet(
        os.path.join(corpus_dir, "documents.parquet")
    )
    shards_dir = str(tmp_path / "shards")
    man = export_curated_tfrecord(
        spark, corpus_dir, shards_dir, n_shards=4
    ).collect()
    assert len(man) == 4
    kept = sum(m["n_rows"] for m in man)
    # exact-dup pair collapses to one survivor and the junk doc fails
    # the quality gate: strictly fewer survivors than raw docs
    assert 0 < kept < 15

    back = read_tfrecord(
        spark, shards_dir, "doc_id bigint, source string, n_tok bigint,"
        " text string"
    )
    got = back.collect()
    assert len(got) == kept
    # the duplicated body survives exactly once
    dup_rows = [r for r in got if r["text"].endswith("duplicated")]
    assert len(dup_rows) == 1
    assert all(r["n_tok"] > 0 for r in got)


def test_ingest_warc_crawl_reality(spark, tmp_path):
    """Non-UTF-8 bytes, bare-LF HTTP separators, and separator-less
    responses — the three crawl pathologies ADVICE r8 flagged."""
    stop = " ".join("the of and to a in" for _ in range(5))
    rows = [
        # malformed UTF-8 in a resource body: decoded with U+FFFD,
        # never aborting the scan
        (
            "<urn:uuid:b001>",
            "resource",
            "https://bytes.example/x",
            "2026-08-16T00:00:00Z",
            "text/plain",
            (stop + " caf\xe9 ").encode("latin-1") + b"\xff tail",
        ),
        # non-compliant server: bare \n\n between HTTP head and body
        (
            "<urn:uuid:b002>",
            "response",
            "https://lf.example/y",
            "2026-08-16T00:00:00Z",
            "application/http; msgtype=response",
            ("HTTP/1.1 200 OK\nServer: x\n\n" + stop + " lfbody").encode(),
        ),
        # a response with NO header/body separator: dropped, not leaked
        (
            "<urn:uuid:b003>",
            "response",
            "https://nosep.example/z",
            "2026-08-16T00:00:00Z",
            "application/http; msgtype=response",
            b"HTTP/1.1 200 OK headers-never-end",
        ),
    ]
    df = spark.createDataFrame(
        rows,
        "record_id string, warc_type string, target_uri string,"
        " warc_date string, content_type string, content binary",
    )
    (tmp_path / "crawl").mkdir()
    warc_uri = "file://" + str(tmp_path / "crawl" / "seg.warc.gz")
    write_warc_file(df, warc_uri).collect()

    got = {r["source"]: r for r in ingest_warc(spark, str(tmp_path / "crawl")).collect()}
    assert set(got) == {"bytes.example", "lf.example"}
    assert "caf�" in got["bytes.example"]["text"]  # replaced, kept
    assert got["lf.example"]["text"].endswith("lfbody")
    assert not got["lf.example"]["text"].startswith("HTTP/1.1")
