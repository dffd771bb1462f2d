"""Archive ingestion: ZIP and gzipped-TAR members as a DataFrame.

Web-crawl and training-data dumps arrive as directories of archive
shards (a Common-Crawl-style layout: thousands of .zip / .tar.gz
files, each holding many small text members).  Archives are
split-RESISTANT — a single archive cannot be read by two tasks — so
the distributed unit here is the ARCHIVE, not the member:
``spark.read.format("binaryFile")`` lists the shard glob into one row
per archive, Spark schedules archives across executors, and a
``mapInPandas`` Arrow batch opens each payload with the stdlib
``zipfile``/``tarfile`` and yields one row per member.  At 100 TB the
parallelism is the shard count (typically 10k-100k files), which is
exactly how crawl dumps are laid out to be consumed; per-member
parallelism inside one archive is impossible in ANY engine without
re-sharding first (which `write_zip_archive` below exists to test).

Reference parity: the reference unpacks downloaded archives on the
driver with the same stdlib modules before reading them
(config/data-acquisition conventions); here the unpack IS the scan.

No external libs: stdlib ``zipfile``/``tarfile``/``io`` only, Python
touches bytes exclusively through the Arrow batch path (the
multimodal/GIS writer contract).
"""

from __future__ import annotations

import fnmatch
import io
import os
import tarfile
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MEMBER_SCHEMA = (
    "archive string, member string, n_bytes long, payload binary"
)

# Members per yielded Arrow batch in read_archive_members — bounds the
# decompressed-payload footprint of one batch independent of how many
# members an archive holds (ADVICE r6).
_FLUSH_ROWS = 256


def _zip_rows(name: str, payload: bytes, member_glob: str):
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            if info.is_dir():
                continue
            if not fnmatch.fnmatch(info.filename, member_glob):
                continue
            data = zf.read(info)
            yield name, info.filename, len(data), data


def _tar_rows(name: str, payload: bytes, member_glob: str):
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r:*") as tf:
        for info in tf:
            if not info.isfile():
                continue
            if not fnmatch.fnmatch(info.name, member_glob):
                continue
            data = tf.extractfile(info).read()
            yield name, info.name, len(data), data


def read_archive_members(
    spark: SparkSession,
    path_glob: str,
    member_glob: str = "*",
    kind: str = "zip",
) -> DataFrame:
    """One row per archive member: (archive, member, n_bytes, payload).

    ``kind`` is "zip" or "tar" (tar handles .tar, .tar.gz and .tgz via
    ``mode='r:*'`` auto-detection).  ``member_glob`` filters member
    names INSIDE the Python batch — archive listings are not visible
    to the JVM, so member pruning cannot push down; ARCHIVE pruning
    does (the binaryFile source pushes ``pathGlobFilter``).

    SIZE/MEMORY CONTRACT (ADVICE r6): Spark's binaryFile source loads
    each file as ONE row and rejects files larger than ~2 GB
    (Int.MaxValue bytes) — so the per-ARCHIVE shard size is capped at
    2 GB; 100 TB corpora must arrive as many shards under that bound
    (the standard crawl-dump layout: 100 MB–1 GB per shard).  Peak
    executor memory per task is roughly one archive's compressed bytes
    PLUS the decompressed matching members of one flush window — the
    unpack below yields a batch per ``_FLUSH_ROWS`` members rather
    than buffering every member of every archive in the Arrow batch,
    so a pathological archive (millions of small members) streams
    instead of ballooning one batch.
    """
    if kind not in ("zip", "tar"):
        raise ValueError(f"kind must be 'zip' or 'tar', got {kind!r}")
    rows_fn = _zip_rows if kind == "zip" else _tar_rows
    raw = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {"archive": [], "member": [], "n_bytes": [], "payload": []}
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                base = os.path.basename(path)
                for arc, mem, n, data in rows_fn(
                    base, bytes(content), member_glob
                ):
                    out["archive"].append(arc)
                    out["member"].append(mem)
                    out["n_bytes"].append(n)
                    out["payload"].append(data)
                    if len(out["archive"]) >= _FLUSH_ROWS:
                        yield pd.DataFrame(out)
                        out = {
                            "archive": [],
                            "member": [],
                            "n_bytes": [],
                            "payload": [],
                        }
        if out["archive"]:
            yield pd.DataFrame(out)

    return raw.mapInPandas(unpack, _MEMBER_SCHEMA)


def write_zip_archive(
    df: DataFrame, out_path: str, member_col: str = "member",
    payload_col: str = "payload",
) -> int:
    """Deterministic single-file ZIP export of (member, payload) rows —
    the xlsx/shapefile single-task writer contract: members are sorted
    by name, written with a fixed timestamp so byte-identical runs
    produce byte-identical archives.  Returns the member count.

    Duplicate member names are an ERROR (ADVICE r6): a ZIP tolerates
    duplicate entries but readers return only one payload, silently
    breaking the write→read roundtrip invariant — refuse up front
    rather than ship an archive that lies.

    Runs on the DRIVER (one archive is one file; a distributed write
    would need one archive PER PARTITION — use ``df.foreachPartition``
    with this helper per shard for that). Bytes route through
    :mod:`pyprima_spark.sources.fsio`, so ``out_path`` may be a bare
    path or a ``file://``/``hdfs://``/``s3://`` URI.
    """
    from pyprima_spark.sources import fsio

    rows = (
        df.select(member_col, payload_col)
        .toPandas()
        .sort_values(member_col)
    )
    dup_mask = rows[member_col].duplicated()
    if dup_mask.any():
        dups = sorted(rows.loc[dup_mask, member_col].unique())[:5]
        raise ValueError(
            f"duplicate member names in ZIP export: {dups} — a reader "
            "would silently return only one payload per name"
        )
    fixed_date = (1980, 1, 1, 0, 0, 0)
    # stream entries straight into the fsio output (zipfile handles
    # non-seekable targets with data descriptors) — buffering the whole
    # archive in memory doubled the driver footprint (review r7)
    with fsio.open_output(out_path) as out:
        with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
            for _, row in rows.iterrows():
                info = zipfile.ZipInfo(
                    str(row[member_col]), date_time=fixed_date
                )
                zf.writestr(info, bytes(row[payload_col]))
    return len(rows)
