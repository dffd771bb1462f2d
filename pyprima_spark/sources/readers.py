"""Sources/sinks matching the reference's file conventions.

Every CSV the reference reads/writes uses ``sep=';' decimal=','``
(e.g. correction_functions.py:320, generate_intermediate_files.py:104).
Spark's CSV reader has no decimal-comma option, so numeric columns are
read as strings and converted with a comma→dot cast — a pure projection
on top of the distributed text scan, so the source still splits and
parallelizes like any CSV at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def european_number(col: str | Column) -> Column:
    """Parse '1.234,56'-style numbers: drop thousands dots, comma→dot.

    ``try_cast`` so malformed cells become NULL instead of failing the
    job under ANSI mode — the reference tolerates bad cells the same way
    (correction_functions.py:365-368 falls back on parse failure).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, r"\.", ""), ",", "."
    ).try_cast("double")


def read_european_csv(
    spark: SparkSession,
    path: str,
    numeric_cols: list[str] | None = None,
) -> DataFrame:
    """Read a ';'-separated CSV with decimal commas; ``numeric_cols``
    are converted to doubles, everything else stays string."""
    df = spark.read.option("header", True).option("sep", ";").csv(path)
    for c in numeric_cols or []:
        df = df.withColumn(c, european_number(c))
    return df


def write_european_csv(df: DataFrame, path: str) -> None:
    """Write with the reference's ';' + decimal-comma convention.

    Floats are rendered as plain fixed-point (printf ``%.6f``, trailing
    zeros trimmed) BEFORE the separator swap: the default string cast
    emits scientific notation for large/small magnitudes (``1.0E7``),
    which a naive '.'→',' substitution would corrupt to ``1,0E7``.
    """
    out = df
    for field in df.schema.fields:
        if field.dataType.typeName() in ("double", "float", "decimal"):
            name = field.name
            fixed = F.format_string("%.6f", F.col(name))
            trimmed = F.regexp_replace(
                F.regexp_replace(fixed, r"0+$", ""), r"\.$", ""
            )
            out = out.withColumn(
                name,
                F.when(F.col(name).isNull(), F.lit(None).cast("string"))
                .otherwise(F.regexp_replace(trimmed, r"\.", ",")),
            )
    out.write.mode("overwrite").option("header", True).option("sep", ";").csv(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    """JSON-lines scan with a REQUIRED explicit schema.

    Schema inference on json() triggers a full extra pass over the
    data before the real scan — at 100 TB that is two reads instead of
    one, and the inferred types drift with the sample. Callers supply
    the DDL (or StructType) and get a single splittable text scan;
    malformed lines null out per PERMISSIVE mode instead of failing
    the job.

    Timestamp format carries full microseconds — Spark's default JSON
    format is millisecond-only, which silently truncates event times on
    a write/read round-trip.
    """
    return (
        spark.read.schema(schema)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .json(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as parquet
    (PushedFilters + ReadSchema visible in `.explain`)."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-file ingest for the multimodal pipeline: Spark's built-in
    ``binaryFile`` source yields (path, modificationTime, length,
    content binary) per file — the standard way image/audio/video blobs
    ENTER a lakehouse before landing as the opaque binary columns the
    multimodal operators (operators/multimodal.py) process.

    Scale contract: file listing is distributed, per-file rows split
    across partitions, and a `length` predicate is pushed into the
    SOURCE (binaryFile supports length/modificationTime pushdown — the
    content of oversized files is never read). ``max_bytes`` applies
    exactly that pushed filter; ``glob`` restricts by filename pattern
    at listing time (``pathGlobFilter``), not by scanning.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df
