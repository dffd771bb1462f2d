"""DataFrame-native Bloom filter for semi/anti-join pre-filtering.

Scale story: the incremental-ingestion gate (``incremental_new_docs``)
anti-joins incoming fingerprints against the seen-set. At 100 TB the
seen-set has billions of rows — far beyond a broadcast — so the anti
join shuffles BOTH sides. A Bloom filter compresses the seen-set into a
fixed-size word table (n_words × 64 bits, e.g. 1 MB for ~1e6 items at
~1% fp) that DOES broadcast; incoming rows probe it map-side, and only
the (few) Bloom-positive rows continue to the exact anti-join. The
shuffled volume drops from |incoming| to |hits|.

PySpark 4.1.2 does not expose ``bloom_filter_agg``/``might_contain`` as
public functions, so both sides are built from primitives that do
exist: xxhash64-with-seed bit positions, ``bit_or`` word aggregation,
and a broadcast equi-join probe. Everything stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_N_WORDS = 1024   # 1024 * 64 bits = 8 KiB filter
BLOOM_K = 5            # hash functions


def _bit_positions(col: str, n_words: int, k: int) -> F.Column:
    """Array of k bit positions in [0, n_words*64) for a value —
    xxhash64 over (value, seed) gives k independent hashes."""
    nbits = n_words * 64
    return F.array(
        *[
            F.pmod(F.xxhash64(F.col(col), F.lit(i)), F.lit(nbits))
            for i in range(k)
        ]
    )


def bloom_build(
    df: DataFrame,
    col: str,
    n_words: int = BLOOM_N_WORDS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Aggregate ``df[col]`` into a Bloom word table (word_idx, mask).

    One narrow pass over the seen-set: explode the k bit positions,
    bit_or the masks per 64-bit word. Output is at most ``n_words``
    rows — broadcastable at any corpus size.
    """
    pos = df.select(
        F.explode(_bit_positions(col, n_words, k)).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / 64).cast("int").alias("word_idx"),
            F.expr("shiftleft(1L, cast(p % 64 as int))").alias("m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("m").alias("mask"))
    )


def bloom_probe(
    incoming: DataFrame,
    bloom: DataFrame,
    col: str,
    n_words: int = BLOOM_N_WORDS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Tag each incoming row with ``bloom_maybe`` (true = possibly in
    the seen-set; false = DEFINITELY new).

    The probe explodes the k positions, broadcast-joins the word table,
    and requires all k bits set. A left join covers words absent from
    the table (no seen value touched them → bit unset).
    """
    probes = incoming.select(
        F.col(col),
        F.posexplode(_bit_positions(col, n_words, k)).alias("i", "p"),
    ).select(
        col,
        "i",
        (F.col("p") / 64).cast("int").alias("word_idx"),
        F.expr("shiftleft(1L, cast(p % 64 as int))").alias("m"),
    )
    hits = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "bit_set",
            F.coalesce(F.col("mask").bitwiseAND(F.col("m")) != 0, F.lit(False)),
        )
        .groupBy(col)
        .agg(
            (F.sum(F.when(F.col("bit_set"), 1).otherwise(0)) == k).alias(
                "bloom_maybe"
            )
        )
    )
    return incoming.join(hits, col)
