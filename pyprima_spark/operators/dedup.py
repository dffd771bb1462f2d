"""Document deduplication operators: exact, fingerprint, MinHash+LSH,
SimHash, and n-gram Jaccard.

Scale design (the 100 TB story):

* exact / fingerprint — hash-groupBy: one shuffle on the 128-bit digest,
  uniformly distributed by construction, no skew.
* minhash — the signature is computed in a SINGLE narrow pass with
  nested higher-order functions (no explode of shingles, no shuffle);
  only the tiny (doc, band, sig) table shuffles for the bucket
  self-join. Candidate pairs are verified only within buckets — the
  cartesian never happens.
* simhash — same shape: signature per doc computed narrowly, then a
  15-bit-chunk bucket join (standard Charikar dedup layout).
* ngram jaccard — candidates bucketed by (source, length band) before
  the gram-overlap join, bounding the pair space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyprima_spark.functions import text as X
from pyprima_spark.plans.constants import MINHASH_BANDS, MINHASH_N


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group identical texts by md5; keep the smallest id per group."""
    return (
        df.withColumn("text_hash", F.md5(F.col(text_col)))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("kept_doc"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def fingerprint_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Dedup after normalization: lowercase, strip punctuation, collapse
    whitespace — catches trivially-edited duplicates."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    return (
        df.withColumn("fingerprint", F.md5(norm))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("kept_doc"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def minhash_band_table(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, band_idx, band_sig) — one row per doc per LSH band.

    The whole signature pipeline (tokens → shingles → 16 minhashes →
    4 band digests) is one projection; docs with no shingles drop out.
    """
    toks = X.tokens_spark(text_col)
    sh = X.shingles_spark("tokens")
    mh = X.minhashes_spark("shingles", MINHASH_N)
    bands = X.bands_spark("minhashes", MINHASH_BANDS)
    return (
        df.select(F.col(id_col).alias("doc"), F.expr(toks).alias("tokens"))
        .withColumn("shingles", F.expr(sh))
        .filter(F.size("shingles") > 0)
        .withColumn("minhashes", F.expr(mh))
        .select("doc", F.posexplode(F.expr(bands)).alias("band_idx", "band_sig"))
    )


def minhash_candidate_pairs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Distinct candidate near-dup pairs sharing >= 1 LSH band."""
    bands = minhash_band_table(df, id_col, text_col)
    a = bands.select(
        F.col("doc").alias("doc_a"), "band_idx", "band_sig"
    )
    b = bands.select(
        F.col("doc").alias("doc_b"), "band_idx", "band_sig"
    )
    return (
        a.join(b, ["band_idx", "band_sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) for every doc with at least one token."""
    toks = X.tokens_spark(text_col)
    hashes = X.token_hashes_spark("tokens")
    sim = X.simhash_spark("hashes")
    return (
        df.select(F.col(id_col).alias("doc"), F.expr(toks).alias("tokens"))
        .filter(F.size("tokens") > 0)
        .withColumn("hashes", F.expr(hashes))
        .select("doc", F.expr(sim).alias("simhash"))
    )


def simhash_pair_hamming(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hamming distance for candidate pairs sharing a 15-bit chunk."""
    sims = simhash_table(df, id_col, text_col)
    chunks = sims.select(
        "doc",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("c"),
    ).withColumn(
        "chunk", F.expr("shiftright(simhash, c * 15) & 32767")
    )
    a = chunks.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sim_a"), "c", "chunk"
    )
    b = chunks.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sim_b"), "c", "chunk"
    )
    pairs = (
        a.join(b, ["c", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.expr("bit_count(sim_a ^ sim_b)")
    ).select("doc_a", "doc_b", "hamming")


def ngram_gram_table(
    df: DataFrame, id_col: str, text_col: str, bucket_cols: list[str]
) -> DataFrame:
    """(id, bucket..., gram) exploded distinct char-3-gram table plus a
    per-doc gram-set size column."""
    norm = X.normtext_spark(text_col)
    grams = X.char_ngrams_spark("norm")
    base = (
        df.select(F.col(id_col).alias("doc"), *bucket_cols, F.expr(norm).alias("norm"))
        .withColumn("grams", F.expr(grams))
        .filter(F.size("grams") > 0)
        .withColumn("gset_size", F.size("grams"))
    )
    return base.select(
        "doc", *bucket_cols, "gset_size", F.explode("grams").alias("gram")
    )
