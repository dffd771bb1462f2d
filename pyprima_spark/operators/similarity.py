"""Embedding similarity search: brute-force cosine top-k, LSH-bucketed
ANN, and cosine near-dup pairs.

Scale design: the query set is small and broadcast — the big vector
table streams through one narrow pass per query batch (no shuffle of
the fact side). The LSH variant buckets the big table by an 8-plane
random-hyperplane signature so candidate generation is an equi-join on
the bucket id; at 100 TB that is the only viable layout (brute force is
the per-bucket verifier, not the global plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyprima_spark.functions import vectors as V


def with_double_vec(df: DataFrame, col: str = "embedding") -> DataFrame:
    return df.withColumn("vec", F.expr(V.to_double_spark(col)))


def cosine_col() -> F.Column:
    """cos(q.vec, c.vec) for a joined (query, candidate) row — rounded
    to 4 dp so both engines agree bit-for-bit after ranking."""
    return F.round(F.expr(V.cosine_spark("qvec", "cvec")), 4)


def ann_topk(
    emb: DataFrame,
    n_queries: int,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k of every vector against each query."""
    base = with_double_vec(emb)
    queries = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec")
    )
    cands = base.select(F.col(id_col).alias("vec_id"), F.col("vec").alias("cvec"))
    scored = (
        cands.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine_col())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def with_lsh_bucket(df: DataFrame) -> DataFrame:
    return df.withColumn("bucket", F.expr(V.lsh_bucket_spark("vec")))


def ann_lsh(
    emb: DataFrame,
    n_queries: int,
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's hyperplane bucket."""
    base = with_lsh_bucket(with_double_vec(emb))
    queries = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec"), "bucket"
    )
    cands = base.select(
        F.col(id_col).alias("vec_id"), F.col("vec").alias("cvec"), "bucket"
    )
    scored = (
        cands.join(F.broadcast(queries), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine_col())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def embedding_dedup(emb: DataFrame, tau: float, id_col: str = "vec_id") -> DataFrame:
    """Near-dup pairs (cosine >= tau) within LSH buckets."""
    base = with_lsh_bucket(with_double_vec(emb))
    a = base.select(
        F.col(id_col).alias("vec_a"), F.col("vec").alias("qvec"), "bucket"
    )
    b = base.select(
        F.col(id_col).alias("vec_b"), F.col("vec").alias("cvec"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cosine_col())
        .filter(F.col("cos") >= tau)
        .select("vec_a", "vec_b", "cos")
    )
