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


def ann_ivf(
    emb: DataFrame,
    n_queries: int,
    k: int,
    n_clusters: int = 8,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-style ANN: a KMeans coarse quantizer partitions the vector
    table into inverted lists; each query probes only its ``n_probe``
    nearest cells and brute-forces inside them.

    This is the scale path beyond LSH: at 100 TB the vector table is
    scanned once to assign cells (model fit runs on a sample-sized
    driver-coordinated job), candidate generation is a broadcast
    equi-join on cell id (no shuffle of the big side), and per-cell
    verification is the same narrow cosine pass as brute force. Probe
    selection is itself a DataFrame job over the (tiny) centroid table —
    no .collect() of query vectors.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = with_double_vec(emb)
    featured = base.withColumn("features", array_to_vector("vec"))
    model = KMeans(
        k=n_clusters, seed=42, featuresCol="features", predictionCol="cell"
    ).fit(featured)
    assigned = model.transform(featured).select(
        F.col(id_col).alias("vec_id"), F.col("vec").alias("cvec"), "cell"
    )

    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    queries = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("vec").alias("qvec")
    )
    # n_probe nearest cells per query: queries x centroids is tiny.
    dist2 = F.expr(
        "aggregate(zip_with(qvec, centroid, (a, b) -> (a - b) * (a - b)), "
        "0D, (acc, x) -> acc + x)"
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("d2", dist2)
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qvec", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", cosine_col())
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )
