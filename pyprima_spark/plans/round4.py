"""Round-4 operators: raster reclassification, model-file export bundle,
approximate table statistics, and further corpus / analytics coverage.

Each query has an exact-match DuckDB oracle in ``ROUND4_ORACLES`` (keys
without one fall back to the driver's rows-only check). Determinism rules
follow functions/agg.py: integer arithmetic wherever possible, DECIMAL
sums for doubles, single correctly-rounded double divisions, rounding
only at the output edge.

Self-contained on purpose (imports catalog, not plans.queries) so
plans.oracles can import this module without a circular chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyprima_spark.catalog import load_table
from pyprima_spark.functions.agg import dec_sum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


ROUND4_QUERIES: dict = {}
ROUND4_ORACLES: dict[str, str] = {}

# Keys added after the round-4 grading window filled (the driver grades
# 50/round); registered BEHIND the window, queued first for round 5.
ROUND4_LATE_QUERIES: dict = {}


# ---------------------------------------------------------------------------
# landuse_reclass — raster remap through a lookup table + zonal rollup
# ---------------------------------------------------------------------------

# The reference's land-use map has 17 discrete classes (input_maps.py:86
# generate_landuse); downstream suitability analysis remaps them through
# config dictionaries with util.py:255 changem (oldval -> newval vectors).
# This is changem's tabular form: a dim-sized recode table, broadcast.
_LU_RECLASS = [
    (0, "water", 0),
    (1, "water", 0),
    (2, "wetland", 10),
    (3, "urban", 5),
    (4, "urban", 15),
    (5, "cropland", 60),
    (6, "cropland", 55),
    (7, "grassland", 80),
    (8, "grassland", 75),
    (9, "shrubland", 70),
    (10, "forest", 30),
    (11, "forest", 25),
    (12, "forest", 20),
    (13, "snow", 15),
    (14, "barren", 90),
    (15, "barren", 85),
    (16, "mosaic", 50),
]


def landuse_reclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Land-use raster reclassification + zonal rollup (SURVEY §2 #87).

    Reference: ``generate_landuse`` (input_maps.py:86) reads the 17-class
    land-use raster for the scope; suitability scripts then remap class
    values through config dictionaries via ``changem`` (util.py:255) and
    aggregate per region. Spark-first form: the pixel grid is generated
    distributively (``spark.range``), the 17-row class->category/score
    recode table is BROADCAST (never a shuffle), and the zonal rollup is
    one (region, category) aggregation. All-integer arithmetic — exact
    at any scale, and at real raster resolution (billions of pixels) the
    only shuffle is the final group-by of (region x category) partials.
    """
    pix = (
        spark.range(160 * 360)
        .withColumn("latidx", (F.col("id") / 360).cast("int"))
        .withColumn("lonidx", (F.col("id") % 360).cast("int"))
        .select(
            (F.col("latidx") - 80 + F.lit(0.5)).alias("lat"),
            (F.col("lonidx") - 180 + F.lit(0.5)).alias("lon"),
            ((F.col("latidx") * 31 + F.col("lonidx") * 13) % 17).alias("lu_class"),
        )
    )
    lut = spark.createDataFrame(
        _LU_RECLASS, "lu_class int, category string, suit int"
    )
    boxes = _t(spark, sf_dir, "nation").select(
        "n_name",
        ((F.col("n_nationkey") * 7 % 32) * 5 - 80).alias("lat_min"),
        ((F.col("n_nationkey") * 7 % 32) * 5 - 80 + 40).alias("lat_max"),
        ((F.col("n_nationkey") * 11 % 60) * 6 - 180).alias("lon_min"),
        ((F.col("n_nationkey") * 11 % 60) * 6 - 180 + 72).alias("lon_max"),
    )
    from pyprima_spark.operators.spatial import point_in_box_join

    reclassed = pix.join(F.broadcast(lut), "lu_class")
    return (
        point_in_box_join(reclassed, boxes)
        .groupBy("n_name", "category")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("suit").alias("suit_total"),
        )
        .orderBy("n_name", "category")
    )


_LU_VALUES_SQL = ", ".join(f"({c}, '{cat}', {s})" for c, cat, s in _LU_RECLASS)

ROUND4_ORACLES["landuse_reclass"] = f"""
WITH pix AS (
  SELECT (cast(id // 360 AS INT) - 80 + 0.5) AS lat,
         (cast(id % 360 AS INT) - 180 + 0.5) AS lon,
         (cast(id // 360 AS INT) * 31 + cast(id % 360 AS INT) * 13) % 17 AS lu_class
  FROM (SELECT unnest(range(57600)) AS id)
), lut(lu_class, category, suit) AS (VALUES {_LU_VALUES_SQL}),
boxes AS (
  SELECT n_name,
         (n_nationkey * 7 % 32) * 5 - 80 AS lat_min,
         (n_nationkey * 7 % 32) * 5 - 80 + 40 AS lat_max,
         (n_nationkey * 11 % 60) * 6 - 180 AS lon_min,
         (n_nationkey * 11 % 60) * 6 - 180 + 72 AS lon_max
  FROM nation
)
SELECT n_name, category,
       count(*) AS n_cells,
       cast(sum(suit) AS BIGINT) AS suit_total
FROM pix JOIN lut USING (lu_class)
JOIN boxes ON lat >= lat_min AND lat < lat_max AND lon >= lon_min AND lon < lon_max
GROUP BY n_name, category
ORDER BY n_name, category
"""

ROUND4_QUERIES["landuse_reclass"] = landuse_reclass


# ---------------------------------------------------------------------------
# protected_areas_raster — categorical priority burn-in
# ---------------------------------------------------------------------------

# IUCN category -> protection rank, the reference's `protected_areas`
# config dict (input_maps.py:144 generate_protected_areas maps
# feat.IUCN_CAT through it into the "Raster" attribute before burning).
_PA_RANKS = [
    ("Ia", 1),
    ("Ib", 2),
    ("II", 3),
    ("III", 4),
    ("IV", 5),
    ("V", 6),
    ("VI", 7),
    ("Not Applicable", 0),
    ("Not Assigned", 0),
    ("Not Reported", 0),
]


def protected_areas_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical protected-area rasterization (SURVEY §2 #88).

    Reference: ``generate_protected_areas`` (input_maps.py:144) tags each
    protected-area feature with an integer rank looked up from the
    IUCN-category dict, then burns the features into a raster — where
    features overlap, gdal's burn keeps the value written last; the
    deterministic distributed equivalent is MAX(rank) per pixel (strictest
    protection wins), which is order-independent and hence the only form
    that is stable under parallel execution. Pixels covered by no feature
    get rank 0 (the land-sea default): a LEFT join against the broadcast
    feature boxes keeps the grid dense without a second pass. Output is
    the per-rank pixel census the siting step consumes.
    """
    nat = _t(spark, sf_dir, "nation")
    # Feature table: each nation contributes a protected-area box tagged
    # with an IUCN category code (deterministic pick from the dict).
    cats = spark.createDataFrame(_PA_RANKS, "iucn_cat string, rank int")
    feats = nat.select(
        ((F.col("n_nationkey") * 3 % 28) * 5 - 70).alias("lat_min"),
        ((F.col("n_nationkey") * 3 % 28) * 5 - 70 + 25).alias("lat_max"),
        ((F.col("n_nationkey") * 17 % 64) * 5 - 160).alias("lon_min"),
        ((F.col("n_nationkey") * 17 % 64) * 5 - 160 + 40).alias("lon_max"),
        F.element_at(
            F.array(*[F.lit(c) for c, _ in _PA_RANKS]),
            (F.col("n_nationkey") % 10 + 1).cast("int"),
        ).alias("iucn_cat"),
    ).join(F.broadcast(cats), "iucn_cat")
    pix = (
        spark.range(160 * 360)
        .select(
            ((F.col("id") / 360).cast("int") - 80 + F.lit(0.5)).alias("lat"),
            ((F.col("id") % 360).cast("int") - 180 + F.lit(0.5)).alias("lon"),
        )
    )
    cond = (
        (F.col("lat") >= F.col("lat_min"))
        & (F.col("lat") < F.col("lat_max"))
        & (F.col("lon") >= F.col("lon_min"))
        & (F.col("lon") < F.col("lon_max"))
    )
    burned = (
        pix.join(F.broadcast(feats), cond, "left")
        .groupBy("lat", "lon")
        .agg(F.coalesce(F.max("rank"), F.lit(0)).alias("protection"))
    )
    return (
        burned.groupBy("protection")
        .agg(F.count(F.lit(1)).alias("n_cells"))
        .orderBy("protection")
    )


_PA_VALUES_SQL = ", ".join(f"('{c}', {r})" for c, r in _PA_RANKS)
_PA_CAT_ARRAY_SQL = "[" + ", ".join(f"'{c}'" for c, _ in _PA_RANKS) + "]"

ROUND4_ORACLES["protected_areas_raster"] = f"""
WITH cats(iucn_cat, rank) AS (VALUES {_PA_VALUES_SQL}),
feats AS (
  SELECT (n_nationkey * 3 % 28) * 5 - 70 AS lat_min,
         (n_nationkey * 3 % 28) * 5 - 70 + 25 AS lat_max,
         (n_nationkey * 17 % 64) * 5 - 160 AS lon_min,
         (n_nationkey * 17 % 64) * 5 - 160 + 40 AS lon_max,
         {_PA_CAT_ARRAY_SQL}[cast(n_nationkey % 10 + 1 AS INT)] AS iucn_cat
  FROM nation
), tagged AS (
  SELECT lat_min, lat_max, lon_min, lon_max, rank
  FROM feats JOIN cats USING (iucn_cat)
), pix AS (
  SELECT (cast(id // 360 AS INT) - 80 + 0.5) AS lat,
         (cast(id % 360 AS INT) - 180 + 0.5) AS lon
  FROM (SELECT unnest(range(57600)) AS id)
), burned AS (
  SELECT lat, lon, coalesce(max(rank), 0) AS protection
  FROM pix LEFT JOIN tagged
    ON lat >= lat_min AND lat < lat_max AND lon >= lon_min AND lon < lon_max
  GROUP BY lat, lon
)
SELECT protection, count(*) AS n_cells
FROM burned GROUP BY protection ORDER BY protection
"""

ROUND4_QUERIES["protected_areas_raster"] = protected_areas_raster


# ---------------------------------------------------------------------------
# model_export_bundle — multi-sheet model-file assembly as one long table
# ---------------------------------------------------------------------------

def model_export_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full model-file export bundle (SURVEY §2 #89).

    Reference: ``generate_urbs_model`` (generate_models.py:4) /
    ``generate_evrys_model`` (:201) assemble ~15 linked sheets (Global,
    Site, Commodity, Process, Demand, SupIm, ...) into one workbook, each
    sheet a column-subset/rename/pivot of the intermediate files. The
    Spark-first form is ONE union-tagged long table (sheet, site, item,
    t, attr, value): heterogeneous sheets unify onto a shared schema with
    typed nulls, writers fan out by partitioning on `sheet` — at scale
    this is a single job emitting every sheet, not 15 sequential ones.

    Sheet lineage (all from existing operator families):
      global    literal assumption rows (config constants)
      site      nation dim attributes
      commodity per-(site, priority) mean order price
      process   per-(site, mfgr) installed quantity from lineitem
      demand    hourly site demand series (unpivoted Demand matrix)
      supim     hourly site share-of-total profile (sums to 1 per site)
    """
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    ev = _t(spark, sf_dir, "events")
    from pyprima_spark.functions.agg import dec_avg

    null_s = F.lit(None).cast("string")
    null_i = F.lit(None).cast("int")

    glob = spark.createDataFrame(
        [("CO2 limit", 150000000.0), ("Cost budget", 6500000000.0)],
        "attr string, value double",
    ).select(
        F.lit("global").alias("sheet"), null_s.alias("site"),
        null_s.alias("item"), null_i.alias("t"), "attr", "value",
    )

    site = nat.select(
        F.lit("site").alias("sheet"),
        F.col("n_name").alias("site"),
        null_s.alias("item"),
        null_i.alias("t"),
        F.lit("area").alias("attr"),
        (F.col("n_nationkey") * 13 % 50 + 10).cast("double").alias("value"),
    )

    commodity = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name", "o_orderpriority")
        .agg(dec_avg("o_totalprice", 2).alias("value"))
        .select(
            F.lit("commodity").alias("sheet"),
            F.col("n_name").alias("site"),
            F.col("o_orderpriority").alias("item"),
            null_i.alias("t"),
            F.lit("price").alias("attr"),
            "value",
        )
    )

    process = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("n_name", "p_brand")
        .agg(dec_sum("l_quantity").alias("value"))
        .select(
            F.lit("process").alias("sheet"),
            F.col("n_name").alias("site"),
            F.col("p_brand").alias("item"),
            null_i.alias("t"),
            F.lit("inst-cap").alias("attr"),
            "value",
        )
    )

    # NOTE (r10, measured): the hourly census feeds both the demand and
    # supim sheets, so the events aggregation evaluates twice; a
    # materialize boundary here was A/B'd (min-of-4 interleaved) and
    # measured ~1.3× SLOWER — the union's independent sheet subtrees
    # all pipeline inside ONE job, and the eager checkpoint serializes
    # the events pass out of that overlap. Left duplicated as the
    # cheaper evil at bench scale.
    hourly = (
        ev.withColumn("nk", F.col("user_id") % 25)
        .join(F.broadcast(nat), F.col("nk") == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("site"), F.hour("ts").alias("t"))
        .agg(F.sum(F.col("value").cast("decimal(27,6)")).alias("hsum"))
    )
    demand = hourly.select(
        F.lit("demand").alias("sheet"), "site",
        F.lit("elec").alias("item"), "t",
        F.lit("demand").alias("attr"),
        F.round("hsum", 2).cast("double").alias("value"),
    )
    wsite = Window.partitionBy("site")
    supim = hourly.withColumn("tot", F.sum("hsum").over(wsite)).select(
        F.lit("supim").alias("sheet"), "site",
        F.lit("elec").alias("item"), "t",
        F.lit("share").alias("attr"),
        F.round(
            F.col("hsum").cast("double") / F.col("tot").cast("double"), 6
        ).alias("value"),
    )

    bundle = glob.unionByName(site).unionByName(commodity).unionByName(
        process
    ).unionByName(demand).unionByName(supim)
    # Null placement pinned EXPLICITLY on both sides: Spark defaults to
    # NULLS FIRST ascending, DuckDB to NULLS LAST — an unpinned sort on
    # the nullable site/item/t keys would hash-diverge under a row-order
    # sensitive compare.
    return bundle.orderBy(
        F.asc("sheet"),
        F.asc_nulls_first("site"),
        F.asc_nulls_first("item"),
        F.asc_nulls_first("t"),
        F.asc("attr"),
    )


ROUND4_ORACLES["model_export_bundle"] = """
WITH hourly AS (
  SELECT n_name AS site, hour(ts) AS t,
         sum(CAST(value AS DECIMAL(27,6))) AS hsum
  FROM events JOIN nation ON (user_id % 25) = n_nationkey
  GROUP BY n_name, hour(ts)
)
SELECT * FROM (
  SELECT 'global' AS sheet, CAST(NULL AS VARCHAR) AS site,
         CAST(NULL AS VARCHAR) AS item, CAST(NULL AS INT) AS t,
         attr, value
  FROM (VALUES ('CO2 limit', 150000000.0), ('Cost budget', 6500000000.0))
       AS g(attr, value)
  UNION ALL
  SELECT 'site', n_name, NULL, NULL, 'area',
         CAST(n_nationkey * 13 % 50 + 10 AS DOUBLE)
  FROM nation
  UNION ALL
  SELECT 'commodity', n_name, o_orderpriority, NULL, 'price',
         round(sum(CAST(o_totalprice AS DECIMAL(27,6)))::DOUBLE
               / count(o_totalprice), 2)
  FROM orders JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, o_orderpriority
  UNION ALL
  SELECT 'process', n_name, p_brand, NULL, 'inst-cap',
         round(sum(CAST(l_quantity AS DECIMAL(27,6))), 2)::DOUBLE
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY n_name, p_brand
  UNION ALL
  SELECT 'demand', site, 'elec', t, 'demand', round(hsum, 2)::DOUBLE
  FROM hourly
  UNION ALL
  SELECT 'supim', site, 'elec', t, 'share',
         round(hsum::DOUBLE / (sum(hsum) OVER (PARTITION BY site))::DOUBLE, 6)
  FROM hourly
)
ORDER BY sheet, site NULLS FIRST, item NULLS FIRST, t NULLS FIRST, attr
"""

ROUND4_QUERIES["model_export_bundle"] = model_export_bundle


# ---------------------------------------------------------------------------
# table_profile_approx — HLL-sketch statistics, self-validated
# ---------------------------------------------------------------------------

def table_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-path statistics with HLL approximate distincts (SURVEY §2
    #90) — the 100 TB companion of ``table_profile`` (round3.py): exact
    COUNT(DISTINCT) on a high-cardinality key is a full shuffle of the
    keyspace, while approx_count_distinct is a fixed-size HLL++ sketch
    merged map-side (one small exchange, no Expand).

    Raw sketch estimates are engine-specific, so the cross-engine
    contract is the ERROR BOUND, not the estimate: each column emits its
    exact distinct count plus a boolean `approx_within_10pct` asserting
    the engine's own sketch (rsd=0.05) landed within 10% of its own
    exact value — true on any compliant engine, hash-comparable, and an
    honest statement of what a sketch guarantees.
    """
    orders = _t(spark, sf_dir, "orders")

    # Exact distincts and the HLL sketches are computed in SEPARATE
    # aggregates, cross-joined as two 1-row frames (optimization guide
    # §2.3): attached to the multi-distinct aggregate, each partial HLL
    # (rsd=0.05 -> 2.3 KB of registers) is allocated PER GROUP of the
    # Expand's first-level aggregate — one sketch buffer per distinct
    # value per column (~450k groups x 4 sketches ~ 1 GB of buffer
    # churn at sf0.1; measured 1.7 s for a 2-exchange plan, and the r9
    # "unexplained 1.51->2.35 s regression" in VERDICT §6). Split, the
    # sketch side is ONE map-side-merged fixed-size buffer per column
    # (the 100 TB design intent stated below) and the exact side is a
    # pure long-buffer Expand aggregate. Values are identical: both
    # aggregates see the same rows, and the 10% bound is computed from
    # the same two columns afterwards.
    exact = orders.agg(
        F.countDistinct("o_orderstatus").alias("d_status"),
        F.countDistinct("o_orderpriority").alias("d_prio"),
        F.countDistinct("o_custkey").alias("d_cust"),
        F.countDistinct("o_totalprice").alias("d_price"),
    )
    approx = orders.agg(
        F.approx_count_distinct("o_orderstatus", 0.05).alias("a_status"),
        F.approx_count_distinct("o_orderpriority", 0.05).alias("a_prio"),
        F.approx_count_distinct("o_custkey", 0.05).alias("a_cust"),
        F.approx_count_distinct("o_totalprice", 0.05).alias("a_price"),
    )

    def ok(name: str):
        d = F.col(f"d_{name}").cast("double")
        return (
            F.abs(F.col(f"a_{name}").cast("double") - d) <= 0.10 * d
        ).alias(f"ok_{name}")

    wide = exact.crossJoin(approx).select(
        "d_status", "d_prio", "d_cust", "d_price",
        ok("status"), ok("prio"), ok("cust"), ok("price"),
    )
    return wide.select(
        F.expr(
            "stack(4,"
            " 'o_custkey',       d_cust,   ok_cust,"
            " 'o_orderpriority', d_prio,   ok_prio,"
            " 'o_orderstatus',   d_status, ok_status,"
            " 'o_totalprice',    d_price,  ok_price)"
            " AS (column_name, n_distinct, approx_within_10pct)"
        )
    ).orderBy("column_name")


ROUND4_ORACLES["table_profile_approx"] = """
SELECT 'o_custkey' AS column_name,
       count(DISTINCT o_custkey) AS n_distinct,
       abs(approx_count_distinct(o_custkey) - count(DISTINCT o_custkey))
         <= 0.10 * count(DISTINCT o_custkey) AS approx_within_10pct
FROM orders
UNION ALL
SELECT 'o_orderpriority', count(DISTINCT o_orderpriority),
       abs(approx_count_distinct(o_orderpriority) - count(DISTINCT o_orderpriority))
         <= 0.10 * count(DISTINCT o_orderpriority)
FROM orders
UNION ALL
SELECT 'o_orderstatus', count(DISTINCT o_orderstatus),
       abs(approx_count_distinct(o_orderstatus) - count(DISTINCT o_orderstatus))
         <= 0.10 * count(DISTINCT o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_totalprice', count(DISTINCT o_totalprice),
       abs(approx_count_distinct(o_totalprice) - count(DISTINCT o_totalprice))
         <= 0.10 * count(DISTINCT o_totalprice)
FROM orders
ORDER BY column_name
"""

ROUND4_QUERIES["table_profile_approx"] = table_profile_approx


# ---------------------------------------------------------------------------
# bm25_ranking — query-relevance scoring over the corpus
# ---------------------------------------------------------------------------

_BM25_TERMS = ["join", "hash", "scan", "merge"]
_BM25_K1, _BM25_B = 1.2, 0.75


def bm25_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance ranking of the corpus against a query term set
    (SURVEY §2 #91) — the retrieval scorer used to mine training data
    near a topic (quality_score ranks documents absolutely; BM25 ranks
    them against a query).

    Shape at scale: ONE corpus scan computes doc lengths; the token
    explode is filtered to the (tiny, broadcast) query term set BEFORE
    the per-(doc, term) count, so the shuffled key space is
    |query terms| x |matching docs|, never the full token table. The
    corpus-level stats (N, total length) and per-term document
    frequencies are dim-sized broadcasts. Per-term scores round to a
    DECIMAL before the cross-term sum (double addition is
    order-dependent; token_entropy precedent).
    """
    from pyprima_spark.functions.text import tokens_spark
    from pyprima_spark.operators.checkpointing import materialize

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(tokens_spark("text")).alias("toks")
    )
    # The doc-length table feeds THREE consumers (the corpus stats, and
    # the scored join below) — without a boundary each consumer re-runs
    # the corpus tokenize (guide §2.4 duplicate-subtree removal). The
    # materialized form is 2 ints per doc — the narrow side table every
    # BM25 index persists anyway; the tf explode below is the only
    # other tokenize pass left.
    lens = materialize(docs.select("doc_id", F.size("toks").alias("dl")))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    qterms = spark.createDataFrame(
        [(t,) for t in _BM25_TERMS], "term string"
    )
    # r11 (guide §2.4): tf feeds BOTH the df broadcast and the scored
    # join — without a boundary the corpus tokenize+explode pass ran
    # twice. tf is |query terms| x |matching docs| rows of three
    # narrow columns (the postings slice every BM25 index persists),
    # so the checkpoint is cheap at every scale and leaves ONE
    # tokenize pass in the plan.
    tf = materialize(
        docs.select("doc_id", F.explode("toks").alias("term"))
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + _BM25_K1 * (
        1.0
        - _BM25_B
        + _BM25_B
        * F.col("dl")
        / (F.col("total_dl").cast("double") / F.col("n_docs").cast("double"))
    )
    term_score = idf * (F.col("tf") * (_BM25_K1 + 1.0)) / denom
    per_doc = scored.groupBy("doc_id").agg(
        F.round(
            F.sum(F.round(term_score, 8).cast("decimal(18,10)")), 4
        ).cast("double").alias("bm25"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("rank", "doc_id", "bm25", "n_terms_hit")
        .orderBy("rank")
    )


def _bm25_oracle() -> str:
    from pyprima_spark.functions.text import tokens_duck

    terms_sql = ", ".join(f"('{t}')" for t in _BM25_TERMS)
    return f"""
WITH docs AS (
  SELECT doc_id, {tokens_duck('text')} AS toks FROM documents
), lens AS (
  SELECT doc_id, len(toks) AS dl FROM docs
), stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS total_dl FROM lens
), qterms(term) AS (VALUES {terms_sql}),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM docs)
  JOIN qterms USING (term)
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), per_term AS (
  SELECT doc_id,
         round(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * ({_BM25_K1} + 1.0))
           / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl
              / (total_dl::DOUBLE / n_docs::DOUBLE))), 8) AS s
  FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats
), per_doc AS (
  SELECT doc_id,
         round(sum(CAST(s AS DECIMAL(18,10))), 4)::DOUBLE AS bm25,
         count(*) AS n_terms_hit
  FROM per_term GROUP BY doc_id
)
SELECT CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INT) AS rank,
       doc_id, bm25, n_terms_hit
FROM per_doc
QUALIFY rank <= 20
ORDER BY rank
"""


ROUND4_ORACLES["bm25_ranking"] = _bm25_oracle()
ROUND4_QUERIES["bm25_ranking"] = bm25_ranking


# ---------------------------------------------------------------------------
# pii_scan — regex PII detection census per source
# ---------------------------------------------------------------------------

_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection census per source (SURVEY §2 #92): regex scans for
    email/phone patterns — the pre-redaction audit every corpus release
    runs. The synthetic corpus carries no contact strings, so a
    deterministic planted-PII layer (doc_id-derived, explicit below)
    exercises real match counts; the scan itself is the operator.

    JVM-side ``regexp_count`` inside codegen — one narrow pass, one
    (source) aggregation; no Python in the loop. Patterns restricted to
    the regex subset Java and RE2 interpret identically.
    """
    docs = _t(spark, sf_dir, "documents")
    planted = docs.withColumn(
        "body",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" tel 555-010-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    return (
        planted.select(
            "source",
            F.regexp_count("body", F.lit(_PII_EMAIL)).alias("n_email"),
            F.regexp_count("body", F.lit(_PII_PHONE)).alias("n_phone"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n_email") > 0).cast("int")).alias("docs_with_email"),
            F.sum("n_email").alias("email_matches"),
            F.sum((F.col("n_phone") > 0).cast("int")).alias("docs_with_phone"),
            F.sum("n_phone").alias("phone_matches"),
        )
        .orderBy("source")
    )


ROUND4_ORACLES["pii_scan"] = f"""
WITH planted AS (
  SELECT source,
         text
         || CASE WHEN doc_id % 5 = 0
                 THEN ' contact user' || doc_id || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' tel 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END AS body
  FROM documents
), counted AS (
  SELECT source,
         len(regexp_extract_all(body, '{_PII_EMAIL}')) AS n_email,
         len(regexp_extract_all(body, '{_PII_PHONE}')) AS n_phone
  FROM planted
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_email,
       CAST(sum(n_email) AS BIGINT) AS email_matches,
       CAST(sum(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_phone,
       CAST(sum(n_phone) AS BIGINT) AS phone_matches
FROM counted GROUP BY source ORDER BY source
"""

ROUND4_QUERIES["pii_scan"] = pii_scan


# ---------------------------------------------------------------------------
# heavy_hitters — exact global top-k frequent tokens
# ---------------------------------------------------------------------------

def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 most frequent tokens across the corpus (SURVEY §2
    #93) — vocabulary head inspection / stop-list derivation.

    Scale shape: explode -> groupBy(token) is map-side combined (partial
    counts per partition), so the shuffle carries |vocab| rows, not
    |tokens|; the global top-k then compiles to TakeOrderedAndProject
    (per-partition top-k heaps, no full sort). Ties break on the token
    string for determinism.
    """
    from pyprima_spark.functions.text import tokens_spark

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.expr(tokens_spark("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


def _heavy_hitters_oracle() -> str:
    from pyprima_spark.functions.text import tokens_duck

    return f"""
SELECT token, count(*) AS n
FROM (SELECT unnest({tokens_duck('text')}) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


ROUND4_ORACLES["heavy_hitters"] = _heavy_hitters_oracle()
ROUND4_QUERIES["heavy_hitters"] = heavy_hitters


# ---------------------------------------------------------------------------
# knn_sites — k-nearest-site assignment (k > 1 extension of nearest_site)
# ---------------------------------------------------------------------------

def knn_sites(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-nearest-site assignment per customer point (SURVEY §2 #94).

    Reference: spatial_functions.py get_sites assigns points to their
    region; interconnection candidates need the k nearest, not just the
    argmin. The site table is dim-sized and BROADCAST; the rank filter
    (rn <= 3) compiles to WindowGroupLimit, so each task keeps a 3-row
    heap per point — the fact side never shuffles more than its own
    top-3 rows. Distances round to 6dp before ranking (trig doubles are
    cross-engine 1-ulp territory; ranking on the rounded value is the
    stable contract, nearest_site precedent).
    """
    from pyprima_spark.functions.geo import haversine_km

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        ((F.col("c_custkey") * 7919 % 160) - 80 + F.lit(0.5)).alias("lat"),
        ((F.col("c_custkey") * 104729 % 360) - 180 + F.lit(0.5)).alias("lon"),
    )
    sites = _t(spark, sf_dir, "nation").select(
        "n_name",
        ((F.col("n_nationkey") * 13 % 140) - 70 + F.lit(0.0)).alias("slat"),
        ((F.col("n_nationkey") * 29 % 340) - 170 + F.lit(0.0)).alias("slon"),
    )
    d = F.round(
        haversine_km(F.col("lat"), F.col("lon"), F.col("slat"), F.col("slon")),
        6,
    )
    w = Window.partitionBy("c_custkey").orderBy(F.asc("dist"), F.asc("n_name"))
    return (
        cust.crossJoin(F.broadcast(sites))
        .withColumn("dist", d)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_custkey", F.col("rn").cast("int").alias("rn"), "n_name", "dist")
        .orderBy("c_custkey", "rn")
    )


def _knn_oracle() -> str:
    from pyprima_spark.functions.geo import haversine_km_sql

    hav = haversine_km_sql("lat", "lon", "slat", "slon")
    return f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey * 7919 % 160) - 80 + 0.5 AS lat,
         (c_custkey * 104729 % 360) - 180 + 0.5 AS lon
  FROM customer
), sites AS (
  SELECT n_name,
         CAST((n_nationkey * 13 % 140) - 70 AS DOUBLE) AS slat,
         CAST((n_nationkey * 29 % 340) - 170 AS DOUBLE) AS slon
  FROM nation
), dists AS (
  SELECT c_custkey, n_name, round({hav}, 6) AS dist
  FROM pts CROSS JOIN sites
)
SELECT c_custkey,
       CAST(row_number() OVER (PARTITION BY c_custkey ORDER BY dist, n_name) AS INT) AS rn,
       n_name, dist
FROM dists
QUALIFY rn <= 3
ORDER BY c_custkey, rn
"""


ROUND4_ORACLES["knn_sites"] = _knn_oracle()
ROUND4_QUERIES["knn_sites"] = knn_sites


# ---------------------------------------------------------------------------
# cooccurrence_pmi — pointwise mutual information over co-occurring terms
# ---------------------------------------------------------------------------

_PMI_VOCAB_K = 40  # co-occurrence restricted to the top-K vocabulary
_PMI_MIN_PAIRS = 5


def cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top PMI term pairs across the corpus (SURVEY §2 #95) — phrase /
    collocation mining for tokenizer and topic analysis.

    Scale discipline: naive co-occurrence is |doc_vocab|^2 per document.
    The pair space is bounded FIRST by restricting to the top-K global
    vocabulary (a dim-sized broadcast derived with one map-combined
    count), so the per-doc fanout is <= K^2/2 regardless of document
    length — the same candidate-bounding discipline as every LSH band
    join. The (doc, term) incidence table is materialized once before
    its self-join (alias renames below the exchanges defeat reuse,
    SURVEY §6). PMI's ln() runs once per surviving pair on integer
    counts; rounded at the output edge.
    """
    from pyprima_spark.functions.text import tokens_spark

    from pyprima_spark.operators.checkpointing import materialize

    docs = _t(spark, sf_dir, "documents")
    n_docs_df = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # The distinct (doc, term) incidence feeds BOTH the vocab aggregate
    # and the vocab join below; without a boundary the explode+distinct
    # shuffle of the full token table ran once per consumer
    # (guide §2.4, duplicate subtree).
    tok = materialize(
        docs.select(
            "doc_id", F.explode(F.expr(tokens_spark("text"))).alias("term")
        ).distinct()
    )
    wv = Window.orderBy(F.desc("cnt"), F.asc("term"))
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") <= _PMI_VOCAB_K)
        .select("term", F.col("cnt").alias("c_term"))
    )
    inc = tok.join(F.broadcast(vocab), "term").localCheckpoint(eager=True)
    a = inc.select(
        "doc_id", F.col("term").alias("term_a"), F.col("c_term").alias("c_a")
    )
    b = inc.select(
        "doc_id", F.col("term").alias("term_b"), F.col("c_term").alias("c_b")
    )
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b", "c_a", "c_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _PMI_MIN_PAIRS)
    )
    pmi = F.round(
        F.log(
            F.col("n_ab").cast("double")
            * F.col("n_docs").cast("double")
            / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
        ),
        4,
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("term_a"), F.asc("term_b"))
    return (
        pairs.crossJoin(F.broadcast(n_docs_df))
        .withColumn("pmi", pmi)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("rank", "term_a", "term_b", "n_ab", "pmi")
        .orderBy("rank")
    )


def _pmi_oracle() -> str:
    from pyprima_spark.functions.text import tokens_duck

    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest({tokens_duck('text')}) AS term
  FROM documents
), vocab AS (
  SELECT term, count(*) AS c_term
  FROM tok GROUP BY term
  ORDER BY c_term DESC, term LIMIT {_PMI_VOCAB_K}
), inc AS (
  SELECT doc_id, term, c_term FROM tok JOIN vocab USING (term)
), pairs AS (
  SELECT a.term AS term_a, b.term AS term_b, a.c_term AS c_a,
         b.c_term AS c_b, count(*) AS n_ab
  FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2, 3, 4
  HAVING count(*) >= {_PMI_MIN_PAIRS}
), scored AS (
  SELECT term_a, term_b, n_ab,
         round(ln(n_ab::DOUBLE * (SELECT count(*) FROM documents)::DOUBLE
                  / (c_a::DOUBLE * c_b::DOUBLE)), 4) AS pmi
  FROM pairs
)
SELECT CAST(row_number() OVER (ORDER BY pmi DESC, term_a, term_b) AS INT) AS rank,
       term_a, term_b, n_ab, pmi
FROM scored
QUALIFY rank <= 20
ORDER BY rank
"""


ROUND4_ORACLES["cooccurrence_pmi"] = _pmi_oracle()
ROUND4_QUERIES["cooccurrence_pmi"] = cooccurrence_pmi


# ---------------------------------------------------------------------------
# graph_degree_triangles — local clustering census of the trade graph
# ---------------------------------------------------------------------------

def _canonical_edge_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct canonical (a < b) nation-pair edges of the trade graph —
    the same edge semantics as canonical_edges (util.py:139-155
    reverse_lines + the grouped line table), weights dropped."""
    from pyprima_spark.operators.edges import canonicalize_edges

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select(
            F.col("c_nationkey").alias("cn"),
            F.col("s_nationkey").alias("sn"),
        )
    )
    return (
        canonicalize_edges(pairs, "cn", "sn")
        .select("edge_a", "edge_b")
        .distinct()
    )


def graph_degree_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree + triangle participation per node (SURVEY §2 #96) — the
    local-clustering census that grid-topology QA runs on the line
    graph (generate_intermediate_files.py:463-490 builds the node
    neighborhood the same way).

    Triangle counting in its canonical distributed form: edges are
    ordered (a < b), so each triangle a<b<c is found EXACTLY once by
    joining (a,b)x(b,c) on the middle node and verifying (a,c) with a
    semi-join against the edge set — three equi-joins, no direction
    double-counting, no dedup pass. The edge table is materialized once
    (it feeds four consumers); at web-graph scale the same plan holds
    with the standard high-degree-vertex split.
    """
    edges = _canonical_edge_set(spark, sf_dir).localCheckpoint(eager=True)
    return (
        degree_triangle_census(edges)
        .select(
            F.col("node").alias("nationkey"), "degree", "n_triangles"
        )
        .orderBy("nationkey")
    )


def degree_triangle_census(edges: DataFrame) -> DataFrame:
    """(node, degree, n_triangles) over a canonical (edge_a < edge_b)
    distinct edge table — the reusable kernel behind
    graph_degree_triangles; unit-tested on hand-built graphs."""
    deg = (
        edges.select(F.col("edge_a").alias("node"))
        .union(edges.select(F.col("edge_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    wedge = (
        edges.alias("e1")
        .join(
            edges.alias("e2"),
            F.col("e1.edge_b") == F.col("e2.edge_a"),
        )
        .select(
            F.col("e1.edge_a").alias("a"),
            F.col("e1.edge_b").alias("b"),
            F.col("e2.edge_b").alias("c"),
        )
    )
    tris = wedge.join(
        edges.select(
            F.col("edge_a").alias("a"), F.col("edge_b").alias("c")
        ),
        ["a", "c"],
        "leftsemi",
    )
    tri_per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return deg.join(tri_per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
    )


ROUND4_ORACLES["graph_degree_triangles"] = """
WITH pairs AS (
  SELECT least(c_nationkey, s_nationkey)    AS edge_a,
         greatest(c_nationkey, s_nationkey) AS edge_b
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
), edges AS MATERIALIZED (
  -- <=625-row nation-pair census; MATERIALIZED because DuckDB inlines
  -- CTEs by default and this one is referenced from deg, both wedge
  -- legs AND the EXISTS — each expansion re-runs the lineitem 4-way
  -- join (the SURVEY #205 / section-6(d) pathology; measured 35+ min
  -- vs 17 s at sf0.1)
  SELECT DISTINCT edge_a, edge_b FROM pairs
), deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT edge_a AS node FROM edges
    UNION ALL
    SELECT edge_b FROM edges
  ) GROUP BY node
), tris AS (
  SELECT e1.edge_a AS a, e1.edge_b AS b, e2.edge_b AS c
  FROM edges e1
  JOIN edges e2 ON e1.edge_b = e2.edge_a
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.edge_a = e1.edge_a AND e3.edge_b = e2.edge_b)
), tri_per_node AS (
  SELECT node, count(*) AS n_triangles FROM (
    SELECT a AS node FROM tris
    UNION ALL SELECT b FROM tris
    UNION ALL SELECT c FROM tris
  ) GROUP BY node
)
SELECT deg.node AS nationkey, degree,
       coalesce(n_triangles, 0) AS n_triangles
FROM deg LEFT JOIN tri_per_node ON deg.node = tri_per_node.node
ORDER BY nationkey
"""

ROUND4_QUERIES["graph_degree_triangles"] = graph_degree_triangles


# ---------------------------------------------------------------------------
# range_partition_bounds — sort/range-partition planning from disc quantiles
# ---------------------------------------------------------------------------

_RPB_BUCKETS = 8


def range_partition_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioner boundary computation + balance proof (SURVEY §2
    #97) — what Spark's RangePartitioner (and every distributed sort /
    range-clustered write) does before shuffling: pick split points,
    then prove the buckets are balanced.

    Boundaries are DISCRETE percentiles (percentile_disc returns an
    actual data value — no interpolation float, so the bounds are
    bit-identical across engines; the cont variant would interpolate
    and drift) computed over a DETERMINISTIC 4% hash-gated sample —
    exactly Spark's RangePartitioner design (reservoir-sample then
    split), with the md5 gate making the sample engine-reproducible
    where a reservoir is not. Sampling is what keeps this scale-sane:
    exact percentiles buffer the full column on one reducer, while the
    sample bound is |table|/25 regardless of scale, and the resulting
    census SHOWS the sample bounds still split within a few percent of
    even. The 7-bound row is a 1-row broadcast; bucket assignment is a
    row-local CASE, and the census is one map-combined aggregation.
    """
    from pyprima_spark.functions import text as X

    orders = _t(spark, sf_dir, "orders")
    qs = [i / _RPB_BUCKETS for i in range(1, _RPB_BUCKETS)]
    gate = F.expr(X.hash64_spark("cast(o_orderkey as string)")) % 100 < 4
    bounds = orders.filter(gate).agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY o_totalprice)"
            ).alias(f"b{i}")
            for i, q in enumerate(qs, start=1)
        ]
    )
    bucket = F.lit(1)
    for i in range(1, _RPB_BUCKETS):
        bucket = bucket + (F.col("o_totalprice") > F.col(f"b{i}")).cast("int")
    return (
        orders.select("o_totalprice")
        .crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("bucket")
    )


def _rpb_oracle() -> str:
    from pyprima_spark.functions import text as X

    qs = [i / _RPB_BUCKETS for i in range(1, _RPB_BUCKETS)]
    bound_cols = ", ".join(
        f"quantile_disc(o_totalprice, {q}) AS b{i}"
        for i, q in enumerate(qs, start=1)
    )
    bucket_expr = " + ".join(
        ["1"]
        + [
            f"CASE WHEN o_totalprice > b{i} THEN 1 ELSE 0 END"
            for i in range(1, _RPB_BUCKETS)
        ]
    )
    gate = X.hash64_duck("cast(o_orderkey as VARCHAR)")
    return f"""
WITH bounds AS (
  SELECT {bound_cols} FROM orders WHERE {gate} % 100 < 4
)
SELECT {bucket_expr} AS bucket,
       count(*) AS n_rows,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi
FROM orders CROSS JOIN bounds
GROUP BY 1 ORDER BY 1
"""


ROUND4_ORACLES["range_partition_bounds"] = _rpb_oracle()
ROUND4_QUERIES["range_partition_bounds"] = range_partition_bounds


# ---------------------------------------------------------------------------
# percent_change_mom — month-over-month growth per segment
# ---------------------------------------------------------------------------

def percent_change_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change per order priority (SURVEY §2
    #98) — the period-over-period KPI layout: one keyed monthly
    aggregation, then a lag window over the SAME partitioning (the agg
    exchange already clusters by priority, so the window adds a sort
    but no second shuffle). The pct change divides the two ROUNDED
    decimal totals once — engine-identical by construction.
    """
    orders = _t(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(dec_sum("o_totalprice").alias("total"))
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("total").over(w)
    return monthly.select(
        "o_orderpriority",
        "month",
        "total",
        F.round((F.col("total") - prev) / prev * 100.0, 6).alias("pct_change"),
    ).orderBy("o_orderpriority", "month")


ROUND4_ORACLES["percent_change_mom"] = """
WITH monthly AS (
  SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
         round(sum(CAST(o_totalprice AS DECIMAL(27,6))), 2)::DOUBLE AS total
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month, total,
       round((total - lag(total) OVER w) / lag(total) OVER w * 100.0, 6)
         AS pct_change
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
ORDER BY o_orderpriority, month
"""

ROUND4_QUERIES["percent_change_mom"] = percent_change_mom


# ---------------------------------------------------------------------------
# ngram_containment — asymmetric near-subset detection
# ---------------------------------------------------------------------------

_CONTAIN_TAU = 0.7
# Containment drops the length-band bucket (cross-length pairs are the
# point), so its only fanout bound is the per-(source, gram) df cutoff —
# set TIGHTER than jaccard's: measured at sf0.1, grams with df in
# 120..200 tripled the gram table (615k -> 194k rows) while adding <3%
# candidate pairs (622k -> 605k); they connect pairs already connected
# by rarer grams.
_CONTAIN_DF_MAX = 120


def ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-3-gram containment pairs (SURVEY §2 #99): containment
    |A∩B| / min(|A|,|B|) catches a short document embedded in a longer
    one — the quote/boilerplate-inclusion case Jaccard structurally
    misses (the union denominator drowns it). The standard second gate
    of a corpus dedup stack next to ngram_jaccard.

    Same bucketed-join discipline as ngram_jaccard, with ONE deliberate
    difference: no length-band bucket key — cross-length pairs are the
    whole point of containment — so the per-(source, gram) document-
    frequency cutoff is the only (and sufficient) fanout bound. Gram
    table materialized once ahead of its self-join (SURVEY §6).
    """
    from pyprima_spark.operators.dedup import gram_set_sizes, ngram_gram_table

    docs = _t(spark, sf_dir, "documents")
    grams = ngram_gram_table(
        docs, "doc_id", "text", ["source"], df_max=_CONTAIN_DF_MAX
    ).localCheckpoint(eager=True)
    sizes = gram_set_sizes(grams)
    a = grams.select(F.col("doc").alias("doc_a"), "source", "gram")
    b = grams.select(F.col("doc").alias("doc_b"), "source", "gram")
    shared = (
        a.join(b, ["source", "gram"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    withsizes = shared.join(
        sizes.select(F.col("doc").alias("doc_a"), F.col("gset_size").alias("size_a")),
        "doc_a",
    ).join(
        sizes.select(F.col("doc").alias("doc_b"), F.col("gset_size").alias("size_b")),
        "doc_b",
    )
    cont = F.round(F.col("shared") / F.least("size_a", "size_b"), 4)
    return (
        withsizes.withColumn("containment", cont)
        .filter(F.col("containment") >= _CONTAIN_TAU)
        .select("doc_a", "doc_b", "containment")
        .orderBy("doc_a", "doc_b")
    )


def _containment_oracle() -> str:
    from pyprima_spark.functions import text as X

    return f"""
WITH docs AS (
  SELECT doc_id, source,
         {X.char_ngrams_duck(X.normtext_duck('text'))} AS grams
  FROM documents
),
exploded AS (
  SELECT doc_id AS doc, source, unnest(grams) AS gram
  FROM docs WHERE len(grams) > 0
),
kept AS (
  SELECT doc, source, gram FROM (
    SELECT *, count(*) OVER (PARTITION BY source, gram) AS df
    FROM exploded
  ) WHERE df <= {_CONTAIN_DF_MAX}
),
grams AS (
  SELECT *, count(*) OVER (PARTITION BY doc) AS gset_size FROM kept
),
shared AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, a.gset_size AS size_a,
         b.gset_size AS size_b, count(*) AS shared
  FROM grams a JOIN grams b
    ON a.source = b.source AND a.gram = b.gram AND a.doc < b.doc
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(shared / least(size_a, size_b), 4) AS containment
FROM shared
WHERE round(shared / least(size_a, size_b), 4) >= {_CONTAIN_TAU}
ORDER BY doc_a, doc_b
"""


ROUND4_ORACLES["ngram_containment"] = _containment_oracle()
ROUND4_QUERIES["ngram_containment"] = ngram_containment


# ---------------------------------------------------------------------------
# vector_quantize_sq — int8 scalar quantization + reconstruction error
# ---------------------------------------------------------------------------

def vector_quantize_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension int8 scalar quantization of the embedding table
    with a reconstruction-error report per label (SURVEY §2 #100) — the
    compression step ANN indexes (IVF-SQ8) apply before the similarity
    ops in operators/similarity.py, here with the error audit that
    decides whether SQ8 is safe for a corpus.

    Layout: one posexplode to long (vec_id, dim, v) form; per-dim
    min/max is a map-combined agg whose output (n_dims rows) BROADCASTS
    back — the fact side shuffles once for the label rollup and never
    for calibration. Quantization/dequantization is row-local integer
    math; squared errors ride a DECIMAL sum (double sums are partition-
    order dependent; agg.py).
    """
    emb = _t(spark, sf_dir, "embeddings")
    long = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v"),
    )
    bounds = long.groupBy("dim").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    q = F.when(
        F.col("hi") > F.col("lo"),
        F.round((F.col("v") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255.0),
    ).otherwise(F.lit(0.0))
    joined = long.join(F.broadcast(bounds), "dim").withColumn("q", q)
    err = F.col("v") - (
        F.col("lo") + F.col("q") / 255.0 * (F.col("hi") - F.col("lo"))
    )
    return (
        joined.withColumn("se", (err * err).cast("decimal(18,12)"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_elems"),
            F.round(
                F.sum("se").cast("double") / F.count(F.lit(1)), 10
            ).alias("mse"),
        )
        .orderBy("label")
    )


ROUND4_ORACLES["vector_quantize_sq"] = """
WITH long AS (
  SELECT vec_id, label, CAST(i AS INT) AS dim,
         CAST(embedding[i + 1] AS DOUBLE) AS v
  FROM embeddings, (SELECT unnest(range(64)) AS i) dims
), bounds AS (
  SELECT dim, min(v) AS lo, max(v) AS hi FROM long GROUP BY dim
), quant AS (
  SELECT label,
         v - (lo + (CASE WHEN hi > lo
                         THEN round((v - lo) / (hi - lo) * 255.0)
                         ELSE 0.0 END) / 255.0 * (hi - lo)) AS err
  FROM long JOIN bounds USING (dim)
)
SELECT label, count(*) AS n_elems,
       round(sum(CAST(err * err AS DECIMAL(18,12)))::DOUBLE / count(*), 10) AS mse
FROM quant GROUP BY label ORDER BY label
"""

ROUND4_QUERIES["vector_quantize_sq"] = vector_quantize_sq


# ---------------------------------------------------------------------------
# event_gap_stats — inter-arrival gap distribution per event type
# ---------------------------------------------------------------------------

def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event-gap distribution per event type (SURVEY §2 #101) —
    the arrival-process profile that calibrates sessionization gaps and
    watermark delays (the 4h SESSION_GAP and '1 second' watermark in
    streaming/sessions.py are exactly the parameters this measures).

    One (user, type)-keyed window computes consecutive gaps in exact
    integer microseconds; the per-type rollup uses DISCRETE percentiles
    (actual data values — engine-exact on integers, no interpolation
    float) and a decimal mean. Two shuffles total, both on uniform keys.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn(
            "gap_us", F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.sum("gap_us").cast("double") / F.count(F.lit(1)) / 1e6, 3).alias("mean_s"),
            (
                F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)")
                / 1e6
            ).alias("p50_s"),
            (
                F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY gap_us)")
                / 1e6
            ).alias("p95_s"),
        )
        .orderBy("event_type")
    )


ROUND4_ORACLES["event_gap_stats"] = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) AS gap_us
  FROM events
)
SELECT event_type, count(*) AS n_gaps,
       round(sum(gap_us)::DOUBLE / count(*) / 1e6, 3) AS mean_s,
       quantile_disc(gap_us, 0.5) / 1e6 AS p50_s,
       quantile_disc(gap_us, 0.95) / 1e6 AS p95_s
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type ORDER BY event_type
"""

ROUND4_QUERIES["event_gap_stats"] = event_gap_stats


# ---------------------------------------------------------------------------
# charset_stats — character-class composition per source
# ---------------------------------------------------------------------------

_CHARSET_CLASSES = [
    ("digit", "[0-9]"),
    ("space", "[ ]"),
    ("punct", "[.,;:!?]"),
]


def charset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class composition per source (SURVEY §2 #102) — the
    encoding/garbage screen next to lang_id and quality_score (a source
    whose digit or punctuation mass spikes is markup, tables, or
    mojibake, not prose).

    Class counts are computed row-locally as length deltas under
    regexp_replace (JVM regex inside codegen, one narrow pass); the
    per-source rollup sums exact BIGINTs and emits each ratio as ONE
    correctly-rounded division. Patterns stay in the character-class
    subset Java and RE2 treat identically.
    """
    docs = _t(spark, sf_dir, "documents")
    counts = docs.select(
        "source",
        F.length("text").alias("total"),
        *[
            (
                F.length("text")
                - F.length(F.regexp_replace("text", pat, ""))
            ).alias(name)
            for name, pat in _CHARSET_CLASSES
        ],
    )
    sums = counts.groupBy("source").agg(
        F.sum("total").alias("n_chars"),
        *[F.sum(name).alias(f"n_{name}") for name, _ in _CHARSET_CLASSES],
    )
    return sums.select(
        "source",
        "n_chars",
        *[
            F.round(
                F.col(f"n_{name}").cast("double") / F.col("n_chars"), 6
            ).alias(f"{name}_ratio")
            for name, _ in _CHARSET_CLASSES
        ],
    ).orderBy("source")


def _charset_oracle() -> str:
    class_counts = ", ".join(
        f"sum(length(text) - length(regexp_replace(text, '{pat}', '', 'g'))) AS n_{name}"
        for name, pat in _CHARSET_CLASSES
    )
    ratios = ", ".join(
        f"round(n_{name}::DOUBLE / n_chars, 6) AS {name}_ratio"
        for name, _ in _CHARSET_CLASSES
    )
    return f"""
WITH sums AS (
  SELECT source, sum(length(text)) AS n_chars, {class_counts}
  FROM documents GROUP BY source
)
SELECT source, CAST(n_chars AS BIGINT) AS n_chars, {ratios}
FROM sums ORDER BY source
"""


ROUND4_ORACLES["charset_stats"] = _charset_oracle()
ROUND4_QUERIES["charset_stats"] = charset_stats


# ---------------------------------------------------------------------------
# running_inventory — cumulative balance + peak per part
# ---------------------------------------------------------------------------

def running_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running net-inventory balance per part (SURVEY §2 #103): returns
    ('R' lines) add stock back, shipments draw it down; the report is
    each part's final balance and the peak drawdown the warehouse must
    provision for — the classic running-balance kernel (same window
    family as the reference's cumulative capacity cohorts,
    generate_intermediate_files.py:675-683).

    ONE shuffle on l_partkey serves both the cumulative window and the
    final per-part rollup (the agg inherits the window's hash
    partitioning). The cumulative sum runs in DECIMAL — a running
    double sum would drift order-dependently at exactly the row where a
    peak is decided. Deterministic total order within a part via the
    (shipdate, orderkey, linenumber) natural key.
    """
    li = _t(spark, sf_dir, "lineitem")
    signed = li.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
        .otherwise(-F.col("l_quantity"))
        .cast("decimal(27,6)")
        .alias("dq"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = signed.withColumn("bal", F.sum("dq").over(w))
    return (
        run.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).alias("n_moves"),
            F.round(F.sum("dq"), 2).cast("double").alias("final_balance"),
            F.round(F.max("bal"), 2).cast("double").alias("peak_balance"),
            F.round(F.min("bal"), 2).cast("double").alias("trough_balance"),
        )
        .orderBy("l_partkey")
    )


ROUND4_ORACLES["running_inventory"] = """
WITH signed AS (
  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
         CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
                   ELSE -l_quantity END AS DECIMAL(27,6)) AS dq
  FROM lineitem
), run AS (
  SELECT l_partkey, dq,
         sum(dq) OVER (
           PARTITION BY l_partkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS bal
  FROM signed
)
SELECT l_partkey, count(*) AS n_moves,
       round(sum(dq), 2)::DOUBLE AS final_balance,
       round(max(bal), 2)::DOUBLE AS peak_balance,
       round(min(bal), 2)::DOUBLE AS trough_balance
FROM run GROUP BY l_partkey ORDER BY l_partkey
"""

ROUND4_QUERIES["running_inventory"] = running_inventory


# ---------------------------------------------------------------------------
# order_cycle_time — order-to-last-shipment latency distribution
# ---------------------------------------------------------------------------

def order_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-final-shipment cycle time per priority class (SURVEY §2
    #104) — the fulfillment-latency SLA report: per order, days from
    order date to its LAST shipped line; per priority, the count / mean
    / p50 / p95 of that distribution.

    The per-order max is a map-combined agg on the join key the
    lineitem-orders join already shuffled on; day deltas are exact
    integers, so the discrete percentiles are engine-exact and the mean
    is one rounded division of a BIGINT sum.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            "o_orderpriority",
            F.datediff("last_ship", "o_orderdate").alias("cycle_days"),
        )
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum("cycle_days").cast("double") / F.count(F.lit(1)), 3
            ).alias("mean_days"),
            F.expr(
                "percentile_disc(0.5) WITHIN GROUP (ORDER BY cycle_days)"
            ).cast("int").alias("p50_days"),
            F.expr(
                "percentile_disc(0.95) WITHIN GROUP (ORDER BY cycle_days)"
            ).cast("int").alias("p95_days"),
        )
        .orderBy("o_orderpriority")
    )


ROUND4_ORACLES["order_cycle_time"] = """
WITH per_order AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(max(l_shipdate) AS DATE)) AS cycle_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_orderkey, o_orderpriority, o_orderdate
)
SELECT o_orderpriority, count(*) AS n_orders,
       round(sum(cycle_days)::DOUBLE / count(*), 3) AS mean_days,
       CAST(quantile_disc(cycle_days, 0.5) AS INT) AS p50_days,
       CAST(quantile_disc(cycle_days, 0.95) AS INT) AS p95_days
FROM per_order GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

ROUND4_QUERIES["order_cycle_time"] = order_cycle_time


# ---------------------------------------------------------------------------
# golden_record — survivorship merge of duplicate clusters
# ---------------------------------------------------------------------------

def golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge over fingerprint duplicate clusters (SURVEY §2
    #105): dedup_fingerprint answers "which rows are duplicates"; this
    is the MDM step after it — per cluster, elect a canonical survivor
    by an explicit rule (longest text, then lowest id) and merge the
    cluster's attributes (member count, distinct sources, max length).

    One fingerprint-keyed shuffle serves the election window AND the
    attribute rollup; the rule is a total order, so the survivor is
    unique and engine-independent. Only multi-member clusters are
    emitted (the singleton pass-through is the identity).

    The fingerprint is the md5 of the FIRST-40-CHAR normalized-text
    prefix (not the full text): near-duplicate docs share a template
    head, so the coarser key forms real clusters at every test scale
    (sf0.01 has zero full-text duplicate clusters — the r4 driver row
    was vacuous, VERDICT r4 "What's wrong") while staying a pure
    equi-key: one shuffle, no pairwise compare. Normalized text is
    ASCII ([a-z0-9 ]), so Spark substring and DuckDB substr agree.
    """
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    fp = docs.withColumn("fingerprint", F.md5(F.substring(norm, 1, 40)))
    w = Window.partitionBy("fingerprint").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    elected = fp.withColumn("rn", F.row_number().over(w))
    merged = (
        elected.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.countDistinct("source").alias("n_sources"),
            F.max("n_chars").alias("max_chars"),
            F.min(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "survivor_id"
            ),
        )
        .filter(F.col("n_members") >= 2)
    )
    return merged.select(
        "fingerprint", "survivor_id", "n_members", "n_sources", "max_chars"
    ).orderBy("fingerprint")


ROUND4_ORACLES["golden_record"] = """
WITH fp AS (
  SELECT doc_id, source, n_chars,
         md5(substr(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), 1, 40))
           AS fingerprint
  FROM documents
), elected AS (
  SELECT *, row_number() OVER (
    PARTITION BY fingerprint ORDER BY n_chars DESC, doc_id
  ) AS rn
  FROM fp
)
SELECT fingerprint,
       min(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
       count(*) AS n_members,
       count(DISTINCT source) AS n_sources,
       max(n_chars) AS max_chars
FROM elected
GROUP BY fingerprint
HAVING count(*) >= 2
ORDER BY fingerprint
"""

ROUND4_QUERIES["golden_record"] = golden_record


# ---------------------------------------------------------------------------
# skyline_pareto — Pareto frontier (cheapest price vs largest size)
# ---------------------------------------------------------------------------

def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline of parts — minimize retail price, maximize
    size (SURVEY §2 #106): the multi-objective shortlist query (best
    cost/capacity tradeoffs) the reference's technology screening runs
    informally over its assumption tables.

    Distributed form: a LOCAL skyline per hash partition (window keyed
    by a salt — fully parallel), then the exact global skyline over the
    union of local survivors. Correct because dominance is transitive:
    any global dominator survives its own partition, so pruning locally
    never loses a frontier point. The global pass sees only the (tiny)
    candidate union, so its single-partition window is bounded — the
    sort-and-running-max formulation keeps everything expression-level,
    no per-row Python. Ties: equal (price, size) keep the lowest key.
    """
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )
    local = skyline_2d(
        part.withColumn("salt", F.pmod(F.col("p_partkey"), F.lit(32))),
        "p_retailprice",
        "p_size",
        "p_partkey",
        "salt",
    ).drop("salt")
    return skyline_2d(local, "p_retailprice", "p_size", "p_partkey").orderBy(
        "p_retailprice", "p_partkey"
    )


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    tiebreak: str,
    *partition_cols: str,
) -> DataFrame:
    """Rows not dominated on (minimize ↓, maximize ↑) within each
    partition group — sort-and-running-max formulation; the reusable
    kernel behind skyline_pareto, unit-tested on hand-built frames.
    Equal (minimize, maximize) duplicates keep the lowest tiebreak."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.asc(minimize), F.desc(maximize), F.asc(tiebreak))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("prev_max", F.max(maximize).over(w))
        .filter(
            F.col("prev_max").isNull() | (F.col(maximize) > F.col("prev_max"))
        )
        .drop("prev_max")
    )


ROUND4_ORACLES["skyline_pareto"] = """
WITH ranked AS (
  SELECT p_partkey, p_name, p_retailprice, p_size,
         max(p_size) OVER (
           ORDER BY p_retailprice, p_size DESC, p_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_max
  FROM part
)
SELECT p_partkey, p_name, p_retailprice, p_size
FROM ranked
WHERE prev_max IS NULL OR p_size > prev_max
ORDER BY p_retailprice, p_partkey
"""

ROUND4_QUERIES["skyline_pareto"] = skyline_pareto


# ---------------------------------------------------------------------------
# point_in_polygon — TRUE polygon containment (integer ray casting)
# ---------------------------------------------------------------------------
# The reference rasterizes real shapefile polygons (spatial_functions.py
# calc_region:140, crd_exact_points:100); every spatial op in this repo so
# far used bbox analogues because no geometry lib ships in the container.
# Ray casting needs no library: with EVEN integer vertex coordinates and
# ODD integer point coordinates (everything scaled x2), a point can never
# lie on an edge, and the crossing test
#     (yi > y) != (yj > y)  AND  x left of the edge's intersection
# cross-multiplies into pure integer comparisons — EXACT, no float, no
# cross-engine epsilon. Polygons here are non-convex L-shapes (the box
# minus its upper-right quadrant), so the result provably differs from
# bbox containment — both counts are emitted side by side.

# L-shape vertex offsets (x2 scale), counterclockwise.
_PIP_XOFF = [0, 144, 144, 72, 72, 0]
_PIP_YOFF = [0, 0, 40, 40, 80, 80]


def _raycast_crossings() -> "F.Column":
    """Edge-crossing count of the ray from (px, py) through the 6-vertex
    `poly` struct array — exact integer ray casting as a row-local
    aggregate() HOF (see the point_in_polygon docstring for why the
    integer form is float-free). Shared by point_in_polygon and
    polygon_zonal_stats."""
    return F.expr(
        "aggregate(sequence(0, 5), 0, (acc, i) -> acc + IF("
        " (element_at(poly, i + 1).y > py)"
        "   != (element_at(poly, pmod(i + 1, 6) + 1).y > py)"
        " AND CASE"
        "   WHEN element_at(poly, pmod(i + 1, 6) + 1).y"
        "        - element_at(poly, i + 1).y > 0"
        "   THEN (px - element_at(poly, i + 1).x)"
        "        * (element_at(poly, pmod(i + 1, 6) + 1).y"
        "           - element_at(poly, i + 1).y)"
        "      < (element_at(poly, pmod(i + 1, 6) + 1).x"
        "         - element_at(poly, i + 1).x)"
        "        * (py - element_at(poly, i + 1).y)"
        "   ELSE (px - element_at(poly, i + 1).x)"
        "        * (element_at(poly, pmod(i + 1, 6) + 1).y"
        "           - element_at(poly, i + 1).y)"
        "      > (element_at(poly, pmod(i + 1, 6) + 1).x"
        "         - element_at(poly, i + 1).x)"
        "        * (py - element_at(poly, i + 1).y)"
        " END, 1, 0))"
    )


def point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact point-in-polygon census per nation (SURVEY §2 #107).

    Spark-first: the 25-polygon table (6 integer vertices each, riding a
    struct array) is BROADCAST; each customer point runs the 6-edge
    ray-cast as a row-local `aggregate` higher-order function — no row
    fanout, no UDF, whole-stage codegen. At web-scale polygon counts the
    candidate framing switches to the same grid-cell equi-join as
    point_in_region_grid; at high vertex counts the vertex array simply
    rides the broadcast. `n_in_bbox >= n_in_polygon` strictly on the
    upper-right quadrant — the gap is the proof this is real PIP, not a
    box test.
    """
    nat = _t(spark, sf_dir, "nation")
    polys = nat.select(
        "n_name",
        (((F.col("n_nationkey") * 11 % 60) * 6 - 180) * 2).alias("x0"),
        (((F.col("n_nationkey") * 7 % 32) * 5 - 80) * 2).alias("y0"),
    ).withColumn(
        "poly",
        F.array(
            *[
                F.struct(
                    (F.col("x0") + xo).cast("long").alias("x"),
                    (F.col("y0") + yo).cast("long").alias("y"),
                )
                for xo, yo in zip(_PIP_XOFF, _PIP_YOFF)
            ]
        ),
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        (2 * ((F.col("c_custkey") * 104729 % 360) - 180) + 1)
        .cast("long")
        .alias("px"),
        (2 * ((F.col("c_custkey") * 7919 % 160) - 80) + 1)
        .cast("long")
        .alias("py"),
    )
    crossings = _raycast_crossings()
    in_bbox = (
        (F.col("px") > F.col("x0"))
        & (F.col("px") < F.col("x0") + 144)
        & (F.col("py") > F.col("y0"))
        & (F.col("py") < F.col("y0") + 80)
    )
    tagged = (
        cust.crossJoin(F.broadcast(polys))
        .withColumn("inside", F.pmod(crossings, F.lit(2)) == 1)
        .withColumn("inbox", in_bbox)
    )
    return (
        tagged.groupBy("n_name")
        .agg(
            F.sum(F.col("inside").cast("int")).alias("n_in_polygon"),
            F.sum(F.col("inbox").cast("int")).alias("n_in_bbox"),
        )
        .orderBy("n_name")
    )


def _pip_oracle() -> str:
    xi = "CASE i " + " ".join(
        f"WHEN {i} THEN {xo}" for i, xo in enumerate(_PIP_XOFF)
    ) + " END"
    yi = "CASE i " + " ".join(
        f"WHEN {i} THEN {yo}" for i, yo in enumerate(_PIP_YOFF)
    ) + " END"
    xj = "CASE (i + 1) % 6 " + " ".join(
        f"WHEN {i} THEN {xo}" for i, xo in enumerate(_PIP_XOFF)
    ) + " END"
    yj = "CASE (i + 1) % 6 " + " ".join(
        f"WHEN {i} THEN {yo}" for i, yo in enumerate(_PIP_YOFF)
    ) + " END"
    return f"""
WITH pts AS (
  SELECT c_custkey,
         2 * ((c_custkey * 104729 % 360) - 180) + 1 AS px,
         2 * ((c_custkey * 7919 % 160) - 80) + 1 AS py
  FROM customer
), polys AS (
  SELECT n_name,
         ((n_nationkey * 11 % 60) * 6 - 180) * 2 AS x0,
         ((n_nationkey * 7 % 32) * 5 - 80) * 2 AS y0
  FROM nation
), edges AS (
  SELECT n_name, x0, y0,
         x0 + {xi} AS exi, y0 + {yi} AS eyi,
         x0 + {xj} AS exj, y0 + {yj} AS eyj
  FROM polys, (SELECT unnest(range(6)) AS i) idx
), crossed AS (
  SELECT p.c_custkey, e.n_name, e.x0, e.y0, p.px, p.py,
         sum(CASE WHEN (eyi > py) <> (eyj > py)
                   AND (CASE WHEN eyj - eyi > 0
                             THEN (px - exi) * (eyj - eyi)
                                  < (exj - exi) * (py - eyi)
                             ELSE (px - exi) * (eyj - eyi)
                                  > (exj - exi) * (py - eyi) END)
                  THEN 1 ELSE 0 END) AS crossings
  FROM pts p CROSS JOIN edges e
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT n_name,
       CAST(sum(CASE WHEN crossings % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_in_polygon,
       CAST(sum(CASE WHEN px > x0 AND px < x0 + 144
                      AND py > y0 AND py < y0 + 80
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_in_bbox
FROM crossed
GROUP BY n_name ORDER BY n_name
"""


ROUND4_ORACLES["point_in_polygon"] = _pip_oracle()
ROUND4_LATE_QUERIES["point_in_polygon"] = point_in_polygon


# ---------------------------------------------------------------------------
# polygon_zonal_stats — zonal statistics over TRUE polygon zones
# ---------------------------------------------------------------------------

def polygon_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal raster statistics with REAL polygon zones (SURVEY §2 #108)
    — zonal_stats (#49) upgraded from bbox analogues to the reference's
    actual shape (spatial_functions.py zonal_stats over rasterized
    polygon regions): pixel values aggregated per containing L-shaped
    polygon.

    Two-phase containment, the production spatial-join layout: a cheap
    bbox PREFILTER on the broadcast join condition discards ~everything
    first, and the exact integer ray cast (see point_in_polygon) runs
    only on bbox survivors — at billions of pixels the expensive test
    never sees the pixels the box already excludes. All-integer
    throughout; the mean is one rounded division of exact totals.
    """
    nat = _t(spark, sf_dir, "nation")
    polys = nat.select(
        "n_name",
        (((F.col("n_nationkey") * 11 % 60) * 6 - 180) * 2).alias("x0"),
        (((F.col("n_nationkey") * 7 % 32) * 5 - 80) * 2).alias("y0"),
    ).withColumn(
        "poly",
        F.array(
            *[
                F.struct(
                    (F.col("x0") + xo).cast("long").alias("x"),
                    (F.col("y0") + yo).cast("long").alias("y"),
                )
                for xo, yo in zip(_PIP_XOFF, _PIP_YOFF)
            ]
        ),
    )
    pix = (
        spark.range(160 * 360)
        .withColumn("latidx", (F.col("id") / 360).cast("int"))
        .withColumn("lonidx", (F.col("id") % 360).cast("int"))
        .select(
            (2 * (F.col("lonidx") - 180) + 1).cast("long").alias("px"),
            (2 * (F.col("latidx") - 80) + 1).cast("long").alias("py"),
            ((F.col("latidx") * 7 + F.col("lonidx") * 13) % 100).alias("pixval"),
        )
    )
    bbox = (
        (F.col("px") > F.col("x0"))
        & (F.col("px") < F.col("x0") + 144)
        & (F.col("py") > F.col("y0"))
        & (F.col("py") < F.col("y0") + 80)
    )
    crossings = _raycast_crossings()
    # The verify is a CONDITIONAL AGGREGATE, not a filter: a Filter node
    # over the aggregate() HOF trips a Spark 4.1 pushdown bug (the
    # predicate is pushed below the broadcast join into the range scan,
    # which fails at runtime with INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND
    # "Could not find poly#N in [id#M]"). Summing IF(inside, ..) is the
    # same work in the same stage — and point_in_polygon's identical
    # shape is known-good.
    inside = (F.pmod(crossings, F.lit(2)) == 1).cast("int")
    return (
        pix.join(F.broadcast(polys), bbox)          # cheap prefilter
        .withColumn("inside", inside)
        .groupBy("n_name")
        .agg(
            F.sum("inside").alias("n_cells"),
            F.sum(F.col("inside") * F.col("pixval")).alias("total"),
            F.round(
                F.sum(F.col("inside") * F.col("pixval")).cast("double")
                / F.sum("inside"),
                4,
            ).alias("mean_val"),
        )
        .orderBy("n_name")
    )


def _polygon_zonal_oracle() -> str:
    xi = "CASE i " + " ".join(
        f"WHEN {i} THEN {xo}" for i, xo in enumerate(_PIP_XOFF)
    ) + " END"
    yi = "CASE i " + " ".join(
        f"WHEN {i} THEN {yo}" for i, yo in enumerate(_PIP_YOFF)
    ) + " END"
    xj = "CASE (i + 1) % 6 " + " ".join(
        f"WHEN {i} THEN {xo}" for i, xo in enumerate(_PIP_XOFF)
    ) + " END"
    yj = "CASE (i + 1) % 6 " + " ".join(
        f"WHEN {i} THEN {yo}" for i, yo in enumerate(_PIP_YOFF)
    ) + " END"
    return f"""
WITH pix AS (
  SELECT 2 * (cast(id % 360 AS INT) - 180) + 1 AS px,
         2 * (cast(id // 360 AS INT) - 80) + 1 AS py,
         (cast(id // 360 AS INT) * 7 + cast(id % 360 AS INT) * 13) % 100
           AS pixval
  FROM (SELECT unnest(range(57600)) AS id)
), polys AS (
  SELECT n_name,
         ((n_nationkey * 11 % 60) * 6 - 180) * 2 AS x0,
         ((n_nationkey * 7 % 32) * 5 - 80) * 2 AS y0
  FROM nation
), boxed AS (
  SELECT p.px, p.py, p.pixval, q.n_name, q.x0, q.y0
  FROM pix p JOIN polys q
    ON p.px > q.x0 AND p.px < q.x0 + 144
   AND p.py > q.y0 AND p.py < q.y0 + 80
), crossed AS (
  SELECT px, py, pixval, n_name,
         sum(CASE WHEN (y0 + {yi} > py) <> (y0 + {yj} > py)
                   AND (CASE WHEN ({yj}) - ({yi}) > 0
                             THEN (px - x0 - ({xi})) * (({yj}) - ({yi}))
                                  < (({xj}) - ({xi})) * (py - y0 - ({yi}))
                             ELSE (px - x0 - ({xi})) * (({yj}) - ({yi}))
                                  > (({xj}) - ({xi})) * (py - y0 - ({yi}))
                        END)
                  THEN 1 ELSE 0 END) AS crossings
  FROM boxed, (SELECT unnest(range(6)) AS i) idx
  GROUP BY 1, 2, 3, 4
)
SELECT n_name, count(*) AS n_cells,
       CAST(sum(pixval) AS BIGINT) AS total,
       round(sum(pixval)::DOUBLE / count(*), 4) AS mean_val
FROM crossed WHERE crossings % 2 = 1
GROUP BY n_name ORDER BY n_name
"""


ROUND4_ORACLES["polygon_zonal_stats"] = _polygon_zonal_oracle()
ROUND4_LATE_QUERIES["polygon_zonal_stats"] = polygon_zonal_stats


# ---------------------------------------------------------------------------
# incremental_minhash_index — near-dup gate against a persisted index
# ---------------------------------------------------------------------------

def incremental_minhash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup ingestion gate (SURVEY §2 #109):
    incremental_new_docs(+bloom) gates on exact fingerprints; this is
    the minhash version — an incoming batch's LSH band signatures probe
    the persisted signature index of already-ingested docs, flagging
    near-duplicates of existing content before they enter the corpus
    (the standard crawl-recrawl dedup layout: the index is the parquet
    signature table, only the incoming batch is freshly shingled).

    Split here is deterministic (doc_id % 5: 0-2 = indexed corpus,
    3-4 = incoming). One band derivation serves both sides (checkpoint,
    then filter — at scale the index side is a parquet READ, not a
    derivation); the probe is a band-key equi-join, never all-pairs.
    """
    from pyprima_spark.operators.dedup import minhash_band_table

    docs = _t(spark, sf_dir, "documents")
    bands = minhash_band_table(docs, "doc_id", "text").localCheckpoint(
        eager=True
    )
    seen_b = bands.filter(F.col("doc") % 5 < 3)
    inc_b = bands.filter(F.col("doc") % 5 >= 3)
    flagged = (
        inc_b.join(
            seen_b.select(
                F.col("band_idx").alias("bi"), F.col("band_sig").alias("bs")
            ),
            (F.col("band_idx") == F.col("bi"))
            & (F.col("band_sig") == F.col("bs")),
            "leftsemi",
        )
        .select("doc")
        .distinct()
        .withColumn("is_neardup", F.lit(1))
    )
    incoming = docs.filter(F.col("doc_id") % 5 >= 3).select(
        F.col("doc_id").alias("doc"), "source"
    )
    return (
        incoming.join(flagged, "doc", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.sum(F.coalesce("is_neardup", F.lit(0))).alias("n_neardup"),
            (
                F.count(F.lit(1))
                - F.sum(F.coalesce("is_neardup", F.lit(0)))
            ).alias("n_clean"),
        )
        .orderBy("source")
    )


# (oracle lives in plans/oracles.py — it reuses the shared minhash band
# CTE builder, which this module cannot import without a cycle)
ROUND4_LATE_QUERIES["incremental_minhash_index"] = incremental_minhash_index


# ---------------------------------------------------------------------------
# blocklist_filter — wordlist content gate census
# ---------------------------------------------------------------------------

_BLOCKLIST = ["slow", "crash", "leak"]


def blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist content-filter census per source (SURVEY §2 #110) —
    the wordlist gate every corpus release runs (profanity / policy
    lists); here counting per source: documents flagged (>= 1 hit) and
    total hits. The membership count is a row-local aggregate() HOF over
    the token array against an inlined (broadcast-literal) list — no
    explode, no join, whole-stage codegen; lists too big to inline ride
    a broadcast join instead.
    """
    from pyprima_spark.functions import text as X

    docs = _t(spark, sf_dir, "documents")
    hits = F.expr(
        X.stopword_count_spark(X.tokens_spark("text"), _BLOCKLIST)
    )
    return (
        docs.select("source", hits.alias("hits"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("hits") > 0).cast("int")).alias("flagged_docs"),
            F.sum("hits").alias("total_hits"),
        )
        .orderBy("source")
    )


def _blocklist_oracle() -> str:
    from pyprima_spark.functions import text as X

    hits = X.stopword_count_duck(X.tokens_duck("text"), _BLOCKLIST)
    return f"""
WITH counted AS (SELECT source, {hits} AS hits FROM documents)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS flagged_docs,
       CAST(sum(hits) AS BIGINT) AS total_hits
FROM counted GROUP BY source ORDER BY source
"""


ROUND4_ORACLES["blocklist_filter"] = _blocklist_oracle()
ROUND4_LATE_QUERIES["blocklist_filter"] = blocklist_filter


# ---------------------------------------------------------------------------
# rolling_origin_backtest — expanding-window time-series CV splits
# ---------------------------------------------------------------------------

_BACKTEST_FOLDS = 4


def rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) backtest split census (SURVEY
    §2 #111) — the time-series cross-validation layout for forecast
    models trained on the event stream: fold i trains on day_index <
    cut_i and tests on the next horizon days, cuts at 50/60/70/80% of
    the observed span, horizon = span/10 (all integer arithmetic on the
    data-derived bounds).

    Plan: the (min_day, span) bounds fold to a 1-row broadcast; folds
    are a literal 4-row broadcast; each event row fans out only to the
    folds whose train/test range covers it (<= K copies, conditional
    aggregation) and the census is one map-combined (fold) group-by.
    Emitting counts per fold proves splits are leakage-free by
    construction: train_end == test_start.
    """
    ev = _t(spark, sf_dir, "events")
    days = ev.select(F.to_date("ts").alias("d"))
    bounds = days.agg(
        F.min("d").alias("d0"),
        (F.datediff(F.max("d"), F.min("d")) + 1).alias("span"),
    )
    folds = spark.createDataFrame(
        [(i,) for i in range(_BACKTEST_FOLDS)], "fold int"
    )
    tagged = (
        days.crossJoin(F.broadcast(bounds))
        .withColumn("day_idx", F.datediff("d", "d0"))
        .crossJoin(F.broadcast(folds))
        .withColumn(
            "cut",
            F.expr(f"(span * (50 + 10 * fold)) div 100"),
        )
        .withColumn("horizon", F.expr("span div 10"))
    )
    return (
        tagged.groupBy("fold", "cut", "horizon")
        .agg(
            F.sum((F.col("day_idx") < F.col("cut")).cast("int")).alias(
                "train_rows"
            ),
            F.sum(
                (
                    (F.col("day_idx") >= F.col("cut"))
                    & (F.col("day_idx") < F.col("cut") + F.col("horizon"))
                ).cast("int")
            ).alias("test_rows"),
        )
        .orderBy("fold")
    )


ROUND4_ORACLES["rolling_origin_backtest"] = """
WITH days AS (SELECT CAST(ts AS DATE) AS d FROM events),
bounds AS (
  SELECT min(d) AS d0, date_diff('day', min(d), max(d)) + 1 AS span
  FROM days
), folds AS (SELECT unnest(range(4)) AS fold),
tagged AS (
  SELECT CAST(fold AS INT) AS fold,
         (span * (50 + 10 * fold)) // 100 AS cut,
         span // 10 AS horizon,
         date_diff('day', d0, d) AS day_idx
  FROM days CROSS JOIN bounds CROSS JOIN folds
)
SELECT fold, CAST(cut AS INT) AS cut, CAST(horizon AS INT) AS horizon,
       CAST(sum(CASE WHEN day_idx < cut THEN 1 ELSE 0 END) AS BIGINT)
         AS train_rows,
       CAST(sum(CASE WHEN day_idx >= cut AND day_idx < cut + horizon
                     THEN 1 ELSE 0 END) AS BIGINT) AS test_rows
FROM tagged GROUP BY 1, 2, 3 ORDER BY fold
"""

ROUND4_LATE_QUERIES["rolling_origin_backtest"] = rolling_origin_backtest


# ---------------------------------------------------------------------------
# ordered_string_export — deterministic list-to-string aggregation
# ---------------------------------------------------------------------------

def ordered_string_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation per group (SURVEY §2 #112) — the
    model-file writers join member lists into delimited cells (urbs
    Process-Commodity sheets, evrys site lists; generate_models.py).
    A bare collect_list is partition-order nondeterministic — the ONLY
    stable form is sort_array before array_join, which also makes the
    result engine-identical (DuckDB string_agg ... ORDER BY). Emits the
    member count alongside so downstream can validate truncation.
    """
    nat = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.array_join(
                F.sort_array(F.collect_list("s_name")), ";"
            ).alias("supplier_list"),
        )
        .orderBy("n_name")
    )


ROUND4_ORACLES["ordered_string_export"] = """
SELECT n_name,
       count(*) AS n_suppliers,
       string_agg(s_name, ';' ORDER BY s_name) AS supplier_list
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""

ROUND4_LATE_QUERIES["ordered_string_export"] = ordered_string_export


# ---------------------------------------------------------------------------
# ann_pq — product-quantization ANN (asymmetric distance computation)
# ---------------------------------------------------------------------------
# Completes the ANN taxonomy next to brute-force (ann_topk), hyperplane
# LSH (ann_lsh), and IVF (ann_ivf): PQ compresses each vector to M
# subspace code ids against per-subspace codebooks, and queries rank
# candidates by ADC — the sum of precomputed query->centroid distances
# looked up by code. Codebooks here are deterministic fixed-id vector
# slices (the oracle-replicable stand-in for a trained KMeans codebook —
# ann_ivf precedent; every downstream stage is identical either way).

PQ_SUBS = 4
PQ_SUBDIM = 16
PQ_K = 16


def _pq_centroid_ids() -> list[int]:
    from pyprima_spark.plans.constants import ANN_N_QUERIES

    return [ANN_N_QUERIES + 11 * i for i in range(PQ_K)]


_L2SQ_SPARK = (
    "aggregate(zip_with(svec, cvec, (x, y) -> (x - y) * (x - y)), 0D,"
    " (acc, v) -> acc + v)"
)


def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with ADC ranking (SURVEY §2 #113).

    Scale shape — the reason PQ exists: vectors are ENCODED once (a
    16-row broadcast codebook join + per-(vector, subspace) argmin, all
    map-side), after which similarity search never touches the raw
    vectors again — the candidate scan ranks 8-bit codes against a
    10x16 broadcast distance table. Distances fold sequentially over
    ascending indices in both engines (functions/vectors.py), rounded
    to 6dp before every rank; argmin ties break on centroid id.
    """
    from pyprima_spark.functions import vectors as V
    from pyprima_spark.plans.constants import ANN_N_QUERIES

    emb = _t(spark, sf_dir, "embeddings")
    # Unit-normalize first: on normalized vectors L2^2 = 2 - 2cos, so
    # ADC's L2 ranking is rank-equivalent to the cosine the rest of the
    # ANN family ranks by (and what makes PQ usable for cosine search).
    base = (
        emb.select(
            "vec_id", F.expr(V.to_double_spark("embedding")).alias("raw")
        )
        .withColumn("nrm", F.expr(V.norm_spark("raw")))
        .filter(F.col("nrm") > 0)
        .select(
            "vec_id", F.expr("transform(raw, x -> x / nrm)").alias("vec")
        )
    )
    subsplit = base.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("sub"),
                        F.slice("vec", s * PQ_SUBDIM + 1, PQ_SUBDIM).alias(
                            "svec"
                        ),
                    )
                    for s in range(PQ_SUBS)
                ]
            )
        ).alias("ss"),
    ).select("vec_id", "ss.sub", "ss.svec")
    cents = subsplit.filter(
        F.col("vec_id").isin(_pq_centroid_ids())
    ).select(
        F.col("vec_id").alias("cid"), "sub", F.col("svec").alias("cvec")
    )
    d6 = F.round(F.expr(_L2SQ_SPARK), 6)
    wmin = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("d"), F.asc("cid")
    )
    codes = (
        subsplit.join(F.broadcast(cents), "sub")
        .withColumn("d", d6)
        .withColumn("rn", F.row_number().over(wmin))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "cid")
    )
    dtab = (
        subsplit.filter(F.col("vec_id") < ANN_N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "sub", "svec")
        .join(F.broadcast(cents), "sub")
        .select("query_id", "sub", "cid", d6.alias("qd"))
    )
    adc = (
        codes.join(F.broadcast(dtab), ["sub", "cid"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("qd"), 6).alias("adc"))
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        adc.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 10)
        .select("query_id", "vec_id", "adc", F.col("rank").cast("int").alias("rank"))
        .orderBy("query_id", "rank")
    )


def _ann_pq_oracle() -> str:
    from pyprima_spark.plans.constants import ANN_N_QUERIES

    ids = ", ".join(str(i) for i in _pq_centroid_ids())
    sub_selects = " UNION ALL ".join(
        f"SELECT vec_id, {s} AS sub,"
        f" vec[{s * PQ_SUBDIM + 1}:{(s + 1) * PQ_SUBDIM}] AS svec FROM base"
        for s in range(PQ_SUBS)
    )
    l2 = (
        f"list_sum(list_transform(generate_series(1, {PQ_SUBDIM}),"
        " i -> (v.svec[i] - c.cvec[i]) * (v.svec[i] - c.cvec[i])))"
    )
    from pyprima_spark.functions import vectors as V

    norm = V.norm_duck("raw", V.EMB_DIM)
    return f"""
WITH raw AS (
  SELECT vec_id, embedding::DOUBLE[] AS raw,
         {norm} AS nrm
  FROM embeddings
), base AS (
  SELECT vec_id, list_transform(raw, x -> x / nrm) AS vec
  FROM raw WHERE nrm > 0
), subsplit AS ({sub_selects}),
cents AS (
  SELECT vec_id AS cid, sub, svec AS cvec FROM subsplit
  WHERE vec_id IN ({ids})
), dists AS (
  SELECT v.vec_id, v.sub, c.cid, round({l2}, 6) AS d
  FROM subsplit v JOIN cents c ON v.sub = c.sub
), codes AS (
  SELECT vec_id, sub, cid FROM dists
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, cid) = 1
), dtab AS (
  SELECT vec_id AS query_id, sub, cid, d AS qd FROM dists
  WHERE vec_id < {ANN_N_QUERIES}
), adc AS (
  SELECT t.query_id, e.vec_id, round(sum(t.qd), 6) AS adc
  FROM codes e JOIN dtab t ON e.sub = t.sub AND e.cid = t.cid
  WHERE e.vec_id <> t.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, adc,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY adc, vec_id) AS INT) AS rank
FROM adc
QUALIFY rank <= 10
ORDER BY query_id, rank
"""


ROUND4_ORACLES["ann_pq"] = _ann_pq_oracle()
ROUND4_LATE_QUERIES["ann_pq"] = ann_pq


# ---------------------------------------------------------------------------
# graph_neighbor_jaccard — link-prediction similarity over the trade graph
# ---------------------------------------------------------------------------

def graph_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-set Jaccard similarity between node pairs (SURVEY §2
    #114) — the classic link-prediction / entity-similarity score over
    the trade graph: nodes sharing many trading partners are candidate
    merges (grid planning) or recommended links.

    Same wedge-join discipline as triangle counting: shared-neighbor
    counts come from joining the symmetrized adjacency to itself on the
    MIDDLE node — each shared neighbor contributes exactly one (a, b)
    row — so the pair space is bounded by sum(deg^2), never |V|^2, and
    degenerate hubs are the visible skew key to split. Degrees join on
    as two dim-sized broadcasts; Jaccard = shared / (da + db - shared)
    is one division of exact integers.
    """
    edges = _canonical_edge_set(spark, sf_dir).localCheckpoint(eager=True)
    # symmetrized adjacency (node, nbr)
    adj = edges.select(
        F.col("edge_a").alias("node"), F.col("edge_b").alias("nbr")
    ).union(
        edges.select(F.col("edge_b").alias("node"), F.col("edge_a").alias("nbr"))
    )
    deg = adj.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    shared = (
        adj.alias("x")
        .join(adj.alias("y"), F.col("x.nbr") == F.col("y.nbr"))
        .filter(F.col("x.node") < F.col("y.node"))
        .groupBy(
            F.col("x.node").alias("node_a"), F.col("y.node").alias("node_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        shared.join(
            F.broadcast(deg.select(F.col("node").alias("node_a"),
                                   F.col("degree").alias("deg_a"))),
            "node_a",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("node_b"),
                                   F.col("degree").alias("deg_b"))),
            "node_b",
        )
        .select(
            "node_a",
            "node_b",
            "shared",
            F.round(
                F.col("shared")
                / (F.col("deg_a") + F.col("deg_b") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= 0.5).orderBy("node_a", "node_b")


ROUND4_ORACLES["graph_neighbor_jaccard"] = """
WITH pairs AS (
  SELECT least(c_nationkey, s_nationkey)    AS edge_a,
         greatest(c_nationkey, s_nationkey) AS edge_b
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
), edges AS MATERIALIZED (
  -- see graph_degree_triangles: multi-referenced edge census over the
  -- lineitem 4-way join; inlined re-evaluation (3 adj refs x 2 edges
  -- refs = 6 expansions) ran >8 min at sf0.1, materialized 0.5 s
  SELECT DISTINCT edge_a, edge_b FROM pairs
), adj AS MATERIALIZED (
  SELECT edge_a AS node, edge_b AS nbr FROM edges
  UNION ALL
  SELECT edge_b, edge_a FROM edges
), deg AS (
  SELECT node, count(*) AS degree FROM adj GROUP BY node
), shared AS (
  SELECT x.node AS node_a, y.node AS node_b, count(*) AS shared
  FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
  GROUP BY 1, 2
)
SELECT node_a, node_b, shared,
       round(shared / (da.degree + db.degree - shared), 6) AS jaccard
FROM shared
JOIN deg da ON shared.node_a = da.node
JOIN deg db ON shared.node_b = db.node
WHERE round(shared / (da.degree + db.degree - shared), 6) >= 0.5
ORDER BY node_a, node_b
"""

ROUND4_LATE_QUERIES["graph_neighbor_jaccard"] = graph_neighbor_jaccard
