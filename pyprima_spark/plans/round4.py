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
    return bundle.orderBy("sheet", "site", "item", "t", "attr")


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
ORDER BY sheet, site, item, t, attr
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

    def cols(name: str, c: str) -> list:
        exact = F.countDistinct(c)
        approx = F.approx_count_distinct(c, 0.05)
        return [
            exact.alias(f"d_{name}"),
            (
                F.abs(approx.cast("double") - exact.cast("double"))
                <= 0.10 * exact.cast("double")
            ).alias(f"ok_{name}"),
        ]
    wide = orders.agg(
        *cols("status", "o_orderstatus"),
        *cols("prio", "o_orderpriority"),
        *cols("cust", "o_custkey"),
        *cols("price", "o_totalprice"),
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

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(tokens_spark("text")).alias("toks")
    )
    lens = docs.select("doc_id", F.size("toks").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_dl")
    )
    qterms = spark.createDataFrame(
        [(t,) for t in _BM25_TERMS], "term string"
    )
    tf = (
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
