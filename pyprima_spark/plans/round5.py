"""Round-5 operators: CDC snapshot diff, stratified sampling, bounded
as-of joins, and further training-data-pipeline coverage.

Each query has an exact-match DuckDB oracle in ``ROUND5_ORACLES``.
Determinism rules follow functions/agg.py: integer arithmetic wherever
possible, DECIMAL sums for doubles, single correctly-rounded double
divisions, rounding only at the output edge.

Self-contained on purpose (imports catalog, not plans.queries) so
plans.oracles can import this module without a circular chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyprima_spark.catalog import load_table
from pyprima_spark.functions.agg import DEC
from pyprima_spark.functions import text as X


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


ROUND5_QUERIES: dict = {}
ROUND5_ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# snapshot_diff — CDC-style keyed diff between two table snapshots
# ---------------------------------------------------------------------------

def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed diff of two table snapshots — the change-data-capture
    census every incremental pipeline runs before a merge (the
    reference re-derives whole intermediate files per run,
    e.g. generate_intermediate_files in initialization.py; a diff
    census is how a distributed engine decides what actually changed).

    Snapshot A = orders booked before 1997-07-01; snapshot B = orders
    before 1998-01-01 with a simulated price correction on keys
    divisible by 97.  One full-outer sort-merge join on the key
    classifies every row as added / removed / changed / unchanged and
    totals the price drift per class.

    Scale shape: a single shuffle of both snapshots on the primary key
    (Catalyst picks SMJ; with bucketed snapshot tables even that
    exchange disappears).  Column values are compared directly here;
    a wide production table would compare an md5 of the non-key columns
    computed in the scan projection — same plan, one column.
    """
    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderdate") < F.lit("1997-07-01").cast("date")).select(
        "o_orderkey",
        F.col("o_totalprice").alias("price_a"),
        F.col("o_orderstatus").alias("status_a"),
    )
    new = orders.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("date")).select(
        "o_orderkey",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 97 == 0, F.lit(10.0)).otherwise(F.lit(0.0))
        ).alias("price_b"),
        F.col("o_orderstatus").alias("status_b"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("price_a").isNull(), F.lit("added"))
        .when(F.col("price_b").isNull(), F.lit("removed"))
        .when(
            (F.col("price_a") != F.col("price_b"))
            | (F.col("status_a") != F.col("status_b")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    delta = F.coalesce(F.col("price_b"), F.lit(0.0)) - F.coalesce(
        F.col("price_a"), F.lit(0.0)
    )
    return (
        j.select(change.alias("change_type"), delta.alias("delta"))
        .groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(F.col("delta").cast(DEC)), 2)
            .cast("double")
            .alias("price_delta"),
        )
        .orderBy("change_type")
    )


ROUND5_QUERIES["snapshot_diff"] = snapshot_diff

ROUND5_ORACLES["snapshot_diff"] = """
WITH old AS (
  SELECT o_orderkey, o_totalprice AS price_a, o_orderstatus AS status_a
  FROM orders WHERE o_orderdate < DATE '1997-07-01'
),
new AS (
  SELECT o_orderkey,
         o_totalprice + CASE WHEN o_orderkey % 97 = 0 THEN 10.0 ELSE 0.0 END
           AS price_b,
         o_orderstatus AS status_b
  FROM orders WHERE o_orderdate < DATE '1998-01-01'
)
SELECT CASE WHEN price_a IS NULL THEN 'added'
            WHEN price_b IS NULL THEN 'removed'
            WHEN price_a <> price_b OR status_a <> status_b THEN 'changed'
            ELSE 'unchanged' END AS change_type,
       count(*) AS n_rows,
       round(sum(CAST(coalesce(price_b, 0.0) - coalesce(price_a, 0.0)
                      AS DECIMAL(27,6))), 2)::DOUBLE AS price_delta
FROM old FULL OUTER JOIN new USING (o_orderkey)
GROUP BY 1
ORDER BY change_type
"""


# ---------------------------------------------------------------------------
# stratified_sample — fixed-size-per-stratum deterministic sampling
# ---------------------------------------------------------------------------

_STRAT_TARGET = 40  # docs per source stratum


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional-rate stratified sampling census: target a fixed
    ~40 docs per ``source`` stratum, derive each stratum's keep-rate in
    basis points from its population, and gate rows on an id-hash —
    the reproducible equivalent of ``df.sampleBy`` (whose rates a user
    must precompute the same way, and whose RNG is partition-order
    dependent).

    Two passes over the corpus: a dim-sized count aggregation
    (broadcast back — never a shuffle of the fact table) and the gated
    scan itself.  At 100 TB the counts come from table statistics or a
    first pass that is a map-side partial count; the sample gate is a
    pure scan predicate with no shuffle at all.
    """
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    counts = counts.withColumn(
        "rate_bp",
        F.least(
            F.lit(10000),
            F.expr(f"cast(({_STRAT_TARGET} * 10000 + n_total - 1) div n_total as int)"),
        ),
    )
    gate = F.expr(X.hash64_spark("cast(doc_id as string)")) % 10000
    sampled = (
        docs.join(F.broadcast(counts), "source")
        .filter(gate < F.col("rate_bp"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        counts.join(sampled, "source", "left")
        .select(
            "source",
            "n_total",
            "rate_bp",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
        .orderBy("source")
    )


ROUND5_QUERIES["stratified_sample"] = stratified_sample

ROUND5_ORACLES["stratified_sample"] = f"""
WITH counts AS (
  SELECT source, count(*) AS n_total,
         least(10000, ({_STRAT_TARGET} * 10000 + count(*) - 1) // count(*))
           AS rate_bp
  FROM documents GROUP BY source
),
sampled AS (
  SELECT source, count(*) AS n_sampled
  FROM documents JOIN counts USING (source)
  WHERE {X.hash64_duck("cast(doc_id as varchar)")} % 10000 < rate_bp
  GROUP BY source
)
SELECT source, n_total, CAST(rate_bp AS INT) AS rate_bp,
       coalesce(n_sampled, 0) AS n_sampled
FROM counts LEFT JOIN sampled USING (source)
ORDER BY source
"""


# ---------------------------------------------------------------------------
# asof_tolerance_join — bounded-staleness as-of join, left semantics
# ---------------------------------------------------------------------------

_ASOF_TOL_US = 1_800_000_000  # 30 minutes


def asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound (pandas ``merge_asof``
    ``tolerance=`` semantics): each purchase is annotated with the
    user's most recent prior click ONLY if that click is at most 30
    minutes old; purchases with no fresh-enough click are kept with
    null annotations (left semantics).

    Same single-shuffle union+window plan as operators/asof.py — the
    tolerance and the left-retention are post-masks on the carried
    columns, so bounding staleness costs nothing over the plain as-of.
    """
    from pyprima_spark.operators.asof import asof_join as _asof

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    j = _asof(
        purchases,
        clicks,
        "user_id",
        value_cols=["value"],
        how="left",
        tolerance_us=_ASOF_TOL_US,
    )
    matched = F.col("ts_asof").isNotNull()
    return j.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round("value_asof", 2).alias("click_value"),
        F.round(
            (F.unix_micros("ts") - F.unix_micros("ts_asof")) / 1_000_000.0, 3
        ).alias("lag_sec"),
        matched.alias("matched"),
    ).orderBy("event_id")


ROUND5_QUERIES["asof_tolerance_join"] = asof_tolerance_join

ROUND5_ORACLES["asof_tolerance_join"] = f"""
WITH p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts, value FROM (
    SELECT user_id, ts, value,
           row_number() OVER (PARTITION BY user_id, ts
                              ORDER BY value DESC) AS rn
    FROM events WHERE event_type = 'click'
  ) WHERE rn = 1
)
SELECT event_id, user_id, round(value, 2) AS value,
       CASE WHEN ok THEN round(cvalue, 2) END AS click_value,
       CASE WHEN ok
            THEN round((epoch_us(ts) - epoch_us(cts)) / 1000000.0, 3)
       END AS lag_sec,
       ok AS matched
FROM (
  SELECT p.*, c.ts AS cts, c.value AS cvalue,
         (c.ts IS NOT NULL
          AND epoch_us(p.ts) - epoch_us(c.ts) <= {_ASOF_TOL_US}) AS ok
  FROM p ASOF LEFT JOIN c
    ON p.user_id = c.user_id AND p.ts >= c.ts
)
ORDER BY event_id
"""
