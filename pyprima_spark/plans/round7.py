"""Round-7 operators (SURVEY §2 #191–196).

Families / what each adds that the existing 223 keys do not:

- curriculum_phases: curriculum-learning phase assignment — the
  training-order counterpart of data_mixture_plan (WHICH data per
  phase, where the mixture plan decides HOW MUCH per source). Built on
  the broadcast percentile-cut pattern the r5 verdict prescribed for
  rfm_segments/equidepth_histogram: no global sort anywhere.
- countmin_heavy_hitters: Count-Min sketch built from primitives with
  the exact answer riding along as its own error eval (the
  kmv_distinct_sketch pattern applied to FREQUENCY estimation — the
  sketch family now covers distinct-count, set-overlap, and frequency).
- cluster_size_histogram: size distribution of the near-dup clusters —
  the dedup-observability census (a handful of mega-clusters vs a long
  tail of pairs demand different dedup strategies).
- tokenizer_fertility: per-language chars-per-token / tokens-per-doc /
  whitespace share — the multilingual tokenizer-efficiency census
  (fertility differences are why multilingual token budgets skew).
- moving_average_decompose: classical trend + day-of-week seasonal
  decomposition of the daily revenue series, all in integer-cent
  arithmetic (residuals kept at ×7 scale so no division rounds).
- contamination_attribution: WHICH train sources leak into which eval
  sources — the actionable readout on top of decontaminate_ngrams'
  how-much census (same split gate, same 8-gram hash space).

Each key has an exact-match DuckDB oracle in ``ROUND7_ORACLES``;
determinism rules follow functions/agg.py (integer arithmetic at every
reported edge; `div`/`//` truncation on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyprima_spark.catalog import load_table
from pyprima_spark.functions import text as X
from pyprima_spark.operators.checkpointing import materialize


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


ROUND7_QUERIES: dict = {}
ROUND7_ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# curriculum_phases — percentile-cut curriculum assignment
# ---------------------------------------------------------------------------


def curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning phase assignment (SURVEY §2 #191): order the
    corpus into three training phases by a difficulty proxy — integer
    chars-per-token (longer words ≈ harder text; any per-doc score
    slots in) — and report the per-(phase, source) doc/token census a
    curriculum schedule consumes. data_mixture_plan decides how much
    of each source to sample; this decides WHEN each document enters
    training.

    Scale shape: the two tercile cut values come from one exact
    percentile_disc aggregation over per-doc integers (partial-merge
    aggregate — no sort window anywhere, the broadcast-cut pattern
    that replaced rfm_segments' global ntiles), the 1-row cut set is
    broadcast, phase assignment is a row-local CASE, and the census is
    one map-combined aggregation. Ties share a phase — the order-free
    semantics a distributed curriculum wants (ntile's positional split
    would depend on a global sort).
    """
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        F.expr(f"size({X.tokens_spark('text')})").alias("n_tok"),
        "n_chars",
    ).filter(F.col("n_tok") > 0)
    scored = scored.withColumn(
        "difficulty", F.expr("n_chars * 10000 div n_tok")
    )
    cuts = scored.agg(
        F.expr(
            "percentile_disc(0.3333333333333333) WITHIN GROUP"
            " (ORDER BY difficulty)"
        ).alias("c1"),
        F.expr(
            "percentile_disc(0.6666666666666666) WITHIN GROUP"
            " (ORDER BY difficulty)"
        ).alias("c2"),
    )
    phased = scored.crossJoin(F.broadcast(cuts)).select(
        "source",
        "n_tok",
        "difficulty",
        (
            F.lit(1)
            + (F.col("difficulty") > F.col("c1")).cast("int")
            + (F.col("difficulty") > F.col("c2")).cast("int")
        ).alias("phase"),
    )
    return (
        phased.groupBy("phase", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
            F.min("difficulty").alias("diff_min"),
            F.max("difficulty").alias("diff_max"),
        )
        .orderBy("phase", "source")
    )


ROUND7_QUERIES["curriculum_phases"] = curriculum_phases

ROUND7_ORACLES["curriculum_phases"] = f"""
WITH scored AS (
  SELECT source,
         len({X.tokens_duck('text')}) AS n_tok,
         n_chars
  FROM documents
),
nz AS (
  SELECT source, n_tok, n_chars * 10000 // n_tok AS difficulty
  FROM scored WHERE n_tok > 0
),
cuts AS (
  SELECT quantile_disc(difficulty, 0.3333333333333333) AS c1,
         quantile_disc(difficulty, 0.6666666666666666) AS c2
  FROM nz
)
SELECT 1 + CASE WHEN difficulty > c1 THEN 1 ELSE 0 END
         + CASE WHEN difficulty > c2 THEN 1 ELSE 0 END AS phase,
       source,
       count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tokens,
       min(difficulty) AS diff_min,
       max(difficulty) AS diff_max
FROM nz CROSS JOIN cuts
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# countmin_heavy_hitters — Count-Min frequency sketch with riding eval
# ---------------------------------------------------------------------------

_CM_D = 4  # hash rows
_CM_W = 512  # counters per row
_CM_TOPK = 10


def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation (SURVEY §2 #192), built
    from primitives with the exact answer riding along as its own
    error eval (kmv_distinct_sketch's design applied to the frequency
    question): a d×w counter matrix over user event counts, point
    queries for the exact top-k users, and the per-user overcount —
    Count-Min never undercounts, so ``cm_estimate - exact_n >= 0`` is
    a structural invariant the oracle checks for free.

    Scale shape: the sketch build is ONE map-side-combinable
    aggregation over a d-way explode (output bounded at d·w = 2048
    rows regardless of input scale — that boundedness is the entire
    point of a sketch); the top-k query side is a row_number ≤ k over
    the per-user census (WindowGroupLimit pushdown — map-local top-k),
    and the point queries join the k·d probe rows to the counter table
    by (row, bucket) — the counter table rides the BROADCAST side.
    Every count is an exact integer; the sketch hashes are the house
    60-bit hash, so the oracle reproduces the matrix bit-for-bit.
    """
    ev = _t(spark, sf_dir, "events")
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(_CM_D)])
    ).alias("cm_i")
    keyed = ev.select(F.col("user_id"), rows).select(
        "cm_i",
        (
            F.expr(
                X.hash64_spark(
                    "cast(user_id as string) || ':cm' || cast(cm_i as string)"
                )
            )
            % _CM_W
        ).alias("bucket"),
    )
    counters = keyed.groupBy("cm_i", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )

    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    w = Window.orderBy(F.desc("exact_n"), F.asc("user_id"))
    topk = (
        per_user.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _CM_TOPK)
    )
    probes = topk.select(
        "rank",
        "user_id",
        "exact_n",
        F.explode(F.array(*[F.lit(i) for i in range(_CM_D)])).alias("cm_i"),
    ).select(
        "rank",
        "user_id",
        "exact_n",
        "cm_i",
        (
            F.expr(
                X.hash64_spark(
                    "cast(user_id as string) || ':cm' || cast(cm_i as string)"
                )
            )
            % _CM_W
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(counters), ["cm_i", "bucket"])
        .groupBy("rank", "user_id", "exact_n")
        .agg(F.min("c").alias("cm_estimate"))
        .select(
            "rank",
            "user_id",
            "exact_n",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy("rank")
    )


ROUND7_QUERIES["countmin_heavy_hitters"] = countmin_heavy_hitters


def _cm_oracle() -> str:
    hash_expr = X.hash64_duck(
        "cast(user_id as VARCHAR) || ':cm' || cast(cm_i as VARCHAR)"
    )
    return f"""
WITH keyed AS (
  SELECT cm_i, {hash_expr} % {_CM_W} AS bucket
  FROM events, unnest([{', '.join(str(i) for i in range(_CM_D))}]) r(cm_i)
),
counters AS (
  SELECT cm_i, bucket, count(*) AS c FROM keyed GROUP BY 1, 2
),
per_user AS (
  SELECT user_id, count(*) AS exact_n FROM events GROUP BY 1
),
topk AS (
  SELECT user_id, exact_n,
         row_number() OVER (ORDER BY exact_n DESC, user_id ASC) AS rank
  FROM per_user QUALIFY rank <= {_CM_TOPK}
),
probes AS (
  SELECT rank, user_id, exact_n, cm_i,
         {hash_expr} % {_CM_W} AS bucket
  FROM topk, unnest([{', '.join(str(i) for i in range(_CM_D))}]) r(cm_i)
)
SELECT rank, user_id, exact_n,
       CAST(min(c) AS BIGINT) AS cm_estimate,
       CAST(min(c) - exact_n AS BIGINT) AS overcount
FROM probes JOIN counters USING (cm_i, bucket)
GROUP BY rank, user_id, exact_n
ORDER BY rank
"""


ROUND7_ORACLES["countmin_heavy_hitters"] = _cm_oracle()


# ---------------------------------------------------------------------------
# cluster_size_histogram — dedup-cluster observability census
# ---------------------------------------------------------------------------


def cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size distribution (SURVEY §2 #193): how many
    clusters of size 1, 2, 3… does the dedup fingerprint induce, and
    how many documents sit in each size class — the observability
    census that tells a dedup operator whether it faces a long tail of
    pairs (cheap) or boilerplate mega-clusters (needs the df-cutoff
    path). Uses golden_record's fingerprint (md5 of the first-40-char
    normalized prefix) so the histogram describes the same clustering
    the consolidation operators act on.

    Scale shape: two map-side-combinable aggregations — per
    fingerprint, then per size; output bounded by the largest cluster
    size. No joins, no windows.
    """
    docs = _t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )
    clusters = (
        docs.select(F.md5(F.substring(norm, 1, 40)).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("size"))
    )
    return (
        clusters.groupBy("size")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("size").alias("n_docs"),
        )
        .orderBy("size")
    )


ROUND7_QUERIES["cluster_size_histogram"] = cluster_size_histogram

ROUND7_ORACLES["cluster_size_histogram"] = """
WITH clusters AS (
  SELECT md5(substr(trim(regexp_replace(regexp_replace(lower(text),
           '[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g')), 1, 40)) AS fp,
         count(*) AS size
  FROM documents GROUP BY 1
)
SELECT size, count(*) AS n_clusters, CAST(sum(size) AS BIGINT) AS n_docs
FROM clusters GROUP BY size ORDER BY size
"""


# ---------------------------------------------------------------------------
# tokenizer_fertility — per-language tokenizer-efficiency census
# ---------------------------------------------------------------------------


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility census per language (SURVEY §2 #194):
    chars-per-token (×100), tokens-per-doc (×100), and whitespace
    share in basis points — the efficiency profile that explains why
    equal-byte multilingual corpora yield unequal token budgets
    (fertility varies ~2–4× across languages under one tokenizer) and
    feeds data_mixture_plan's token censuses.

    Scale shape: fully row-local per-doc integers (token count via the
    house tokenizer expression, whitespace count by length
    difference), then ONE map-side-combinable per-lang aggregation;
    every reported ratio is integer-divided once at the output edge.
    """
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "lang",
        F.expr(f"size({X.tokens_spark('text')})").alias("n_tok"),
        F.length("text").alias("n_ch"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[ \\t\\n\\r\\f]", ""))
        ).alias("n_ws"),
    ).filter(F.col("n_tok") > 0)
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tokens"),
            F.sum("n_ch").alias("chars"),
            F.sum("n_ws").alias("ws_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "tokens",
            F.expr("cast(chars * 100 div tokens as int)").alias(
                "chars_per_tok_x100"
            ),
            F.expr("cast(tokens * 100 div n_docs as int)").alias(
                "toks_per_doc_x100"
            ),
            F.expr("cast(ws_chars * 10000 div chars as int)").alias(
                "ws_share_bp"
            ),
        )
        .orderBy("lang")
    )


ROUND7_QUERIES["tokenizer_fertility"] = tokenizer_fertility

ROUND7_ORACLES["tokenizer_fertility"] = f"""
WITH d AS (
  SELECT lang,
         len({X.tokens_duck('text')}) AS n_tok,
         length(text) AS n_ch,
         length(text) - length(regexp_replace(text, '[ \\t\\n\\r\\f]', '', 'g')) AS n_ws
  FROM documents
),
agg AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS tokens,
         CAST(sum(n_ch) AS BIGINT) AS chars,
         CAST(sum(n_ws) AS BIGINT) AS ws_chars
  FROM d WHERE n_tok > 0 GROUP BY lang
)
SELECT lang, n_docs, tokens,
       CAST(chars * 100 // tokens AS INT) AS chars_per_tok_x100,
       CAST(tokens * 100 // n_docs AS INT) AS toks_per_doc_x100,
       CAST(ws_chars * 10000 // chars AS INT) AS ws_share_bp
FROM agg ORDER BY lang
"""


# ---------------------------------------------------------------------------
# moving_average_decompose — trend + day-of-week seasonal split
# ---------------------------------------------------------------------------


def moving_average_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical time-series decomposition of the daily value series
    per event_type (SURVEY §2 #195): 7-day centered moving-average
    trend, then the day-of-week seasonal component as the mean
    residual — the moving-average decomposition every capacity/
    forecasting pipeline runs before modeling (seasonal_profile
    reports raw day-of-week means; this separates trend from season so
    the seasonal figure is level-free).

    Integer-exact throughout: daily totals in CENTS (bigint), the
    trend is the 7-day window SUM (kept at ×7 scale — dividing by 7
    would round), residuals are ``7·day − window_sum`` (exact), and
    the seasonal mean divides ONCE at the output edge. Windows are
    partitioned by event_type — the series count bounds the sort, and
    each series' window is a rows-frame over its own partition (no
    global sort; the gaps don't need filling because both engines
    window the same existing-day rows).
    """
    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.expr("cast(round(value * 100) as bigint)")).alias(
                "cents"
            )
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    trended = daily.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(w).alias("win_sum"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    ).filter(F.col("win_n") == 7)
    resid = trended.select(
        "event_type",
        F.dayofweek("day").alias("dow"),
        (F.col("cents") * 7 - F.col("win_sum")).alias("resid_x7"),
    )
    return (
        resid.groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("resid_x7").alias("resid_x7_sum"),
        )
        .select(
            "event_type",
            "dow",
            "n_days",
            F.expr(
                "cast(resid_x7_sum div (7 * n_days) as bigint)"
            ).alias("seasonal_cents"),
        )
        .orderBy("event_type", "dow")
    )


ROUND7_QUERIES["moving_average_decompose"] = moving_average_decompose

ROUND7_ORACLES["moving_average_decompose"] = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
trended AS (
  SELECT event_type, day, cents,
         sum(cents) OVER w AS win_sum,
         count(*) OVER w AS win_n
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
resid AS (
  SELECT event_type, dayofweek(day) + 1 AS dow,
         cents * 7 - win_sum AS resid_x7
  FROM trended WHERE win_n = 7
)
SELECT event_type, dow, count(*) AS n_days,
       CAST(sum(resid_x7) // (7 * count(*)) AS BIGINT) AS seasonal_cents
FROM resid GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# contamination_attribution — which train sources leak into which evals
# ---------------------------------------------------------------------------

_CA_K = 8  # n-gram width, matches decontaminate_ngrams


def contamination_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination ATTRIBUTION (SURVEY §2 #196): for each
    (train source → eval source) pair, how many distinct 8-gram hashes
    leak and how many eval docs are touched — the actionable readout
    on top of decontaminate_ngrams' per-source totals (same split
    gate, same hash space): it names WHICH ingest pipeline to fix.

    Scale shape: grams ride as 60-bit hashes; the train side reduces
    to DISTINCT (hash, source) — bounded by grams×|sources|, same
    order as the train set itself — and the leak join is a shuffle
    equi-join on the uniform hash key (never broadcast; train is
    corpus-sized at 100 TB). The census counts distinct grams and
    distinct docs per source pair, so output is |sources|² at most.
    """
    docs = _t(spark, sf_dir, "documents")
    h = F.expr(X.hash64_spark("cast(doc_id as string) || ':split'")) % 100
    grams = materialize(
        docs.select(
            "doc_id",
            "source",
            (h < 80).alias("is_train"),
            F.expr(X.tokens_spark("text")).alias("toks"),
        )
        .filter(F.size("toks") >= _CA_K)
        .select(
            "doc_id",
            "source",
            "is_train",
            F.explode(F.expr(X.shingles_spark("toks", _CA_K))).alias("g"),
        )
        .withColumn("gh", F.expr(X.hash64_spark("g")))
        .drop("g")
    )
    train = grams.filter("is_train").select(
        F.col("source").alias("train_source"), "gh"
    ).distinct()
    eval_g = grams.filter(~F.col("is_train")).select(
        F.col("source").alias("eval_source"), "doc_id", "gh"
    ).distinct()
    hits = eval_g.join(train, "gh")
    return (
        hits.groupBy("train_source", "eval_source")
        .agg(
            F.countDistinct("gh").alias("leaked_grams"),
            F.countDistinct("doc_id").alias("eval_docs_touched"),
        )
        .orderBy("train_source", "eval_source")
    )


ROUND7_QUERIES["contamination_attribution"] = contamination_attribution

ROUND7_ORACLES["contamination_attribution"] = f"""
WITH tok AS (
  SELECT doc_id, source,
         {X.hash64_duck("cast(doc_id as VARCHAR) || ':split'")} % 100 < 80
           AS is_train,
         {X.tokens_duck('text')} AS toks
  FROM documents
),
grams AS (
  SELECT doc_id, source, is_train,
         {X.hash64_duck('g')} AS gh
  FROM (
    SELECT doc_id, source, is_train,
           unnest({X.shingles_duck('toks', _CA_K)}) AS g
    FROM tok WHERE len(toks) >= {_CA_K}
  )
),
train AS (
  SELECT DISTINCT source AS train_source, gh FROM grams WHERE is_train
),
eval_g AS (
  SELECT DISTINCT source AS eval_source, doc_id, gh
  FROM grams WHERE NOT is_train
)
SELECT train_source, eval_source,
       count(DISTINCT gh) AS leaked_grams,
       count(DISTINCT doc_id) AS eval_docs_touched
FROM eval_g JOIN train USING (gh)
GROUP BY 1, 2 ORDER BY 1, 2
"""
