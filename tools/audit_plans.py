"""Explain-audit: per headline query, verify the physical plan has the
shape SURVEY §6 promises — PushedFilters on filtered scans, minimal
ReadSchema, broadcasts only on bounded sides, no surprise exchanges.

Usage: python tools/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyprima_spark.plans.queries import QUERIES
from pyprima_spark.session import build_session


# --- Plan-shape regression gate (VERDICT r5 item 5) -----------------------
#
# The two unpartitioned-ntile findings that round were invisible to both
# the correctness gate and the sf0.1 bench — only a plan read caught them.
# This automates the read: walk every catalog key's physical plan and fail
# on shapes that are fine at test scale but melt at 100 TB.
#
# Keys allowed an UNPARTITIONED window: each ranks over an input that is
# an AGGREGATE bounded by a documented dimension (vocab size, part count,
# key census, …) — the accepted WindowGroupLimit/top-k class from the r5
# verdict. Anything else with a global window fails the gate.
GLOBAL_WINDOW_ALLOWED = {
    # bounded by |vocab| (distinct terms), documented in docstrings
    "vocab_coverage",
    "oov_rate_sweep",
    "bpe_token_count",
    "tfidf_top_terms",
    "heavy_hitters",
    "cooccurrence_pmi",
    "champion_postings",
    # bounded by |parts| / |keys| / histogram-bin census
    "key_gini",
    "pareto_revenue",
    "abc_xyz_inventory",  # cumulative-share window over the part census
    "knapsack_density_bound",  # density prefix over the part census
    "maxmin_fair_allocation",  # water-level scan over the brand census
    # sorted-access ranks over the part census (materialize() hides the
    # window from the plan walk, so list it here for the record)
    "fagin_ta_depth",
    # hash-rank candidate selection over the |days| census
    "ransac_consensus_fit",
    # divisor-quotient ranks over the 5x40 literal lattice
    "seat_apportionment",
    # prefix identity over the quantized value census
    "energy_distance_test",
    # j-index over the 3-row year-column census
    "page_trend_test",
    # criterion ranks over the brand census
    "voting_methods_compare",
    "key_skew_profile",
    "price_histogram",
    "equidepth_histogram",
    "join_cardinality_estimate",
    "market_basket_pairs",
    "copurchase_similarity",
    # bounded by cluster/sample/eval censuses
    "cluster_representatives",
    "ann_recall_eval",
    "lsh_precision_eval",
    "approx_quantile_bands",
    "weighted_median",
    "cusum_changepoint",
    "ks_drift",
    "drift_tv_distance",
    "psi_drift",
    "equidepth_histogram",
    "skyline_pareto",
    "capped_distribution",
    "quantile_normalize",
    "table_profile",
    "table_profile_approx",
    "grouped_regression",
    "seasonal_profile",
    "compaction_plan",
    "data_mixture_plan",
    "kmv_source_overlap",
    "kmv_distinct_sketch",
    "sequence_packing",
    "ordered_string_export",
    "deterministic_shuffle",
    "graph_modularity",
    "interval_union_coverage",
    # cumulative burn over the DAY census (time-bounded: 24 rows/day
    # of hourly p95s -> ~30 input rows; the fact table never rides it)
    "slo_burn_rate",
    # cumulative capture over the 10-row DECILE census (bucket count is
    # a constant of the operator; assignment itself is map-side cuts)
    "decile_lift",
    # same 10-row decile census, plus the treated/control split
    "qini_uplift",
    # windows over the <=|sources| rank census (bounded: 20 sources)
    "coverage_decay_curve",
    "peak_concurrency",
    # bounded by |event_types|^3 path census (docstring)
    "session_paths",
    # across-stripe cumulative min over the ~20-row domain-bounded price-
    # stripe census; the fact-sized prefix scan is the PARTITIONED
    # within-stripe window (docstring)
    "skyline_2d",
    # totals/mean/variance windows over the |ship-years| strata census
    "jackknife_variance",
    # positional lag windows over the DAY census (|days| rows,
    # time-bounded; the fact table collapses to it map-side first)
    "acf_lags",
}

# BroadcastNestedLoopJoin build sides that are bounded by a PUSHED LITERAL
# id filter (query set = first-N ids; PushedFilters [LessThan(doc_id, N)])
# — real boundedness the tree walk can't prove without parsing filter
# literals. One comment per key:
BNLJ_BOUNDED_ALLOWED = {
    "ann_topk",  # query side = doc_id < ANN_N_QUERIES pushed scan filter
    "ann_ivf",  # same pushed query-set filter
    "ann_lsh",  # same pushed query-set filter
    "ann_recall_eval",  # evaluates the same pushed query set
    "ann_pq",  # same pushed query-set filter
    "hard_negative_mining",  # anchor set = pushed literal id filter
    "embedding_dedup",  # verify join: broadcast side is the candidate-pair table (df-cutoff bounded)
}


def _walk(node):
    """Yield every node of a physical plan tree (descending through AQE)."""
    name = node.nodeName()
    if name == "AdaptiveSparkPlan":
        yield from _walk(node.initialPlan())
        return
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk(children.apply(i))


def _subtree_is_bounded(node) -> bool:
    """True if a broadcast build side is visibly bounded: contains an
    aggregate (1-row / census outputs), a LocalTableScan (literal dim),
    or a scan of a bounded dim table."""
    for n in _walk(node):
        nm = n.nodeName()
        if "Aggregate" in nm or nm in ("LocalTableScan", "Range"):
            return True
        # createDataFrame literal dims (fold cuts, query-term sets) plan
        # as Scan ExistingRDD — only literal dims use that path here.
        if "ExistingRDD" in nm:
            return True
        if nm.startswith("Scan") and any(
            d in n.toString().split("\n")[0]
            for d in ("region", "nation", "supplier", "part.")
        ):
            return True
        if nm in ("ReusedExchange", "ReusedSubquery"):
            return True
    return False


def dataframe_violations(
    df,
    allow_global_window: bool = False,
    allow_bnlj: bool = False,
) -> list[str]:
    """Walk ONE DataFrame's physical plan and return scale-breaking
    shapes: CartesianProduct, unpartitioned Window without a top-k
    pushdown below it, BroadcastNestedLoopJoin with an unbounded build
    side. The allow flags mirror the per-key allowlists."""
    problems: list[str] = []
    plan = df._jdf.queryExecution().executedPlan()
    for node in _walk(plan):
        nm = node.nodeName()
        if nm == "CartesianProduct":
            problems.append("CartesianProduct")
        elif nm == "Window" and not allow_global_window:
            if node.partitionSpec().isEmpty() and not any(
                d.nodeName() in ("WindowGroupLimit", "TakeOrderedAndProject")
                for d in _walk(node)
            ):
                # WindowGroupLimit / TakeOrderedAndProject below the
                # window = Spark's distributed top-k pushdown: each
                # map task keeps k rows, the single partition sees
                # k x n_partitions rows — the accepted global-rank
                # shape. Without one, the full input sorts on ONE
                # partition: the equidepth/rfm failure class.
                problems.append(f"unpartitioned {nm}")
        elif nm == "BroadcastNestedLoopJoin" and not allow_bnlj:
            side = str(node.buildSide())
            build = node.right() if side.endswith("Right") else node.left()
            if not _subtree_is_bounded(build):
                problems.append(
                    f"BroadcastNestedLoopJoin with unbounded {side} "
                    "build side"
                )
    return problems


def shape_violations(spark, sf_dir: str, keys=None) -> list[str]:
    """Return ['key: problem', ...] for every catalog key whose plan
    has a scale-breaking shape (see dataframe_violations), honoring
    the documented bounded-input allowlists."""
    problems: list[str] = []
    for name in sorted(keys or QUERIES):
        if name.startswith("streaming"):
            continue
        df = QUERIES[name](spark, sf_dir)
        for p in dataframe_violations(
            df,
            allow_global_window=name in GLOBAL_WINDOW_ALLOWED,
            allow_bnlj=name in BNLJ_BOUNDED_ALLOWED,
        ):
            problems.append(f"{name}: {p}")
    return sorted(set(problems))


def audit(sf_dir: str) -> None:
    spark = build_session("plan_audit")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, fn in sorted(QUERIES.items()):
        if name.startswith("streaming"):
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(mode)
        except Exception as e:  # noqa: BLE001
            print(f"{name:30s} ERR {str(e)[:80]}")
            continue
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        exch = plan.count("Exchange")
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        schemas = sorted(
            {s[:70] for s in re.findall(r"ReadSchema: struct<([^>]*)>", plan)}
        )
        print(
            f"{name:30s} pushed={pushed} exch={exch} bhj={bhj} smj={smj} "
            f"reads={schemas}"
        )
    spark.stop()


if __name__ == "__main__":
    audit(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
