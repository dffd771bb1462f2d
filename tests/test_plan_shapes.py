"""Plan-shape regression gate (VERDICT r5 item 5).

The round-5 unpartitioned-ntile findings (equidepth_histogram,
rfm_segments) were invisible to the correctness gate AND the sf0.1
bench — both ops were sub-second at test scale while planning a
single-partition sort of the whole input. Only a plan read catches the
class, so the read is automated here: every catalog key's physical plan
is walked and the scale-breaking shapes fail the suite.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.audit_plans import shape_violations


def test_no_scale_breaking_plan_shapes(spark, sf_dir):
    problems = shape_violations(spark, sf_dir)
    assert not problems, "\n".join(problems)


def test_global_window_allowlist_proves_bounds(spark, sf_dir):
    """VERDICT r6 item 3 + r7 item 5: the GLOBAL_WINDOW allowlist must
    prove itself — every entry's measured rows-into-the-window stays
    under its documented census bound (materialize() is a no-op during
    the measurement, so checkpoint-hidden windows are measured instead
    of trusted), and an entry whose body no longer plans a global
    window is flagged stale rather than kept by trust."""
    from tools.audit_plans import window_bound_violations

    problems = window_bound_violations(spark, sf_dir)
    assert not problems, "\n".join(problems)


def test_bnlj_allowlist_proves_bounds(spark, sf_dir):
    """Round-8 extension of the self-proving-allowlist rule to the last
    unmeasured exemption list: every BNLJ_BUILD_BOUNDS entry's measured
    broadcast-side row count stays under its documented query-set
    bound, and an entry whose body no longer plans a
    BroadcastNestedLoopJoin is flagged stale rather than kept by
    trust (the first measurement deleted ann_lsh / ann_pq /
    embedding_dedup exactly this way)."""
    from tools.audit_plans import bnlj_bound_violations

    problems = bnlj_bound_violations(spark, sf_dir)
    assert not problems, "\n".join(problems)


def test_bnlj_bound_gate_flags_planted_violations(spark, sf_dir, monkeypatch):
    """Negative controls for bnlj_bound_violations itself: a bound set
    below the measured count must flag, and a stale entry (no BNLJ in
    the plan) must flag."""
    import tools.audit_plans as ap

    monkeypatch.setitem(ap.BNLJ_BUILD_BOUNDS, "ann_topk", 1)
    problems = ap.bnlj_bound_violations(spark, sf_dir, keys=["ann_topk"])
    assert problems and "documented bound 1" in problems[0]
    monkeypatch.undo()

    monkeypatch.setitem(ap.BNLJ_BUILD_BOUNDS, "q1_pricing_summary", 10)
    problems = ap.bnlj_bound_violations(
        spark, sf_dir, keys=["q1_pricing_summary"]
    )
    assert problems and "stale entry" in problems[0]


def test_bnlj_probe_measures_planted_join(spark, sf_dir):
    """Negative control for the probe itself: it must count the build
    side of a planted conditionless broadcast join, and report nothing
    for a plan with no BNLJ."""
    from pyspark.sql import functions as F

    from pyprima_spark.catalog import load_table
    from tools.audit_plans import bnlj_build_input_counts

    orders = load_table(spark, sf_dir, "orders")
    region = load_table(spark, sf_dir, "region")
    planted = orders.join(F.broadcast(region.limit(3)))
    assert bnlj_build_input_counts(spark, planted) == [3]

    no_bnlj = orders.groupBy("o_orderpriority").count()
    assert bnlj_build_input_counts(spark, no_bnlj) == []


def test_window_allowlist_registry_hygiene():
    """The bounds registry must stay consistent with the catalog:
    every allowlisted key exists and every bound is a positive int."""
    from pyprima_spark.plans.queries import QUERIES
    from tools.audit_plans import (
        GLOBAL_WINDOW_ALLOWED,
        GLOBAL_WINDOW_BOUNDS,
    )

    unknown = set(GLOBAL_WINDOW_BOUNDS) - set(QUERIES)
    assert not unknown, sorted(unknown)
    assert GLOBAL_WINDOW_ALLOWED == set(GLOBAL_WINDOW_BOUNDS)
    bad = {k: v for k, v in GLOBAL_WINDOW_BOUNDS.items()
           if not isinstance(v, int) or v <= 0}
    assert not bad, bad


def test_bnlj_allowlist_registry_hygiene():
    """Same hygiene for the BNLJ bounds registry: every allowlisted key
    exists, the exemption set derives from the bounds table, and every
    bound is a positive int."""
    from pyprima_spark.plans.queries import QUERIES
    from tools.audit_plans import BNLJ_BOUNDED_ALLOWED, BNLJ_BUILD_BOUNDS

    unknown = set(BNLJ_BUILD_BOUNDS) - set(QUERIES)
    assert not unknown, sorted(unknown)
    assert BNLJ_BOUNDED_ALLOWED == set(BNLJ_BUILD_BOUNDS)
    bad = {k: v for k, v in BNLJ_BUILD_BOUNDS.items()
           if not isinstance(v, int) or v <= 0}
    assert not bad, bad


def test_window_bound_gate_flags_planted_violations(spark, sf_dir, monkeypatch):
    """Negative controls for window_bound_violations itself: a bound
    set below the measured count must flag, and a stale entry (no
    global window, not registered hidden) must flag."""
    import tools.audit_plans as ap

    # (a) plant an impossible bound on a key with a measured window
    monkeypatch.setitem(ap.GLOBAL_WINDOW_BOUNDS, "decile_lift", 1)
    problems = ap.window_bound_violations(spark, sf_dir, keys=["decile_lift"])
    assert problems and "documented bound 1" in problems[0]
    monkeypatch.undo()

    # (b) plant a stale allowlist row: q1 has no global window
    monkeypatch.setitem(ap.GLOBAL_WINDOW_BOUNDS, "q1_pricing_summary", 10)
    problems = ap.window_bound_violations(
        spark, sf_dir, keys=["q1_pricing_summary"]
    )
    assert problems and "stale entry" in problems[0]


def test_window_bound_probe_measures_and_flags(spark, sf_dir):
    """Negative control for the probe itself: it must measure the
    rows entering a planted global window, and a fact-sized window
    input must exceed a census-sized bound."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyprima_spark.catalog import load_table
    from tools.audit_plans import global_window_input_counts

    orders = load_table(spark, sf_dir, "orders")
    fact_window = orders.select(
        F.ntile(10).over(Window.orderBy("o_totalprice")).alias("b")
    )
    counts = global_window_input_counts(spark, fact_window)
    assert counts == [orders.count()]  # fact-sized: would fail any census bound

    census_window = (
        orders.groupBy("o_orderpriority")
        .count()
        .select(F.row_number().over(Window.orderBy("o_orderpriority")).alias("r"))
    )
    assert global_window_input_counts(spark, census_window) == [5]


def test_gate_catches_planted_bad_shapes(spark, sf_dir):
    """Negative control: the gate must actually FIRE on the shapes it
    claims to catch — a planted unpartitioned ntile (the round-5
    finding class), a cartesian product, and a genuinely-bounded
    top-k global window that must PASS."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pyprima_spark.catalog import load_table
    from tools.audit_plans import dataframe_violations

    orders = load_table(spark, sf_dir, "orders")

    bad_window = orders.select(
        F.ntile(10).over(Window.orderBy("o_totalprice")).alias("b")
    )
    assert any(
        "unpartitioned Window" in p for p in dataframe_violations(bad_window)
    )

    nation = load_table(spark, sf_dir, "nation")
    # a conditionless join against a DIM is legitimately bounded
    assert dataframe_violations(orders.join(nation)) == []
    # ...but against a FACT table it must flag (cartesian or
    # unbounded-BNLJ, whichever the planner picks at this size)
    events = load_table(spark, sf_dir, "events")
    cart = orders.join(events.select("event_id"))
    assert any(
        "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p
        for p in dataframe_violations(cart)
    )

    topk = (
        orders.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            ),
        )
        .filter(F.col("rn") <= 5)
    )
    assert dataframe_violations(topk) == []  # WindowGroupLimit pushdown
