"""The driver-side exact-iteration family's foundations.

The census-collect-then-iterate keys (SURVEY §7.24a: bradley_terry,
spectral_bisection, pca_power_iteration, graph_robustness_attack,
assignment_exhaustive, hits, voting, grid_density_clusters, markov,
modularity, LPA, weighted_shortest_path) fold their fixed-point rounds
in Python. Their hash-match against the DuckDB oracles rests on two
bit-level contracts pinned here:

1. ``operators/exactmath.tdiv`` == Spark ``div`` == DuckDB ``//``
   (truncate toward zero; Python's ``//`` floors and would diverge on
   any negative intermediate — e.g. spectral_bisection's deflation
   mean, modularity's q_num).
2. The Python md5 rank hash in graph_robustness_attack ==
   functions/text.hash64_spark == hash64_duck (the engine-shared
   fingerprint family).
"""

from __future__ import annotations

from hashlib import md5

import duckdb
import pytest

from pyprima_spark.functions import text as X
from pyprima_spark.operators.exactmath import tdiv

CASES = [
    (7, 2),
    (-7, 2),
    (7, -2),
    (-7, -2),
    (0, 5),
    (1, 1),
    (-1, 3),
    (10**18, 7),
    (-(10**18) - 3, 7),
    (999999999999, -1000),
    (5, 10),
    (-5, 10),
]


def test_tdiv_matches_duckdb_integer_division():
    con = duckdb.connect()
    for a, b in CASES:
        want = con.execute(
            f"SELECT ({a})::HUGEINT // ({b})::HUGEINT"
        ).fetchone()[0]
        assert tdiv(a, b) == want, (a, b)


def test_tdiv_matches_spark_div(spark):
    exprs = ", ".join(
        f"cast({a} as decimal(38,0)) div cast({b} as decimal(38,0))"
        f" as c{i}"
        for i, (a, b) in enumerate(CASES)
    )
    row = spark.sql(f"SELECT {exprs}").collect()[0]
    for i, (a, b) in enumerate(CASES):
        assert tdiv(a, b) == row[f"c{i}"], (a, b)


def test_tdiv_null_propagation():
    assert tdiv(None, 3) is None
    assert tdiv(3, None) is None
    assert tdiv(None, None) is None
    with pytest.raises(ZeroDivisionError):
        tdiv(1, 0)  # call sites pass None for SQL's div nullif(x, 0)


def test_python_md5_rank_matches_engine_hash64(spark):
    """graph_robustness_attack replicates hash64 driver-side; pin the
    replication against BOTH engine formulations."""
    samples = [f"{n}:rob" for n in (0, 7, 24)] + ["x", "BRAND#13"]
    py = [int(md5(s.encode()).hexdigest()[:15], 16) for s in samples]
    lits = ", ".join("'" + s + "'" for s in samples)
    got_spark = [
        r[0]
        for r in spark.sql(
            f"SELECT {X.hash64_spark('s')} AS h FROM "
            f"(SELECT explode(array({lits})) AS s)"
        ).collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(f"SELECT {X.hash64_duck(repr(s))}").fetchone()[0]
        for s in samples
    ]
    assert py == got_spark == got_duck


def test_min_label_components_matches_distributed_operator(spark):
    """min_label_components (driver-side union-find) and
    operators/components.connected_components (distributed hash-min)
    must converge to the same fixpoint — the census-collect keys lean
    on that equivalence. Deterministic pseudo-random graphs: sparse,
    dense, and a long path (the hash-min worst case)."""
    from pyprima_spark.operators.components import connected_components
    from pyprima_spark.operators.exactmath import min_label_components

    graphs = [
        [(i, (i * 7 + 3) % 25) for i in range(25)],             # functional
        [(i, j) for i in range(12) for j in range(i) if (i * j) % 5 == 0],
        [(i, i + 1) for i in range(40)],                         # long path
        [(0, 1)],
        [(int(md5(f"{i}".encode()).hexdigest()[:4], 16) % 50,
          int(md5(f"x{i}".encode()).hexdigest()[:4], 16) % 50)
         for i in range(60)],                                    # random
    ]
    for edges in graphs:
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = min_label_components(edges)
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, "src", "dst").collect()
        }
        assert got == want


def test_dec_avg_exact_agrees_at_half_ulp_ties(spark):
    """The round-9 sf0.001 sweep caught dec_avg's double-round tie
    (5739.32375 -> .3238 Spark vs .3237 DuckDB). dec_avg_exact rounds
    half-away-from-zero in exact integers; pin that BOTH engines
    produce the identical double on exact .XXXX5 ties, both signs."""
    from pyprima_spark.functions.agg import dec_avg_exact

    cases = [
        ([5739.3237, 5739.3238], 5739.3238),   # the field tie
        ([-5739.3237, -5739.3238], -5739.3238),  # away from zero
        ([0.00005, 0.00005], 0.0001),
        ([1.0, 2.0], 1.5),
    ]
    con = duckdb.connect()
    for vals, want in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        got_spark = df.agg(dec_avg_exact("x").alias("m")).collect()[0]["m"]
        lits = ", ".join(f"({v})" for v in vals)
        got_duck = con.execute(
            "SELECT (CASE WHEN CAST(sum(CAST(x AS DECIMAL(27,6)) * 1000000)"
            " AS HUGEINT) < 0 THEN -1 ELSE 1 END"
            " * ((2 * abs(CAST(sum(CAST(x AS DECIMAL(27,6)) * 1000000)"
            " AS HUGEINT)) + 100 * count(x)) // (200 * count(x))))::DOUBLE"
            f" / 10000.0 FROM (VALUES {lits}) t(x)"
        ).fetchone()[0]
        assert got_spark == got_duck == want, (vals, got_spark, got_duck)


def test_bounded_collect_guard_and_audit(spark):
    """VERDICT r9 item 5: the census-collect keys' dim-bounded
    invariant is code, not a docstring. bounded_collect (a) returns
    the rows when the census fits its cap, (b) raises ValueError —
    after transferring at most cap+1 rows — when it does not, and
    (c) records the pre-collect census DataFrame under census_audit()
    so plan tools can walk the distributed stage the eager collect
    otherwise hides (ADVICE r9)."""
    import pytest

    from pyprima_spark.operators.exactmath import (
        bounded_collect,
        census_audit,
    )

    small = spark.range(5)
    assert len(bounded_collect(small, 5, "fits exactly")) == 5
    with pytest.raises(ValueError, match="documented dimension bound"):
        bounded_collect(spark.range(100), 5, "overflows")

    with census_audit() as censuses:
        rows = bounded_collect(small, 10, "recorded census")
    assert len(rows) == 5
    assert [what for what, _ in censuses] == ["recorded census"]
    # the recorded object is the live pre-collect DataFrame — its plan
    # (not the literal result) is what the audit walks
    assert censuses[0][1] is small
    # the sink is scoped: outside the block nothing is recorded
    bounded_collect(small, 10, "unrecorded")
    assert len(censuses) == 1


def test_every_plans_collect_is_bounded():
    """No bare .collect() may exist in pyprima_spark/plans/ — every
    driver-side census must ride bounded_collect so the dim-bounded
    invariant (SURVEY §7.24a) cannot silently erode as keys are
    added."""
    import glob
    import re

    offenders = []
    for path in glob.glob("pyprima_spark/plans/*.py"):
        src = open(path).read()
        for m in re.finditer(r"\.collect\(\)", src):
            line_no = src.count("\n", 0, m.start()) + 1
            offenders.append(f"{path}:{line_no}")
    assert not offenders, (
        "bare .collect() in plans/ — use exactmath.bounded_collect: "
        f"{offenders}"
    )
