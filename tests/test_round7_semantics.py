"""Semantic invariants of the round-7 continuation operators — checks
that are TRUE BY THE OPERATOR'S MEANING regardless of data, which the
value-hash oracle gate cannot express (it only proves both engines
compute the same thing; these prove the thing computed has the claimed
properties)."""

from __future__ import annotations

from pyprima_spark.plans.queries import QUERIES


def test_erasure_cascade_manifest_balances(spark, sf_dir):
    rows = QUERIES["erasure_cascade"](spark, sf_dir).collect()
    assert {r.table_name for r in rows} == {"orders", "lineitem", "events"}
    for r in rows:
        assert r.after == r.before - r.erased
        assert 0 <= r.erased <= r.before


def test_mutual_nn_is_a_matching(spark, sf_dir):
    """Mutual top-1 implies a one-to-one pairing: no a_id or b_id may
    appear twice (the hub-suppression property the operator claims)."""
    rows = QUERIES["mutual_nn_mining"](spark, sf_dir).collect()
    a = [r.a_id for r in rows]
    b = [r.b_id for r in rows]
    assert len(a) == len(set(a)) and len(b) == len(set(b))
    assert rows, "mutual pairs should exist at any sf"


def test_rendezvous_census_conserves_and_bounds_movement(spark, sf_dir):
    rows = QUERIES["rendezvous_sharding"](spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    moved = sum(r.n_moved for r in rows)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert total == docs
    # HRW expectation: ~1/(n+1) of keys move; assert a loose 3x bound
    assert moved <= total // 3
    # every arrival into the NEW shard (id 8) counts as moved
    new_shard = [r for r in rows if r.shard_new == 8]
    assert new_shard and new_shard[0].n_moved == new_shard[0].n_docs


def test_ipf_raking_equalizes_column_masses(spark, sf_dir):
    rows = QUERIES["ipf_raking"](spark, sf_dir).collect()
    mass: dict[str, int] = {}
    for r in rows:
        mass[r.source] = mass.get(r.source, 0) + r.n * r.w_ppm
    vals = sorted(mass.values())
    # post column-fit masses equal up to ppm truncation per cell
    assert vals[-1] - vals[0] <= 10 * len(rows)


def test_decile_lift_covers_and_saturates(spark, sf_dir):
    rows = QUERIES["decile_lift"](spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(10, 0, -1))
    # cumulative capture is monotone and ends at 100% (10000 bp)
    caps = [r.cum_capture_bp for r in rows]
    assert caps == sorted(caps) and caps[-1] == 10000


def test_luhn_validator_catches_exactly_the_planted(spark, sf_dir):
    rows = QUERIES["luhn_check_audit"](spark, sf_dir).collect()
    assert sum(r.n_invalid for r in rows) == sum(
        r.expected_invalid for r in rows
    )
    for r in rows:
        assert r.n_invalid == r.expected_invalid


def test_no_oracle_is_vacuous_at_sf001():
    """Every oracled key must produce at least one row at sf0.01: an
    empty result hash-matches an empty oracle, so the correctness gate
    is blind to operators whose predicates miss the data entirely
    (caught live three times: decile_lift split at the corpus MIN
    date, churn_setops comparing an empty 1994 cohort,
    q22's no-orders-ever predicate on a corpus where everyone
    ordered). DuckDB-only — no Spark session, runs in seconds."""
    import duckdb

    from pyprima_spark.plans.oracles import ORACLES as _  # noqa: F401
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        __file__.rsplit("/", 2)[0] + "/__spark_entry__.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    oracles = mod.oracle_sql()
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.01/{t}.parquet')"
        )
    empty = [
        k for k, sql in sorted(oracles.items())
        if not con.execute(sql).fetchall()
    ]
    assert not empty, f"vacuous at sf0.01: {empty}"


def test_majority_vote_repair_accounting(spark, sf_dir):
    """2-of-3 with per-replica distinct wrong values: repaired_correct
    and unrecoverable must partition the table, and unrecoverable rows
    are exactly the double corruptions."""
    rows = QUERIES["majority_vote_repair"](spark, sf_dir).collect()
    for r in rows:
        assert r.n_repaired_correct + r.n_unrecoverable == r.n_rows
        assert r.n_unrecoverable == r.n_double_corrupt
        assert r.n_divergent >= r.n_double_corrupt


def test_similarity_band_census_saturates(spark, sf_dir):
    """Cumulative >=band share must reach 100% at each source's lowest
    band and be monotone along descending bands."""
    rows = QUERIES["similarity_band_census"](spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert by_src
    for src, rs in by_src.items():
        caps = [r.cum_ge_bp for r in rs]  # already band-descending
        assert caps == sorted(caps), src
        assert caps[-1] == 10000, src
