"""Oracle-parity tests for every catalog query with an oracle."""

from __future__ import annotations

import pytest

from pyprima_spark.plans.oracles import ORACLES
from pyprima_spark.plans.queries import QUERIES
from tests.oracle_utils import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    assert name in QUERIES, f"oracle {name} has no Spark query"
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir)


def test_every_query_has_rows(spark, sf_dir):
    for name, fn in QUERIES.items():
        assert fn(spark, sf_dir).count() >= 0, name


def test_catalog_and_oracles_cover_same_keys():
    """Every queries() key must have an oracle (the driver records a
    weaker rows-only check otherwise) and vice versa; catches a new
    operator landing in one registry but not the other."""
    assert set(QUERIES) == set(ORACLES), (
        sorted(set(QUERIES) ^ set(ORACLES))
    )


def test_every_query_documents_itself():
    """Every catalog operator must carry a real docstring (the scale
    rationale and reference citations live there — an undocumented
    operator is unreviewable)."""
    thin = [
        name
        for name, fn in QUERIES.items()
        if not (fn.__doc__ and len(fn.__doc__.strip()) >= 40)
    ]
    assert not thin, thin


def test_every_query_has_a_survey_row():
    """Registry parity with the coverage checklist (VERDICT r5 item 3:
    five operators once landed with no SURVEY §2 rows and were invisible
    to the coverage audit). Every catalog key must appear backticked in
    SURVEY.md; a key without a row fails here the moment it registers."""
    import os

    survey = open(
        os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    ).read()
    unlisted = [name for name in QUERIES if f"`{name}`" not in survey]
    assert not unlisted, unlisted


def test_every_query_is_benched_or_excluded():
    """bench.py must either time a catalog key or name it in the
    documented-exclusions comment block — silent bench gaps hide
    per-round perf regressions (VERDICT r5 item 4)."""
    import os

    src = open(
        os.path.join(os.path.dirname(__file__), "..", "bench.py")
    ).read()
    gaps = [name for name in QUERIES if name not in src]
    assert not gaps, gaps
