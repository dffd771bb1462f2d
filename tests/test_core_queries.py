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
