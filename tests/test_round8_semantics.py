"""Semantic property tests for round-8 primitives (DuckDB-driven).

Engine parity is already pinned by the strict oracle gate; these test
that the MATH claimed by the round-8 operators actually holds:

- dup_span_census's diagonal-island trick is exactly the longest-
  common-substring detector it claims to be (a run of r matched
  k-grams on one (pos_a - pos_b) diagonal == a verbatim span of
  r + k - 1 words), verified against a brute-force word-level LCS.
- binary_hamming_recall's sign-bit packing is the numpy-reference
  popcount code it claims (bit i set iff component i >= 0, Hamming =
  popcount of xor).
- padding_waste_buckets's refinement guarantee: ANY bucketing pads no
  more than the single global bucket (max_b <= max_global per bucket).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from pyprima_spark.functions import text as X

_K = 3  # small gram width exercises the island logic harder


def _lcs_words(a: list[str], b: list[str]) -> int:
    best = 0
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    return best


def _span_sql(doc_a: list[str], doc_b: list[str]) -> list[tuple]:
    con = duckdb.connect()
    gram = " || ' ' || ".join(f"toks[i + {j}]" for j in range(_K))
    rows = [(0, doc_a), (1, doc_b)]
    con.execute("CREATE TABLE docs (doc_id BIGINT, toks VARCHAR[])")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    return con.execute(f"""
WITH grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - {_K - 1}),
                               i -> i - 1)) AS pos,
         unnest(list_transform(generate_series(1, len(toks) - {_K - 1}),
                               i -> {X.hash64_duck(gram)})) AS gh
  FROM docs WHERE len(toks) >= {_K}
),
matches AS (
  SELECT a.doc_id AS doc_a, a.pos AS pos_a, b.doc_id AS doc_b, b.pos AS pos_b
  FROM grams a JOIN grams b ON a.gh = b.gh AND a.doc_id < b.doc_id
),
runs AS (
  SELECT pos_a - row_number() OVER (
           PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS grp,
         pos_a - pos_b AS diag
  FROM matches
)
SELECT max(cnt) + {_K - 1} FROM (
  SELECT count(*) AS cnt FROM runs GROUP BY diag, grp
)
""").fetchall()


_tok = st.sampled_from(list("abcde"))
_doc = st.lists(_tok, min_size=_K, max_size=24)


@settings(max_examples=60, deadline=None)
@given(a=_doc, b=_doc)
def test_island_runs_equal_word_lcs(a: list[str], b: list[str]):
    """max span from the diagonal-island SQL == brute-force word LCS
    whenever the LCS reaches the gram width; no rows otherwise."""
    lcs = _lcs_words(a, b)
    out = _span_sql(a, b)
    if lcs >= _K:
        assert out[0][0] == lcs
    else:
        assert out[0][0] is None


@settings(max_examples=60, deadline=None)
@given(
    a=st.lists(st.integers(min_value=3, max_value=10), min_size=_K, max_size=10),
    b=st.lists(st.integers(min_value=3, max_value=10), min_size=_K, max_size=10),
    span=st.lists(st.integers(min_value=0, max_value=9), min_size=_K, max_size=8),
)
def test_island_runs_detect_planted_span(a, b, span):
    """A verbatim span copied into both docs is always found at >= its
    planted length (longer if the random context happens to extend it)."""
    sa = [str(x) for x in a] + [f"s{x}" for x in span]
    sb = [f"s{x}" for x in span] + [str(x + 20) for x in b]
    out = _span_sql(sa, sb)
    assert out[0][0] is not None and out[0][0] >= len(span)


@settings(max_examples=40, deadline=None)
@given(
    vec=st.lists(
        st.floats(min_value=-2.0, max_value=2.0, allow_nan=False,
                  width=32),
        min_size=60, max_size=60,
    )
)
def test_sign_pack_matches_numpy_reference(vec):
    """The packed 60-bit sign code equals the Python-side popcount
    reference, including the e == 0.0 / -0.0 boundary."""
    con = duckdb.connect()
    code_sql = (
        "SELECT CAST(list_sum(list_transform(range(60), i -> "
        "CASE WHEN CAST(emb[i + 1] AS DOUBLE) >= 0 "
        "THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) "
        "FROM (SELECT ?::FLOAT[] AS emb)"
    )
    got = con.execute(code_sql, [vec]).fetchone()[0]
    import struct

    want = sum(
        1 << i
        for i, e in enumerate(vec)
        if struct.unpack("f", struct.pack("f", e))[0] >= 0
    )
    assert got == want
    assert 0 <= got < (1 << 60)


@settings(max_examples=40, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=500), min_size=1,
                  max_size=120)
)
def test_bucketed_padding_never_exceeds_global(lens):
    """Quartile/decile bucket plans pad <= the single global bucket
    (every bucket max <= the global max), and padded >= total."""
    con = duckdb.connect()
    con.execute("CREATE TABLE lens (len BIGINT)")
    con.executemany("INSERT INTO lens VALUES (?)", [(x,) for x in lens])
    dec_case = "CASE " + " ".join(
        f"WHEN len <= c{d} THEN {d}" for d in range(1, 10)
    ) + " ELSE 10 END"
    qua_case = "CASE " + " ".join(
        f"WHEN len <= q{i} THEN {i}" for i in range(1, 4)
    ) + " ELSE 4 END"
    rows = con.execute(f"""
WITH cuts AS (
  SELECT {", ".join(f"quantile_disc(len, 0.{d}) AS c{d}" for d in range(1, 10))},
         quantile_disc(len, 0.25) AS q1, quantile_disc(len, 0.5) AS q2,
         quantile_disc(len, 0.75) AS q3
  FROM lens
),
assigned AS (
  SELECT len, 1 AS b_global, {qua_case} AS b_quart, {dec_case} AS b_dec
  FROM lens CROSS JOIN cuts
)
SELECT
  (SELECT sum(n * mx) FROM (SELECT count(*) n, max(len) mx FROM assigned GROUP BY b_global)),
  (SELECT sum(n * mx) FROM (SELECT count(*) n, max(len) mx FROM assigned GROUP BY b_quart)),
  (SELECT sum(n * mx) FROM (SELECT count(*) n, max(len) mx FROM assigned GROUP BY b_dec)),
  (SELECT sum(len) FROM lens)
""").fetchone()
    padded_g, padded_q, padded_d, total = rows
    assert padded_q <= padded_g
    assert padded_d <= padded_g
    assert min(padded_g, padded_q, padded_d) >= total


# --- round-8 second batch: Hilbert unroll, chi-square, Poisson weights ----

from pyprima_spark.plans.round8 import (
    _AA_CRIT_MILLI,
    _PBC_CUTS,
    _hilbert_stages,
)


def test_hilbert_unroll_is_the_hilbert_curve():
    """The unrolled SQL transform is a bijection on the 256x256 grid
    AND has the defining Hilbert property: consecutive d along the
    curve are exactly L1-distance-1 apart, for ALL 65536 steps."""
    con = duckdb.connect()
    q = ("SELECT cx, cy, cx AS x, cy AS y, CAST(0 AS BIGINT) AS d "
         "FROM (SELECT a.r AS cx, b.r AS cy FROM "
         "(SELECT unnest(generate_series(0, 255)) AS r) a, "
         "(SELECT unnest(generate_series(0, 255)) AS r) b)")
    for stage in _hilbert_stages(8, spark_syntax=False):
        cols = ", ".join(f"{e} AS {c}" for c, e in stage.items())
        q = f"SELECT cx, cy, {cols} FROM ({q})"
    n, dmin, dmax, nd = con.execute(
        f"SELECT count(*), min(d), max(d), count(DISTINCT d) FROM ({q})"
    ).fetchone()
    assert (n, dmin, dmax, nd) == (65536, 0, 65535, 65536)
    bad = con.execute(f"""
        SELECT count(*) FROM (
          SELECT abs(cx - lag(cx) OVER (ORDER BY d))
               + abs(cy - lag(cy) OVER (ORDER BY d)) AS l1
          FROM ({q})
        ) WHERE l1 IS NOT NULL AND l1 <> 1
    """).fetchone()[0]
    assert bad == 0


@settings(max_examples=60, deadline=None)
@given(
    a=st.integers(min_value=1, max_value=5000),
    b=st.integers(min_value=1, max_value=5000),
    c=st.integers(min_value=1, max_value=5000),
    d=st.integers(min_value=1, max_value=5000),
)
def test_integer_chi2_matches_float_reference(a, b, c, d):
    """aa_test_fpr's all-integer milli-chi² agrees with the float
    formula to within the 1-milli truncation granularity."""
    con = duckdb.connect()
    got = con.execute(f"""
        SELECT (1000 * ({a} + {b} + {c} + {d})::HUGEINT
                * ({a}::HUGEINT * {d} - {b}::HUGEINT * {c})
                * ({a}::HUGEINT * {d} - {b}::HUGEINT * {c}))
               // (({a}::HUGEINT + {b}) * ({c} + {d})
                   * ({a}::HUGEINT + {c}) * ({b} + {d}))
    """).fetchone()[0]
    n = a + b + c + d
    want = 1000 * n * (a * d - b * c) ** 2 / (
        (a + b) * (c + d) * (a + c) * (b + d)
    )
    assert got <= want < got + 1 + 1e-6
    assert _AA_CRIT_MILLI == 3841  # the embedded critical literal


def test_poisson_cutpoints_weight_mean_is_one():
    """The hash-vs-cutpoint weights behave like Poisson(1): mean
    within 3% of 1 and max weight <= 6 over 20k hashed ids."""
    con = duckdb.connect()
    cuts = " + ".join(
        f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _PBC_CUTS
    )
    mean, mx = con.execute(f"""
        SELECT avg(w), max(w) FROM (
          SELECT {cuts} AS w FROM (
            SELECT CAST('0x' || substring(md5(i::VARCHAR), 1, 15) AS BIGINT)
                   AS u
            FROM (SELECT unnest(generate_series(1, 20000)) AS i)
          )
        )
    """).fetchone()
    assert abs(mean - 1.0) < 0.03
    assert mx <= 6
