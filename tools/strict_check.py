"""Strict pre-run of the driver's correctness gate.

Differences from tests/oracle_utils.assert_matches_oracle:
  * runs on a PLAIN SparkSession (no pyprima_spark.session confs) — the
    driver builds its own session, so any conf our session.py sets must
    not be load-bearing;
  * compares values EXACTLY (the driver hashes values; a 1e-9 float
    wobble is a red row there even though pytest's rtol hides it).

Usage:
    python tools/strict_check.py [key ...]      # default: all oracled keys
    SF_DIR=/root/testdata/sf0.01 python tools/strict_check.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def plain_session():
    from pyspark.sql import SparkSession

    # local[8] mirrors the driver's bare session; the 10x scaled-replica
    # sweeps may widen it (more data wants more cores, exactly as a
    # bigger cluster would) via the env, without touching the default.
    cpus = os.environ.get("SPARK_STRICT_CPUS", "8")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("strict_check")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    )
    # Stays bare by default (the driver's own session is the contract
    # being rehearsed). Oversized local runs — the 10x scaled-replica
    # sweeps — need more than the 1g local default to hold their
    # shuffles; honor the env ONLY when the caller sets it explicitly.
    mem = os.environ.get("SPARK_DRIVER_MEMORY")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    return builder.getOrCreate()


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    from pyprima_spark.catalog import TABLES

    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        # the driver's tables are single files; Spark-written ones
        # (tools/make_scaled_testdata.py) are part-file directories
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Exact canonical form: sorted columns, stringified values, sorted rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for col in df.columns:
        s = df[col]
        if str(s.dtype).startswith(("datetime", "timedelta")):
            out[col] = s.astype(str)
        elif s.dtype.kind == "f":
            # repr-exact: 2.0 and 2 differ, 0.30000000000000004 visible
            out[col] = s.map(lambda v: repr(float(v)) if pd.notna(v) else "NaN")
        elif s.dtype.kind in "iu":
            out[col] = s.map(lambda v: str(int(v)))
        elif s.dtype == object:
            out[col] = s.map(_obj_str)
        else:
            out[col] = s.astype(str)
    c = pd.DataFrame(out)
    return c.sort_values(by=list(c.columns), kind="mergesort").reset_index(drop=True)


def _obj_str(v) -> str:
    if v is None:
        return "None"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_obj_str(x) for x in v) + "]"
    try:
        import numpy as np

        if isinstance(v, np.ndarray):
            return "[" + ",".join(_obj_str(x) for x in v.tolist()) + "]"
        if isinstance(v, (np.integer,)):
            return str(int(v))
        if isinstance(v, (np.floating,)):
            return repr(float(v))
    except ImportError:
        pass
    return str(v)


def check(key, qfn, sql, spark, sf_dir) -> tuple[bool, str]:
    # Per-side wall time rides in the PASS line: the §6(d)
    # inlined-recursive-CTE oracle pathology (>20 min DuckDB sides at
    # sf0.1, values fine) was only found by manual timing — with
    # s=/o= on every line, a `sort -t= -k3 -n` over a sweep log ranks
    # oracle cost and the next pathological key surfaces by itself.
    import time as _time

    t0 = _time.perf_counter()
    try:
        got = canon(qfn(spark, sf_dir).toPandas())
    except Exception as ex:
        return False, f"SPARK ERR: {type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
    t_spark = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    try:
        want = canon(run_oracle(sql, sf_dir))
    except Exception as ex:
        return False, f"ORACLE ERR: {type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
    t_oracle = _time.perf_counter() - t0
    if list(got.columns) != list(want.columns):
        return False, f"COLS spark={list(got.columns)} oracle={list(want.columns)}"
    if len(got) != len(want):
        return False, f"ROWS spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        neq = got[col].values != want[col].values
        if neq.any():
            i = int(neq.argmax())
            return False, (
                f"VALUE col={col} row={i} "
                f"spark={got[col].iloc[i]!r} oracle={want[col].iloc[i]!r} "
                f"({int(neq.sum())}/{len(got)} rows differ)"
            )
    return True, f"ok s={t_spark:.2f} o={t_oracle:.2f}"


def main() -> int:
    import __spark_entry__ as entry

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    queries = entry.queries()
    oracles = entry.oracle_sql()
    keys = sys.argv[1:] or [k for k in queries if k in oracles]
    spark = plain_session()
    n_bad = 0
    for key in keys:
        if key not in queries:
            print(f"{key}: NO SUCH QUERY")
            n_bad += 1
            continue
        if key not in oracles:
            print(f"{key}: rows-only (no oracle), skipping value check")
            continue
        ok, msg = check(key, queries[key], oracles[key], spark, sf_dir)
        tag = "PASS" if ok else "FAIL"
        print(f"{tag} {key}: {msg}", flush=True)
        n_bad += 0 if ok else 1
    print(f"\n{len(keys) - n_bad}/{len(keys)} strict-green")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
