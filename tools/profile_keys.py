"""Per-key profiling for the optimization rounds.

For each catalog key (default: every benched key) reports
  t_build  — Python-side plan construction (includes any eager census
             collects the query function performs),
  t_exec   — .count() on the returned frame (the bench's timed action),
  jobs     — Spark jobs launched across build+exec (job-group scoped),
  tasks    — tasks run across build+exec,
  exch     — Exchange nodes in the FINAL executed plan string,
  plan written to plans/r10/<key>_<tag>.txt when --dump-plans TAG is given.

Usage:
    python tools/profile_keys.py [--dump-plans before] [key ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     PROFILE_OUT=path to also write the rows as JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyprima_spark.session import build_session
from pyprima_spark.plans.queries import QUERIES


def main() -> None:
    args = sys.argv[1:]
    tag = None
    if args and args[0] == "--dump-plans":
        tag = args[1]
        args = args[2:]

    import bench as bench_mod

    keys = args or [k for k in bench_mod.BENCH_QUERIES if k in QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("pyprima_profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm
    QUERIES[keys[0]](spark, sf_dir).count()

    plan_dir = os.environ.get("PROFILE_PLAN_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r10",
    )
    if tag:
        os.makedirs(plan_dir, exist_ok=True)

    def group_stats(group: str):
        ids = tracker.getJobIdsForGroup(group) or []
        ntasks = 0
        for j in ids:
            info = tracker.getJobInfo(j)
            if info is None:
                continue
            for s in info.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    ntasks += si.numTasks
        return len(ids), ntasks

    rows = []
    for name in keys:
        spark.catalog.clearCache()
        fn = bench_mod.BENCH_OVERRIDES.get(name, QUERIES[name])
        group = f"profile_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        jobs, tasks = group_stats(group)
        plan = df._jdf.queryExecution().executedPlan().toString()
        exch = plan.count("Exchange")
        if tag:
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(_formatted(df))
        rows.append(
            {
                "key": name,
                "t_build": round(t1 - t0, 3),
                "t_exec": round(t2 - t1, 3),
                "jobs": jobs,
                "tasks": tasks,
                "exch": exch,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    out = os.environ.get("PROFILE_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(rows, fh)
    spark.stop()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


if __name__ == "__main__":
    main()
