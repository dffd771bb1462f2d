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
