"""Range→discrete mapping, the Spark expression form of the reference's
``assign_values_based_on_series`` (util.py:228-252).

The reference iterates a dict of upper bounds sorted descending and
overwrites ``result[series <= key]``, so a value maps to the SMALLEST
bound >= value, with the ``'inf'`` entry as the default. That is exactly
a chained CASE over ascending bounds — a pure Column expression that
stays inside whole-stage codegen (no UDF, no join needed for literal
bin tables).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def interval_bin(col: Column, bounds: dict[float, object], default: object) -> Column:
    """Map ``col`` to ``bounds[min bound >= col]``, else ``default``."""
    expr = F.lit(default)
    for bound in sorted(bounds, reverse=True):
        expr = F.when(col <= F.lit(bound), F.lit(bounds[bound])).otherwise(expr)
    return expr


def interval_bin_sql(col_sql: str, bounds: dict[float, object], default: object) -> str:
    """The identical mapping as ANSI SQL (for oracle parity)."""
    parts = ["CASE"]
    for bound in sorted(bounds):
        val = bounds[bound]
        lit = f"'{val}'" if isinstance(val, str) else repr(val)
        parts.append(f"WHEN {col_sql} <= {bound} THEN {lit}")
    lit = f"'{default}'" if isinstance(default, str) else repr(default)
    parts.append(f"ELSE {lit} END")
    return " ".join(parts)
