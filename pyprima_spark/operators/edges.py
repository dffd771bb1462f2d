"""Undirected-edge canonicalization and symmetric aggregation.

The reference's ``reverse_lines`` (util.py:139-155) swaps line endpoints
so Region_start <= Region_end alphabetically, then groups lines by the
canonical pair and sums capacities (generate_intermediate_files.py:
463-469), having dropped intra-regional (a == b) and extra-regional
(null endpoint) lines.

Spark-first: ``least``/``greatest`` — a pure projection, no row loop —
followed by one grouped aggregation on the canonical pair.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def canonicalize_edges(
    df: DataFrame,
    a: str,
    b: str,
    out_a: str = "edge_a",
    out_b: str = "edge_b",
    drop_loops: bool = True,
) -> DataFrame:
    out = df.withColumn(out_a, F.least(F.col(a), F.col(b))).withColumn(
        out_b, F.greatest(F.col(a), F.col(b))
    )
    out = out.filter(F.col(out_a).isNotNull() & F.col(out_b).isNotNull())
    if drop_loops:
        out = out.filter(F.col(out_a) != F.col(out_b))
    return out
