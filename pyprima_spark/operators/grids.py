"""Expansion grids: cross-join all combinations of two (or more) small
dimensions and left-join existing facts, filling absent combinations.

Reference patterns: site×commodity grid (generate_intermediate_files.py:
584-592), site×process expansion with inst-cap 0 (:692-711), neighbor
pair grid outer-joined with existing lines and capacity filled to 0
(:476-490).

Spark-first: the dimensions are tiny → the cross join is
broadcast-nested-loop over broadcast rows, and the fill is a left join
+ coalesce. The fact side never shuffles for the grid.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expansion_grid(
    dims: Sequence[DataFrame],
    existing: DataFrame,
    keys: Sequence[str],
    fill: dict[str, float],
) -> DataFrame:
    """Cross-join ``dims``, left-join ``existing`` on ``keys``, fill gaps."""
    grid = dims[0]
    for d in dims[1:]:
        grid = grid.crossJoin(F.broadcast(d))
    out = grid.join(existing, on=list(keys), how="left")
    for col, value in fill.items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(value)))
    return out
