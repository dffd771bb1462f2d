"""Driver-side exact integer arithmetic matching SQL semantics.

The catalog's iterative keys (the "HITS contract" family) collapse the
fact tables to dim-bounded censuses in Spark, then run their
fixed-point rounds driver-side in exact Python integers. For the
published values to hash-match the DuckDB oracles' unrolled CTE rounds
bit for bit, the driver-side fold must use the ENGINES' integral
division, not Python's: Spark's ``div`` and DuckDB's ``//`` both
truncate toward ZERO (verified empirically: ``-7 div 2 = -3`` on both),
where Python's ``//`` floors to ``-4``.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional, Tuple


def min_label_components(edges: Iterable[Tuple[int, int]]) -> Dict[int, int]:
    """node → min reachable node id, for a dim-bounded edge census.

    The driver-side counterpart of
    :func:`pyprima_spark.operators.components.connected_components`
    (hash-min label propagation, distributed): union-find converges to
    the same fixpoint — every node labeled with the smallest node id in
    its component — which is also what the oracles' recursive-CTE
    transitive closures compute. Used by the census-collect keys
    (graph_modularity, grid_density_clusters); only nodes that appear
    in ``edges`` are labeled.
    """
    parent: Dict[int, int] = {}
    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:  # min label wins the merged root
            parent[max(ra, rb)] = min(ra, rb)
    return {node: find(node) for node in parent}


def tdiv(a: Optional[int], b: Optional[int]) -> Optional[int]:
    """SQL integral division: truncate toward zero, NULL-propagating.

    ``None`` operands yield ``None`` (SQL NULL); call sites mirror SQL's
    ``div nullif(x, 0)`` by passing ``None`` for a zero divisor.
    """
    if a is None or b is None:
        return None
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q
