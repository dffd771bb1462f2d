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

from typing import Optional


def tdiv(a: Optional[int], b: Optional[int]) -> Optional[int]:
    """SQL integral division: truncate toward zero, NULL-propagating.

    ``None`` operands yield ``None`` (SQL NULL); call sites mirror SQL's
    ``div nullif(x, 0)`` by passing ``None`` for a zero divisor.
    """
    if a is None or b is None:
        return None
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q
