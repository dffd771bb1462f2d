"""Order-insensitive aggregate helpers.

A parallel double ``sum`` accumulates in partition order, so two runs
(or Spark vs a sequential oracle engine) can differ by ~1 ulp of the
total — enough to flip a ``round(.., 2)`` landing near a .005 boundary
and break a value-hash compare. Summing DECIMAL instead is exact and
associative: every engine gets bit-identical totals regardless of
partitioning.

The per-element double→decimal cast is safe at scale 6: the inputs are
prices/values with ~2 decimal digits of real precision, so element
values sit ~1e-10 away from any 5e-7 rounding boundary.

The DuckDB-side mirror of this helper is ``dec_sum_sql`` in
:mod:`pyprima_spark.plans.oracles`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 27 integer+fraction digits leaves sum headroom: Spark widens
# sum(decimal(27,6)) to decimal(37,6), i.e. 1e21 of total before
# overflow — far beyond any 100 TB aggregate of price-scale values.
DEC = "decimal(27,6)"


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact (order-insensitive) sum of a double column, rounded to
    ``scale`` and cast back to double so output schemas stay unchanged."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), scale).cast("double")


def dec_avg(col: Column | str, scale: int = 4) -> Column:
    """Order-insensitive mean: exact DECIMAL total, cast once to double,
    ONE correctly-rounded division by the non-null count. Unlike avg(),
    identical across engines and partitionings (a parallel double avg
    accumulates in partition order). DuckDB mirror:
    ``round(sum(CAST(x AS DECIMAL(27,6)))::DOUBLE / count(x), s)``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale)
