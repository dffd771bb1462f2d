"""Skew-resilient join helper.

AQE's skew-join optimization splits oversized shuffle partitions at
runtime and is the first line of defense (enabled in session.py). This
helper is the explicit fallback for layouts AQE cannot rebalance —
e.g. a heavy-hitter key whose rows must co-group afterwards, or a
bucketed table whose layout pins the partitioning.

The big side is salted deterministically (hash of all its columns — no
nondeterministic rand(), so retried tasks recompute identical salts);
the small side is exploded ``n_salts`` ways so every (key, salt) pair
still finds its match. One equi-join on (key, salt), fan-out only on
the small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")
