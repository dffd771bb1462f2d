"""Multi-value cell expansion — the reference's ``expand_dataframe``
(util.py:158-203), used to explode GridKit rows whose voltage/wires/
cables/frequency cells hold ';'-separated lists
(correction_functions.py:605).

Spark-first: ``split`` + ``explode`` — a narrow transformation (no
shuffle), unlike the reference's concat/melt/merge dance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_multivalue(df: DataFrame, col: str, sep: str = ";", out_col: str | None = None) -> DataFrame:
    out_col = out_col or col
    return df.withColumn(out_col, F.explode(F.split(F.col(col), sep)))
