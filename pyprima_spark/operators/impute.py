"""Missing-value imputation.

Reference pattern (clean_GridKit_Europe, correction_functions.py:617-623):
``grid[col].isnull() → value_counts().index[0]`` — fill missing entries
with the per-column most common value (the mode).

Spark-first: the mode is a tiny aggregate (group → count → first by
deterministic order), cross-joined (1 row, broadcast) onto the fact
table. Tie-break: higher count wins, then smaller value — made explicit
because pandas' value_counts tie order is undefined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mode_of(df: DataFrame, col: Column, missing: Column) -> DataFrame:
    """1-row DataFrame with the mode of ``col`` over non-missing rows."""
    return (
        df.filter(~missing)
        .groupBy(col.alias("__mode_val"))
        .agg(F.count(F.lit(1)).alias("__mode_cnt"))
        .orderBy(F.desc("__mode_cnt"), F.asc("__mode_val"))
        .limit(1)
        .select("__mode_val")
    )


def mode_impute(
    df: DataFrame, col: Column, missing: Column, out_col: str
) -> DataFrame:
    """Replace ``col`` with the mode wherever ``missing`` holds."""
    mode_df = mode_of(df, col, missing)
    return (
        df.join(F.broadcast(mode_df))
        .withColumn(out_col, F.when(missing, F.col("__mode_val")).otherwise(col))
        .drop("__mode_val")
    )
