"""Calendar recodes: month→season and weekday→daytype.

Mirrors the reference's dict_season / dict_daytype lookups
(correction_functions.py:20-32): every date is enriched with a season
from its month and a day type (Working day / Saturday / Sunday) from its
weekday, before profile lookup. Pure Column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# month → season, as in assumptions/dict_season_north.csv
SEASONS = {
    (12, 1, 2): "Winter",
    (3, 4, 5): "Spring",
    (6, 7, 8): "Summer",
    (9, 10, 11): "Fall",
}


def season(ts: Column) -> Column:
    m = F.month(ts)
    expr = F.lit(None)
    for months, name in SEASONS.items():
        expr = F.when(m.isin(*months), F.lit(name)).otherwise(expr)
    return expr


def season_sql(col_sql: str) -> str:
    whens = " ".join(
        f"WHEN month({col_sql}) IN ({', '.join(map(str, months))}) THEN '{name}'"
        for months, name in SEASONS.items()
    )
    return f"CASE {whens} END"


def daytype(ts: Column) -> Column:
    # Spark dayofweek: Sunday=1 .. Saturday=7
    d = F.dayofweek(ts)
    return (
        F.when(d == 1, F.lit("Sunday"))
        .when(d == 7, F.lit("Saturday"))
        .otherwise(F.lit("Working day"))
    )


def daytype_sql(col_sql: str) -> str:
    # DuckDB dayofweek: Sunday=0 .. Saturday=6
    return (
        f"CASE WHEN dayofweek({col_sql}) = 0 THEN 'Sunday' "
        f"WHEN dayofweek({col_sql}) = 6 THEN 'Saturday' "
        f"ELSE 'Working day' END"
    )
