"""Time-series gap filling.

Two reference patterns:

* forward-fill nulls in an ordered sequence (clean_IRENA_summary,
  correction_functions.py:704-708 fills country/technology from the
  previous row);
* trend-adjusted previous-day fill (clean_load_data_ENTSOE,
  correction_functions.py:315-318): a zero at hour i is replaced with
  ``sum(prev 5 h) / sum(prev 5 h of prev day) * value(i - 24)``.

Spark-first: both are window functions over the series key — state is
bounded per key (max 30 rows of frame), so a 1000-executor cluster
partitions by key and never materializes a global order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_cols: list[str],
    out_col: str | None = None,
) -> DataFrame:
    out_col = out_col or value_col
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def trend_fill_day_before(
    df: DataFrame,
    value_col: str,
    partition_cols: list[str],
    order_col: str,
    period: int = 24,
    trend_window: int = 5,
    out_col: str = "filled",
    precision: int = 4,
) -> DataFrame:
    """Fill zeros from one period earlier, scaled by the recent trend.

    filled[i] = sum(v[i-5..i-1]) / sum(v[i-29..i-25]) * v[i-24]
    when v[i] == 0 and all inputs exist and the denominator is nonzero;
    otherwise the original value is kept.
    """
    w = Window.partitionBy(*partition_cols).orderBy(order_col)
    v = F.col(value_col)
    recent = F.sum(v).over(w.rowsBetween(-trend_window, -1))
    prior = F.sum(v).over(
        w.rowsBetween(-(period + trend_window), -(period + 1))
    )
    day_before = F.lag(v, period).over(w)
    candidate = recent / prior * day_before
    filled = F.when(
        (v == 0)
        & day_before.isNotNull()
        & prior.isNotNull()
        & (prior != 0)
        & recent.isNotNull(),
        candidate,
    ).otherwise(v)
    return df.withColumn(out_col, F.round(filled, precision))


def trend_fill_sql(
    value_sql: str,
    partition_sql: str,
    order_sql: str,
    period: int = 24,
    trend_window: int = 5,
    precision: int = 4,
) -> str:
    """The identical fill as a SQL expression (window frames match)."""
    over = f"PARTITION BY {partition_sql} ORDER BY {order_sql}"
    recent = (
        f"sum({value_sql}) OVER ({over} ROWS BETWEEN {trend_window} PRECEDING"
        f" AND 1 PRECEDING)"
    )
    prior = (
        f"sum({value_sql}) OVER ({over} ROWS BETWEEN {period + trend_window} "
        f"PRECEDING AND {period + 1} PRECEDING)"
    )
    day_before = f"lag({value_sql}, {period}) OVER ({over})"
    return (
        f"round(CASE WHEN {value_sql} = 0 AND {day_before} IS NOT NULL "
        f"AND {prior} IS NOT NULL AND {prior} <> 0 AND {recent} IS NOT NULL "
        f"THEN {recent} / {prior} * {day_before} ELSE {value_sql} END, {precision})"
    )
