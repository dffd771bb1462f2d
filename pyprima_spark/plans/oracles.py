"""DuckDB oracle SQL for every oracle-able query in the catalog.

Column aliases must match the Spark plans in
:mod:`pyprima_spark.plans.queries` exactly — the driver sorts columns by
name and hashes values. Floats passing through arithmetic are rounded
identically on both sides.
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

ORACLES["q1_pricing_summary"] = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 4)                                        AS avg_qty,
  round(avg(l_extendedprice), 4)                                   AS avg_price,
  round(avg(l_discount), 4)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["q3_shipping_priority"] = """
SELECT
  l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
  strftime(o_orderdate, '%Y-%m-%d')                 AS o_orderdate,
  o_orderpriority
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate  > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

from pyprima_spark.functions.binning import interval_bin_sql
from pyprima_spark.functions.calendar import daytype_sql, season_sql
from pyprima_spark.functions.strings import clean_name_sql
from pyprima_spark.operators.gapfill import trend_fill_sql
from pyprima_spark.operators.recode import mapping_values_sql
from pyprima_spark.plans.constants import (
    NATION_RECODE,
    SIZE_BINS,
    SIZE_DEFAULT,
)

ORACLES["recode_group"] = f"""
SELECT
  coalesce(__recode_val, n_name) AS country,
  count(*)                       AS n_orders,
  round(sum(o_totalprice), 2)    AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
LEFT JOIN {mapping_values_sql(NATION_RECODE)} ON n_name = __recode_key
GROUP BY 1
ORDER BY 1
"""

ORACLES["shares_normalize"] = """
WITH grouped AS (
  SELECT c_mktsegment, o_orderpriority, sum(o_totalprice) AS val
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
)
SELECT
  c_mktsegment,
  o_orderpriority,
  round(
    CASE WHEN sum(val) OVER (PARTITION BY c_mktsegment) = 0 THEN 0
         ELSE val / sum(val) OVER (PARTITION BY c_mktsegment) END, 6
  ) AS share
FROM grouped
"""

ORACLES["pivot_wide"] = """
SELECT
  c_mktsegment,
  round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 0), 2)        AS prio_1,
  round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '2-HIGH'), 0), 2)          AS prio_2,
  round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '3-MEDIUM'), 0), 2)        AS prio_3,
  round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '4-NOT SPECIFIED'), 0), 2) AS prio_4,
  round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '5-LOW'), 0), 2)           AS prio_5
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

ORACLES["unpivot_long"] = """
WITH long AS (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS val FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
)
SELECT l_returnflag, metric, round(sum(val), 2) AS total
FROM long GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["expand_multivalue"] = """
WITH words AS (
  SELECT unnest(string_split(p_name, ' ')) AS word, p_size FROM part
)
SELECT word, count(*) AS n_parts, round(avg(p_size), 4) AS avg_size
FROM words GROUP BY word ORDER BY word
"""

ORACLES["dedup_names"] = """
SELECT
  p_partkey,
  p_brand,
  p_brand || CASE WHEN rn = 1 THEN '' ELSE cast(rn - 1 AS varchar) END AS name_dedup
FROM (
  SELECT p_partkey, p_brand,
         row_number() OVER (PARTITION BY p_brand ORDER BY p_partkey) AS rn
  FROM part
)
"""

ORACLES["interval_binning"] = f"""
SELECT
  {interval_bin_sql('p_size', SIZE_BINS, SIZE_DEFAULT)} AS size_class,
  count(*) AS n,
  round(avg(p_retailprice), 4) AS avg_price
FROM part
GROUP BY 1 ORDER BY 1
"""

ORACLES["mode_impute"] = """
WITH ks AS (
  SELECT event_type,
         cast(regexp_extract(props, '(\\d+)', 1) AS int) AS k
  FROM events
),
mode AS (
  SELECT k AS mode_k FROM ks WHERE event_type <> 'error'
  GROUP BY k ORDER BY count(*) DESC, k ASC LIMIT 1
)
SELECT
  CASE WHEN event_type = 'error' THEN mode_k ELSE k END AS k_filled,
  count(*) AS cnt
FROM ks, mode
GROUP BY 1 ORDER BY 1
"""

ORACLES["ffill_impute"] = """
SELECT
  o_orderkey,
  o_custkey,
  coalesce(
    last_value(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderpriority END
               IGNORE NULLS)
      OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    'NONE'
  ) AS filled_priority
FROM orders
"""

_GAP_FILL_EXPR = trend_fill_sql("v", "event_type", "h")
ORACLES["gap_fill_trend"] = f"""
WITH ev AS (
  SELECT date_trunc('hour', ts) AS h, event_type, value FROM events
),
bounds AS (SELECT min(h) AS hmin, max(h) AS hmax FROM ev),
hours AS (
  SELECT unnest(generate_series(hmin, hmax, INTERVAL 1 hour)) AS h FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
sums AS (
  SELECT h, event_type, round(sum(value), 2) AS v FROM ev GROUP BY 1, 2
),
dense AS (
  SELECT hours.h, types.event_type, coalesce(sums.v, 0) AS v
  FROM hours CROSS JOIN types
  LEFT JOIN sums ON sums.h = hours.h AND sums.event_type = types.event_type
)
SELECT
  strftime(h, '%Y-%m-%d %H:%M:%S') AS h,
  event_type,
  {_GAP_FILL_EXPR} AS filled
FROM dense
"""

ORACLES["clean_names_ascii"] = f"""
SELECT
  doc_id,
  {clean_name_sql('text')} AS name_clean,
  length({clean_name_sql('text')}) AS n_ascii
FROM documents
"""

ORACLES["flh_pivot"] = """
WITH agg AS (
  SELECT
    user_id,
    round(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 2) AS purchase_value,
    count(*) FILTER (event_type = 'view') AS view_count
  FROM events GROUP BY user_id
)
SELECT user_id, purchase_value, view_count,
       CASE WHEN purchase_value = 0 THEN 0
            ELSE round(view_count / purchase_value, 4) END AS flh
FROM agg ORDER BY user_id
"""

ORACLES["calendar_enrich"] = f"""
SELECT
  {season_sql('o_orderdate')} AS season,
  {daytype_sql('o_orderdate')} AS daytype,
  count(*) AS n_orders,
  round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["profile_normalize"] = """
SELECT
  event_id,
  user_id,
  round(
    CASE WHEN sum(value) OVER (PARTITION BY user_id) = 0 THEN 0
         ELSE value / sum(value) OVER (PARTITION BY user_id) END, 6
  ) AS share
FROM events
"""

ORACLES["resample_hourly"] = """
SELECT
  strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
  event_type,
  count(*) AS n,
  round(sum(value), 2) AS total
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["q5_local_supplier"] = """
SELECT
  n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC
"""
