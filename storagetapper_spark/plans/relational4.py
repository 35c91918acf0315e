"""Relational layer, batch 4: native session windows, union-by-name with
missing columns, map functions, array higher-order functions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


def session_window_native(spark: SparkSession, sf: str) -> DataFrame:
    """F.session_window in batch mode (the streaming session operator's
    semantics, checked against a gaps-and-islands oracle)."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
          .agg(F.count(F.lit(1)).alias("n_events"),
               # exact cents sum + shared division (q1 idiom)
               (F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
                .cast("double") / 100.0).alias("session_value"))
          .select("user_id",
                  F.col("w.start").cast("long").alias("session_start"),
                  "n_events", "session_value")
    )


SESSION_WINDOW_SQL = """
WITH t AS (SELECT user_id, ts, value, epoch(ts) AS e FROM events),
g AS (SELECT *, CASE WHEN e - lag(e) OVER (PARTITION BY user_id ORDER BY ts) > 1800
                  OR lag(e) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                THEN 1 ELSE 0 END AS ns FROM t),
s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid FROM g)
SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS session_value
FROM s GROUP BY user_id, sid
"""


def union_by_name_missing(spark: SparkSession, sf: str) -> DataFrame:
    n = t(spark, sf, "nation")
    a = n.select("n_nationkey", "n_name")
    b = n.select("n_nationkey", "n_regionkey")
    return a.unionByName(b, allowMissingColumns=True)


UNION_BY_NAME_SQL = """
SELECT n_nationkey, n_name, CAST(NULL AS INT) AS n_regionkey FROM nation
UNION ALL
SELECT n_nationkey, CAST(NULL AS VARCHAR) AS n_name, n_regionkey FROM nation
"""


def map_functions(spark: SparkSession, sf: str) -> DataFrame:
    n = t(spark, sf, "nation")
    m = F.map_from_entries(F.array(
        F.struct(F.lit("key").alias("k"), F.col("n_nationkey").cast("long").alias("v")),
        F.struct(F.lit("region").alias("k"), F.col("n_regionkey").cast("long").alias("v")),
    ))
    return n.select(
        "n_nationkey",
        F.element_at(m, "region").alias("region_val"),
        F.array_join(F.map_keys(m), ",").alias("keys"),
        F.size(m).alias("n_entries"),
        F.element_at(m, "missing").alias("missing_val"),
    )


MAP_SQL = """
WITH m AS (
  SELECT n_nationkey,
         map_from_entries([{'k': 'key', 'v': CAST(n_nationkey AS BIGINT)},
                           {'k': 'region', 'v': CAST(n_regionkey AS BIGINT)}]) AS mp
  FROM nation
)
SELECT n_nationkey,
       mp['region'][1] AS region_val,
       array_to_string(map_keys(mp), ',') AS keys,
       cardinality(mp) AS n_entries,
       CAST(NULL AS BIGINT) AS missing_val
FROM m
"""


def array_hof(spark: SparkSession, sf: str) -> DataFrame:
    """exists / forall / aggregate / zip_with over per-row arrays."""
    li = t(spark, sf, "lineitem").filter(F.col("l_linenumber") == 1)
    arr = F.array("l_quantity", "l_discount", "l_tax")
    return li.select(
        "l_orderkey",
        F.exists(arr, lambda x: x > 40).alias("any_gt40"),
        F.forall(arr, lambda x: x >= 0).alias("all_nonneg"),
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x), 4).alias("arr_sum"),
        F.round(F.aggregate(F.zip_with(arr, arr, lambda a, b: a * b),
                            F.lit(0.0), lambda a, x: a + x), 4).alias("arr_dot"),
    )


ARRAY_HOF_SQL = """
WITH a AS (SELECT l_orderkey, [l_quantity, l_discount, l_tax] AS arr
           FROM lineitem WHERE l_linenumber = 1)
SELECT l_orderkey,
       len(list_filter(arr, x -> x > 40)) > 0 AS any_gt40,
       len(list_filter(arr, x -> x >= 0)) = 3 AS all_nonneg,
       round(list_reduce(list_prepend(0.0, arr), (acc, x) -> acc + x), 4) AS arr_sum,
       round(list_reduce(list_prepend(0.0, list_transform(range(3), i -> arr[i+1] * arr[i+1])),
                         (acc, x) -> acc + x), 4) AS arr_dot
FROM a
"""


QUERIES = {
    "session_window_native": (session_window_native, SESSION_WINDOW_SQL),
    "union_by_name_missing": (union_by_name_missing, UNION_BY_NAME_SQL),
    "map_functions": (map_functions, MAP_SQL),
    "array_hof": (array_hof, ARRAY_HOF_SQL),
}
