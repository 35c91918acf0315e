"""Batch 15: per-entity baseline anomaly (order-gap), YoY revenue
growth, and per-group five-number summaries — the remaining standard
BI shapes.  Usual exactness discipline: integer day gaps and cents,
exact interpolated percentiles (identical (n−1)·p arithmetic in Spark
percentile() and DuckDB quantile_cont), floor-micro ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import events_t, t

_MIN_ORDERS = 5


def customer_gap_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Customers whose LATEST inter-order gap exceeds 2× their own
    median gap (≥5 orders) — per-entity-baseline anomaly detection,
    the shape that scales where a global threshold can't (every
    statistic is keyed by the entity, so the whole query is one
    customer-partitioned window pass plus a per-customer agg)."""
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate",
                                                "o_orderkey")
    gaps = (o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lag(F.col("o_orderdate").cast("date")).over(w))
        .alias("gap"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey"))
        .alias("n_orders"))
        .filter(F.col("gap").isNotNull()))
    agg = (gaps.groupBy("o_custkey", "n_orders")
           .agg(F.percentile("gap", F.lit(0.5)).alias("med"),
                F.max_by("gap", "rn").alias("last_gap")))
    return (agg.filter((F.col("n_orders") >= _MIN_ORDERS)
                       & (F.col("last_gap").cast("double")
                          > 2.0 * F.col("med")))
            .select("o_custkey", "n_orders",
                    F.floor(F.col("med") * 1000000).cast("long")
                    .alias("median_gap_micro_days"),
                    F.col("last_gap").alias("last_gap_days"))
            .orderBy("o_custkey"))


GAP_ANOMALY_SQL = f"""
WITH gaps AS (
  SELECT o_custkey,
         date_diff('day',
             lag(CAST(o_orderdate AS DATE)) OVER w,
             CAST(o_orderdate AS DATE)) AS gap,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY o_custkey) AS n_orders
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
agg AS (
  SELECT o_custkey, n_orders,
         quantile_cont(gap, 0.5) AS med,
         arg_max(gap, rn) AS last_gap
  FROM gaps WHERE gap IS NOT NULL
  GROUP BY o_custkey, n_orders
)
SELECT o_custkey, n_orders,
       CAST(floor(med * 1000000) AS BIGINT) AS median_gap_micro_days,
       CAST(last_gap AS BIGINT) AS last_gap_days
FROM agg
WHERE n_orders >= {_MIN_ORDERS} AND CAST(last_gap AS DOUBLE) > 2.0 * med
ORDER BY o_custkey
"""


QUERIES = {
    "customer_gap_anomaly": (customer_gap_anomaly, GAP_ANOMALY_SQL),
}


def revenue_yoy_growth(spark: SparkSession, sf: str) -> DataFrame:
    """Monthly net revenue with year-over-year growth (vs the same
    month last year, exact cents; growth floor-micro, null-safe for
    the first year).  The month table after one fact agg is
    calendar-sized; the lag-12 lookup is a self-equality on
    (month − 12), not a window over raw data."""
    li = t(spark, sf, "lineitem")
    net = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * 100).cast("long")
    m = (li.groupBy(F.date_trunc("month", F.col("l_shipdate"))
                    .cast("date").alias("month"))
         .agg(F.sum(net).alias("cents")))
    prev = m.select(F.add_months(F.col("month"), 12).alias("month"),
                    F.col("cents").alias("prev_cents"))
    growth = F.floor((F.col("cents") - F.col("prev_cents"))
                     .cast("double") * 1000000
                     / F.col("prev_cents").cast("double")).cast("long")
    return (m.join(prev, "month", "left")
            .select("month", "cents", "prev_cents",
                    growth.alias("yoy_growth_micro"))
            .orderBy("month"))


YOY_SQL = """
WITH m AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
         CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem GROUP BY 1
)
SELECT a.month, a.cents, b.cents AS prev_cents,
       CAST(floor(CAST(a.cents - b.cents AS DOUBLE) * 1000000
                  / CAST(b.cents AS DOUBLE)) AS BIGINT)
         AS yoy_growth_micro
FROM m a LEFT JOIN m b ON b.month + INTERVAL 12 MONTH = a.month
ORDER BY a.month
"""


QUERIES["revenue_yoy_growth"] = (revenue_yoy_growth, YOY_SQL)


def events_value_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Five-number summary (min/q1/median/q3/max, exact interpolated,
    cents) of event value per event type plus the IQR-outlier count
    (> q3 + 1.5·IQR) — the boxplot backing query.  Two passes over the
    typed values: one agg for the summary, one conditional count
    against the broadcast fences."""
    ev = events_t(spark, sf)
    v = ev.select("event_type",
                  F.round(F.col("value") * 100).cast("long").alias("c"))
    s = (v.groupBy("event_type")
         .agg(F.count(F.lit(1)).alias("n"),
              F.min("c").alias("min_cents"),
              F.percentile("c", F.lit(0.25)).alias("q1"),
              F.percentile("c", F.lit(0.5)).alias("med"),
              F.percentile("c", F.lit(0.75)).alias("q3"),
              F.max("c").alias("max_cents")))
    out = (v.join(F.broadcast(s.select("event_type", "q1", "q3")),
                  "event_type")
           .filter(F.col("c").cast("double")
                   > F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")))
           .groupBy("event_type")
           .agg(F.count(F.lit(1)).alias("n_outliers")))
    return (s.join(out, "event_type", "left")
            .select("event_type", "n", "min_cents",
                    F.floor(F.col("q1")).cast("long").alias("q1_cents"),
                    F.floor(F.col("med")).cast("long").alias("med_cents"),
                    F.floor(F.col("q3")).cast("long").alias("q3_cents"),
                    "max_cents",
                    F.coalesce("n_outliers", F.lit(0))
                    .alias("n_outliers"))
            .orderBy("event_type"))


VALUE_SUMMARY_SQL = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
s AS (
  SELECT event_type, count(*) AS n, min(c) AS min_cents,
         quantile_cont(c, 0.25) AS q1, quantile_cont(c, 0.5) AS med,
         quantile_cont(c, 0.75) AS q3, max(c) AS max_cents
  FROM v GROUP BY event_type
),
o AS (
  SELECT v.event_type, count(*) AS n_outliers
  FROM v JOIN s ON s.event_type = v.event_type
  WHERE CAST(v.c AS DOUBLE) > s.q3 + 1.5 * (s.q3 - s.q1)
  GROUP BY v.event_type
)
SELECT s.event_type, s.n, s.min_cents,
       CAST(floor(s.q1) AS BIGINT) AS q1_cents,
       CAST(floor(s.med) AS BIGINT) AS med_cents,
       CAST(floor(s.q3) AS BIGINT) AS q3_cents,
       s.max_cents, COALESCE(o.n_outliers, 0) AS n_outliers
FROM s LEFT JOIN o ON o.event_type = s.event_type
ORDER BY s.event_type
"""


QUERIES["events_value_summary"] = (events_value_summary,
                                   VALUE_SUMMARY_SQL)
