"""Event-analytics batch 2: conversion funnel and retention cohorts —
the canonical product-analytics shapes over the events stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import events_t


# --- conversion funnel (ordered steps within a horizon) -----------------

def funnel_view_click_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """3-step funnel view→click→purchase: per user, the first view, the
    first click AFTER that view, the first purchase AFTER that click
    (within 7 days of the view).  Expressed as per-user min-aggregations
    + conditional re-aggregation — one shuffle per step on user_id, no
    self-join explosion: each step ships one row per user, not one row
    per event pair."""
    ev = events_t(spark, sf)
    first_view = (ev.filter(F.col("event_type") == "view")
                    .groupBy("user_id").agg(F.min("ts").alias("view_ts")))
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("user_id", F.col("ts").alias("click_ts"))
    first_click = (clicks.join(first_view, "user_id")
                   .filter(F.col("click_ts") >= F.col("view_ts"))
                   .groupBy("user_id", "view_ts")
                   .agg(F.min("click_ts").alias("click_ts")))
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("user_id", F.col("ts").alias("purchase_ts"))
    first_purchase = (purchases.join(first_click, "user_id")
                      .filter((F.col("purchase_ts") >= F.col("click_ts"))
                              & (F.col("purchase_ts")
                                 <= F.col("view_ts") + F.expr("INTERVAL 7 DAYS")))
                      .groupBy("user_id", "view_ts", "click_ts")
                      .agg(F.min("purchase_ts").alias("purchase_ts")))
    return (first_view
            .join(first_click.select("user_id",
                                     F.col("click_ts").alias("c_ts")),
                  "user_id", "left")
            .join(first_purchase.select("user_id",
                                        F.col("purchase_ts").alias("p_ts")),
                  "user_id", "left")
            .agg(F.count(F.lit(1)).alias("step1_view"),
                 F.count("c_ts").alias("step2_click"),
                 F.count("p_ts").alias("step3_purchase")))


FUNNEL_SQL = """
WITH first_view AS (
  SELECT user_id, min(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), first_click AS (
  SELECT e.user_id, v.view_ts, min(e.ts) AS click_ts
  FROM events e JOIN first_view v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.view_ts
  GROUP BY e.user_id, v.view_ts
), first_purchase AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN first_click c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
    AND e.ts <= c.view_ts + INTERVAL 7 DAY
  GROUP BY e.user_id
)
SELECT count(*) AS step1_view,
       count(c.user_id) AS step2_click,
       count(p.user_id) AS step3_purchase
FROM first_view v
LEFT JOIN first_click c ON v.user_id = c.user_id
LEFT JOIN first_purchase p ON v.user_id = p.user_id
"""


# --- retention cohorts (first-seen week × weeks-since activity) ---------

def retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    as active N weeks later.  Two shuffles (first-seen agg, cohort-cell
    agg); the fact table never self-joins — the cohort dimension is a
    per-user aggregate broadcast back onto the events."""
    ev = events_t(spark, sf)
    first_seen = (ev.groupBy("user_id")
                    .agg(F.date_trunc("week", F.min("ts")).alias("cohort_ts")))
    return (ev.join(F.broadcast(first_seen), "user_id")
              .withColumn("week_n",
                          F.floor((F.unix_timestamp("ts")
                                   - F.unix_timestamp("cohort_ts"))
                                  / (7 * 86400)).cast("int"))
              .groupBy(F.col("cohort_ts").cast("date").alias("cohort_week"),
                       "week_n")
              .agg(F.countDistinct("user_id").alias("active_users"))
              .orderBy("cohort_week", "week_n"))


RETENTION_SQL = """
WITH first_seen AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(floor((epoch(e.ts) - epoch(f.cohort_week)) / (7 * 86400)) AS INT)
         AS week_n,
       count(DISTINCT e.user_id) AS active_users
FROM events e JOIN first_seen f ON e.user_id = f.user_id
GROUP BY f.cohort_week, week_n
ORDER BY f.cohort_week, week_n
"""


QUERIES = {
    "funnel_view_click_purchase": (funnel_view_click_purchase, FUNNEL_SQL),
    "retention_cohorts": (retention_cohorts, RETENTION_SQL),
}
