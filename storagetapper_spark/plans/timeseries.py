"""Time-series query plans: as-of join (DuckDB native ASOF JOIN as the
oracle) and bucketed time-range join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.operators.asof import asof_join, time_range_join
from storagetapper_spark.plans.common import t


def _purchases(spark, sf):
    """Right side: one rate row per (user, ts) — deduped so tie-breaking
    is engine-independent."""
    ev = t(spark, sf, "events")
    return (ev.filter(F.col("event_type") == "purchase")
              .groupBy("user_id", "ts")
              .agg(F.round(F.max("value"), 2).alias("rate")))


def asof_state_at_event(spark: SparkSession, sf: str) -> DataFrame:
    """For every click: the user's latest purchase value at click time —
    the 'state as of T' CDC query."""
    ev = t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("event_id", "user_id", "ts")
    rates = _purchases(spark, sf)
    out = asof_join(clicks, rates, by=["user_id"],
                    left_ts="ts", right_ts="ts", right_cols=["rate"])
    return out.select("event_id", "user_id", F.col("rate_asof").alias("rate_asof"))


ASOF_SQL = """
WITH rates AS (
  SELECT user_id, ts, round(max(value), 2) AS rate
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.event_id, c.user_id, r.rate AS rate_asof
FROM clicks c ASOF LEFT JOIN rates r
  ON c.user_id = r.user_id AND c.ts >= r.ts
"""


def range_join_follow_events(spark: SparkSession, sf: str) -> DataFrame:
    """Per signup: purchases by the same user within the next 24h —
    bucketed time-range join (Σ(bucket²), not n²)."""
    ev = t(spark, sf, "events")
    signups = (ev.filter(F.col("event_type") == "signup")
                 .select("user_id", "ts", F.col("event_id").alias("signup_id")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select("user_id", F.col("ts").alias("rts"),
                           F.col("event_id").alias("purchase_id"), "value"))
    joined = time_range_join(signups, purchases, by=["user_id"],
                             lower_sec=0, upper_sec=86400)
    return (joined.groupBy("signup_id", "user_id")
                  .agg(F.count(F.lit(1)).alias("n_purchases_24h"),
                       F.round(F.sum("value"), 2).alias("purchase_total")))


RANGE_JOIN_SQL = """
WITH signups AS (
  SELECT user_id, ts, event_id AS signup_id FROM events WHERE event_type = 'signup'
),
purchases AS (
  SELECT user_id, ts AS rts, event_id AS purchase_id, value
  FROM events WHERE event_type = 'purchase'
)
SELECT s.signup_id, s.user_id, count(*) AS n_purchases_24h,
       round(sum(p.value), 2) AS purchase_total
FROM signups s JOIN purchases p
  ON s.user_id = p.user_id
 AND epoch(p.rts) >= epoch(s.ts)
 AND epoch(p.rts) < epoch(s.ts) + 86400
GROUP BY s.signup_id, s.user_id
"""


QUERIES = {
    "asof_state_at_event": (asof_state_at_event, ASOF_SQL),
    "range_join_follow_events": (range_join_follow_events, RANGE_JOIN_SQL),
}
