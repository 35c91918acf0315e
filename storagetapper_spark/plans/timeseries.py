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
                       # exact cents sum + shared division (q1 idiom)
                       (F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
                        .cast("double") / 100.0).alias("purchase_total")))


RANGE_JOIN_SQL = """
WITH signups AS (
  SELECT user_id, ts, event_id AS signup_id FROM events WHERE event_type = 'signup'
),
purchases AS (
  SELECT user_id, ts AS rts, event_id AS purchase_id, value
  FROM events WHERE event_type = 'purchase'
)
SELECT s.signup_id, s.user_id, count(*) AS n_purchases_24h,
       CAST(sum(CAST(round(p.value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS purchase_total
FROM signups s JOIN purchases p
  ON s.user_id = p.user_id
 AND epoch(p.rts) >= epoch(s.ts)
 AND epoch(p.rts) < epoch(s.ts) + 86400
GROUP BY s.signup_id, s.user_id
"""


def rollup_two_level(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable rollup: hourly aggregate re-aggregated to daily —
    the oracle computes daily straight from raw, proving sums-of-sums
    re-aggregation is exact (incl. avg carried as sum/count).
    avg rounds to 4dp: 2dp sits on half-up/half-even representation
    boundaries across engines (observed 255.15/10)."""
    from storagetapper_spark.operators.rollup import finalize, reaggregate, rollup_bucket

    ev = t(spark, sf, "events")
    hourly = rollup_bucket(ev, "ts", "1 hour", ["event_type"], "value")
    daily = reaggregate(hourly, "1 day", ["event_type"])
    # NB: no derived avg in the compared output — two-level summation
    # associates floats differently than the oracle's single-level sum
    # (ulp differences observed), and (v_sum, v_count) already pin avg.
    return daily.select(
        F.col("bucket_start").cast("long").alias("day_start"),
        "event_type",
        F.round("v_sum", 2).alias("v_sum"),
        "v_count", F.round("v_min", 2).alias("v_min"),
        F.round("v_max", 2).alias("v_max"),
    )


ROLLUP_TWO_LEVEL_SQL = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 day', ts)) AS BIGINT) AS day_start,
       event_type,
       round(sum(value), 2) AS v_sum,
       count(*) AS v_count,
       round(min(value), 2) AS v_min,
       round(max(value), 2) AS v_max
FROM events
GROUP BY 1, 2
"""


QUERIES = {
    "asof_state_at_event": (asof_state_at_event, ASOF_SQL),
    "range_join_follow_events": (range_join_follow_events, RANGE_JOIN_SQL),
    "rollup_two_level": (rollup_two_level, ROLLUP_TWO_LEVEL_SQL),
}
