"""Product-analytics batch 11: growth accounting, session-gap
sensitivity, customer segment migration, shipping SLA attainment.
The standard weekly-business-review layer over the event and order
fixtures — each a single-scan plan whose wide stages are keyed by
user/customer (the natural 100 TB partitioning), with only
cell-table-sized joins after the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


def events_user_lifecycle(spark: SparkSession, sf: str) -> DataFrame:
    """Daily growth accounting: per day, how many users are NEW (first
    ever day), RETAINED (also present yesterday), RESURRECTED (back
    after a gap), and CHURNED (present yesterday, absent today).  The
    classic DAU decomposition new+retained+resurrected−churned.

    One distinct (user, day) pass, one user-keyed window for lag/lead,
    then day-keyed counts — churn events are EMITTED at day+1 by the
    lead() side so no day×user cross join ever exists."""
    ev = t(spark, sf, "events")
    ud = (ev.select("user_id", F.col("ts").cast("date").alias("day"))
          .distinct())
    w = Window.partitionBy("user_id").orderBy("day")
    lagd = F.lag("day").over(w)
    leadd = F.lead("day").over(w)
    maxd = ud.agg(F.max("day").alias("max_day"))
    tagged = (ud.select(
        "user_id", "day", lagd.alias("prev"), leadd.alias("nxt"))
        .crossJoin(F.broadcast(maxd)))
    status = (F.when(F.col("prev").isNull(), "new")
              .when(F.datediff("day", "prev") == 1, "retained")
              .otherwise("resurrected"))
    base = (tagged.groupBy("day")
            .agg(F.sum(F.when(status == "new", 1).otherwise(0))
                 .alias("n_new"),
                 F.sum(F.when(status == "retained", 1).otherwise(0))
                 .alias("n_retained"),
                 F.sum(F.when(status == "resurrected", 1).otherwise(0))
                 .alias("n_resurrected")))
    churn = (tagged.filter(
        (F.col("day") < F.col("max_day"))
        & (F.col("nxt").isNull() | (F.datediff("nxt", "day") > 1)))
        .select(F.date_add("day", 1).alias("day"))
        .groupBy("day").agg(F.count(F.lit(1)).alias("n_churned")))
    return (base.join(churn, "day", "full")
            .select("day",
                    F.coalesce("n_new", F.lit(0)).alias("n_new"),
                    F.coalesce("n_retained", F.lit(0))
                    .alias("n_retained"),
                    F.coalesce("n_resurrected", F.lit(0))
                    .alias("n_resurrected"),
                    F.coalesce("n_churned", F.lit(0))
                    .alias("n_churned"))
            .orderBy("day"))


LIFECYCLE_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
tagged AS (
  SELECT user_id, day,
         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
         lead(day) OVER (PARTITION BY user_id ORDER BY day) AS nxt,
         (SELECT max(day) FROM ud) AS max_day
  FROM ud
),
base AS (
  SELECT day,
         sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS n_new,
         sum(CASE WHEN prev IS NOT NULL AND day - prev = 1
                  THEN 1 ELSE 0 END) AS n_retained,
         sum(CASE WHEN prev IS NOT NULL AND day - prev > 1
                  THEN 1 ELSE 0 END) AS n_resurrected
  FROM tagged GROUP BY day
),
churn AS (
  SELECT day + 1 AS day, count(*) AS n_churned
  FROM tagged
  WHERE day < max_day AND (nxt IS NULL OR nxt - day > 1)
  GROUP BY 1
)
SELECT COALESCE(b.day, c.day) AS day,
       CAST(COALESCE(b.n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(b.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(b.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
FROM base b FULL JOIN churn c ON c.day = b.day
ORDER BY day
"""


QUERIES = {
    "events_user_lifecycle": (events_user_lifecycle, LIFECYCLE_SQL),
}


_GAPS = [900, 1800, 3600]


def sessionization_gap_sensitivity(spark: SparkSession, sf: str
                                   ) -> DataFrame:
    """How session counts depend on the inactivity threshold: for
    gap ∈ {15, 30, 60} min, total sessions and mean events/session.
    The calibration readout behind sessionize's fixed 1800 s.

    One user-keyed window computes each event's gap once; the three
    thresholds are conditional sums over the SAME pass (no re-scan,
    no explode).  Events/session ships as an exact floor-micro ratio."""
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.col("ts").cast("double")
           - F.lag(F.col("ts").cast("double")).over(w))
    g = ev.select(gap.alias("gap"))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    for thr in _GAPS:
        aggs.append(F.sum(
            F.when(F.col("gap").isNull() | (F.col("gap") > thr), 1)
            .otherwise(0)).alias(f"s_{thr}"))
    s = g.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(thr).alias("gap_s"),
                 F.col(f"s_{thr}").alias("n_sessions"),
                 F.floor(F.col("n_events") * 1000000
                         / F.col(f"s_{thr}")).cast("long")
                 .alias("events_per_session_micro"))
        for thr in _GAPS])
    return (s.select(F.explode(rows).alias("r"))
            .select("r.gap_s", "r.n_sessions",
                    "r.events_per_session_micro")
            .orderBy("gap_s"))


GAP_SENSITIVITY_SQL = f"""
WITH g AS (
  SELECT epoch(ts) - lag(epoch(ts)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
s AS (
  SELECT count(*) AS n_events,
         {", ".join(
             f"sum(CASE WHEN gap IS NULL OR gap > {thr} THEN 1 ELSE 0 END)"
             f" AS s_{thr}" for thr in _GAPS)}
  FROM g
)
{" UNION ALL ".join(
    f"SELECT {thr} AS gap_s, CAST(s_{thr} AS BIGINT) AS n_sessions, "
    f"CAST(floor(n_events * 1000000 / s_{thr}) AS BIGINT)"
    f" AS events_per_session_micro FROM s" for thr in _GAPS)}
ORDER BY gap_s
"""


QUERIES["sessionization_gap_sensitivity"] = (
    sessionization_gap_sensitivity, GAP_SENSITIVITY_SQL)


_SPLIT_DATE = "1998-01-01"


def customer_segment_migration(spark: SparkSession, sf: str) -> DataFrame:
    """Spend-tercile migration matrix: customers bucketed into spend
    terciles (low/mid/high, by exact interpolated tercile cutpoints)
    separately for the first and second half of the order history
    (split {_SPLIT_DATE}), counted per (segment_h1 → segment_h2) cell;
    customers active in only one half land in segment 0.

    Spend is exact integer cents; tercile cutpoints are percentile()
    over the customer-level table (already aggregated — tiny), applied
    as a broadcast.  The matrix is ≤ 4×4."""
    o = t(spark, sf, "orders")
    half = F.when(F.col("o_orderdate") < F.lit(_SPLIT_DATE), 1).otherwise(2)
    spend = (o.groupBy(F.col("o_custkey").alias("c"), half.alias("h"))
             .agg(F.sum(F.round(F.col("o_totalprice") * 100)
                        .cast("long")).alias("cents")))
    cuts = (spend.groupBy("h")
            .agg(F.percentile("cents", F.lit(1.0 / 3)).alias("t1"),
                 F.percentile("cents", F.lit(2.0 / 3)).alias("t2")))
    seg = (spend.join(F.broadcast(cuts), "h")
           .select("c", "h",
                   F.when(F.col("cents").cast("double") <= F.col("t1"), 1)
                   .when(F.col("cents").cast("double") <= F.col("t2"), 2)
                   .otherwise(3).alias("seg")))
    h1 = seg.filter(F.col("h") == 1).select("c", F.col("seg").alias("seg_h1"))
    h2 = seg.filter(F.col("h") == 2).select(
        F.col("c").alias("c2"), F.col("seg").alias("seg_h2"))
    m = (h1.join(h2, F.col("c") == F.col("c2"), "full")
         .select(F.coalesce("seg_h1", F.lit(0)).alias("seg_h1"),
                 F.coalesce("seg_h2", F.lit(0)).alias("seg_h2")))
    return (m.groupBy("seg_h1", "seg_h2")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .orderBy("seg_h1", "seg_h2"))


MIGRATION_SQL = f"""
WITH spend AS (
  SELECT o_custkey AS c,
         CASE WHEN o_orderdate < TIMESTAMP '{_SPLIT_DATE} 00:00:00'
              THEN 1 ELSE 2 END AS h,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
cuts AS (
  SELECT h, quantile_cont(cents, 1.0 / 3) AS t1,
         quantile_cont(cents, 2.0 / 3) AS t2
  FROM spend GROUP BY h
),
seg AS (
  SELECT s.c, s.h,
         CASE WHEN CAST(s.cents AS DOUBLE) <= cuts.t1 THEN 1
              WHEN CAST(s.cents AS DOUBLE) <= cuts.t2 THEN 2
              ELSE 3 END AS seg
  FROM spend s JOIN cuts ON cuts.h = s.h
),
m AS (
  SELECT COALESCE(a.seg, 0) AS seg_h1, COALESCE(b.seg, 0) AS seg_h2
  FROM (SELECT c, seg FROM seg WHERE h = 1) a
  FULL JOIN (SELECT c, seg FROM seg WHERE h = 2) b ON b.c = a.c
)
SELECT seg_h1, seg_h2, count(*) AS n_customers
FROM m GROUP BY 1, 2
ORDER BY seg_h1, seg_h2
"""


QUERIES["customer_segment_migration"] = (customer_segment_migration,
                                         MIGRATION_SQL)


_SLA_DAYS = [30, 60, 90]


def orders_shipping_sla(spark: SparkSession, sf: str) -> DataFrame:
    """SLA attainment: share of lineitems shipped within 30/60/90 days
    of their order date, per order priority — one fact join + one agg
    with conditional sums (the three windows reuse a single datediff),
    ratios exact floor-micro."""
    o = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority",
                                      "o_orderdate")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    dd = F.datediff(F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"))
    aggs = [F.count(F.lit(1)).alias("n_items")]
    for d in _SLA_DAYS:
        aggs.append(F.sum(F.when(dd <= d, 1).otherwise(0))
                    .alias(f"w_{d}"))
    s = j.groupBy("o_orderpriority").agg(*aggs)
    cols = ["o_orderpriority", "n_items"]
    sel = [F.col(c) for c in cols]
    for d in _SLA_DAYS:
        sel.append(F.floor(F.col(f"w_{d}") * 1000000 / F.col("n_items"))
                   .cast("long").alias(f"sla_{d}d_micro"))
    return s.select(*sel).orderBy("o_orderpriority")


SLA_SQL = f"""
WITH j AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE),
                   CAST(l.l_shipdate AS DATE)) AS dd
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
s AS (
  SELECT o_orderpriority, count(*) AS n_items,
         {", ".join(
             f"sum(CASE WHEN dd <= {d} THEN 1 ELSE 0 END) AS w_{d}"
             for d in _SLA_DAYS)}
  FROM j GROUP BY 1
)
SELECT o_orderpriority, CAST(n_items AS BIGINT) AS n_items,
       {", ".join(
           f"CAST(floor(w_{d} * 1000000 / n_items) AS BIGINT)"
           f" AS sla_{d}d_micro" for d in _SLA_DAYS)}
FROM s
ORDER BY o_orderpriority
"""


QUERIES["orders_shipping_sla"] = (orders_shipping_sla, SLA_SQL)
