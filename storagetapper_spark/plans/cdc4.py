"""CDC monitoring batch 4: out-of-order arrival rate and key-churn
histogram — the feed-health diagnostics next to cdc_seqno_gaps /
feed_freshness (reference: the seqno monotonicity contract,
changelog/mysql.go:396-402, and the per-key update stream the buffered
pipe reorders).

The changelog view derives deterministically from the events fixture
as in cdc3.py: event_id is ARRIVAL order (the reader's seqno), ts is
COMMIT time, user_id is the row key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import events_t


def cdc_out_of_order_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Per stream shard (event_id % 4): how many events ARRIVE behind a
    later-committed event of the same key (ts < running max ts over
    earlier arrivals)?  High rates break latest-state reads that trust
    arrival order and force the seqno-based winner selection the merge
    operators use (operators/merge.py).  One key-ordered window pass;
    the shard rollup is a 4-row agg."""
    ev = events_t(spark, sf)
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    run_max = F.max(F.col("ts").cast("double")).over(w)
    tagged = ev.select(
        (F.col("event_id") % 4).alias("shard"),
        F.when(F.col("ts").cast("double") < run_max, 1).otherwise(0)
        .alias("ooo"))
    return (tagged.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("ooo").alias("n_out_of_order"))
            .select("shard", "n_events", "n_out_of_order",
                    F.floor(F.col("n_out_of_order") * 1000000
                            / F.col("n_events")).cast("long")
                    .alias("ooo_rate_micro"))
            .orderBy("shard"))


OOO_SQL = """
WITH tagged AS (
  SELECT event_id % 4 AS shard,
         CASE WHEN epoch(ts) < max(epoch(ts)) OVER
                (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS ooo
  FROM events
)
SELECT shard, count(*) AS n_events,
       CAST(sum(ooo) AS BIGINT) AS n_out_of_order,
       CAST(floor(sum(ooo) * 1000000 / count(*)) AS BIGINT)
         AS ooo_rate_micro
FROM tagged
GROUP BY shard
ORDER BY shard
"""


QUERIES = {
    "cdc_out_of_order_rate": (cdc_out_of_order_rate, OOO_SQL),
}


_CHURN_EDGES = [1, 5, 20]  # bucket upper bounds; last bucket open


def cdc_key_churn_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Update-frequency histogram over row keys: how many keys got
    1 / 2-5 / 6-20 / 21+ changelog events.  The skew readout that
    decides whether latest-state compaction needs salting (a few
    ultra-hot keys) or not — companion to profile_key_skew, on the CDC
    feed.  Two map-side-combinable aggs (per-key count, then per-bucket
    count); shares are exact floor-micro.  The key is (user, day) —
    the daily-partition granularity the compaction job actually
    processes."""
    ev = events_t(spark, sf)
    per_key = (ev.groupBy("user_id",
                          F.col("ts").cast("date").alias("day"))
               .agg(F.count(F.lit(1)).alias("n_ops")))
    b = (F.when(F.col("n_ops") <= _CHURN_EDGES[0], "1_single")
         .when(F.col("n_ops") <= _CHURN_EDGES[1], "2_low")
         .when(F.col("n_ops") <= _CHURN_EDGES[2], "3_mid")
         .otherwise("4_hot"))
    tot = per_key.agg(F.count(F.lit(1)).alias("n_keys"),
                      F.sum("n_ops").alias("n_ops_total"))
    return (per_key.select(b.alias("bucket"), "n_ops")
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_keys_in_bucket"),
                 F.sum("n_ops").alias("n_ops_in_bucket"))
            .crossJoin(F.broadcast(tot))
            .select("bucket", "n_keys_in_bucket", "n_ops_in_bucket",
                    F.floor(F.col("n_keys_in_bucket") * 1000000
                            / F.col("n_keys")).cast("long")
                    .alias("key_share_micro"),
                    F.floor(F.col("n_ops_in_bucket") * 1000000
                            / F.col("n_ops_total")).cast("long")
                    .alias("ops_share_micro"))
            .orderBy("bucket"))


CHURN_SQL = f"""
WITH per_key AS (
  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS n_ops
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT count(*) AS n_keys, CAST(sum(n_ops) AS BIGINT) AS n_ops_total
  FROM per_key
),
bucketed AS (
  SELECT CASE WHEN n_ops <= {_CHURN_EDGES[0]} THEN '1_single'
              WHEN n_ops <= {_CHURN_EDGES[1]} THEN '2_low'
              WHEN n_ops <= {_CHURN_EDGES[2]} THEN '3_mid'
              ELSE '4_hot' END AS bucket,
         n_ops
  FROM per_key
)
SELECT b.bucket, count(*) AS n_keys_in_bucket,
       CAST(sum(b.n_ops) AS BIGINT) AS n_ops_in_bucket,
       CAST(floor(count(*) * 1000000 / t.n_keys) AS BIGINT)
         AS key_share_micro,
       CAST(floor(sum(b.n_ops) * 1000000 / t.n_ops_total) AS BIGINT)
         AS ops_share_micro
FROM bucketed b CROSS JOIN tot t
GROUP BY b.bucket, t.n_keys, t.n_ops_total
ORDER BY b.bucket
"""


QUERIES["cdc_key_churn_histogram"] = (cdc_key_churn_histogram, CHURN_SQL)


def cdc_tombstone_gc_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Log-compaction GC plan: which delete tombstones are safely
    reclaimable?  A tombstone is the key's LATEST op (op = 'delete',
    nothing newer) and is GC-eligible once it has aged past the
    retention watermark (horizon − 7 days) — the Kafka
    delete.retention.ms / RocksDB compaction-filter rule; dropping a
    younger tombstone risks resurrecting the key on replay of an
    older insert (reference analog: the is_deleted row marker,
    encoder/avro.go:109-119, which downstream compaction consumes).

    One key-ordered WindowGroupLimit pass picks each key's latest op
    (the cdc_latest_state shuffle shape); the GC verdict is a per-day
    rollup of eligible vs retained tombstones — grid-sized output."""
    ev = events_t(spark, sf)
    cdc = ev.select(
        F.col("user_id").alias("row_key"),
        F.col("event_id").cast("long").alias("seqno"),
        "ts",
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update").alias("op"))
    w = Window.partitionBy("row_key").orderBy(F.desc("seqno"))
    latest = (cdc.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1))
    horizon = ev.agg(F.max(F.col("ts").cast("double")).alias("h"))
    tomb = (latest.filter(F.col("op") == "delete")
            .crossJoin(F.broadcast(horizon))
            .select(F.to_date("ts").alias("d"),
                    ((F.col("h") - F.col("ts").cast("double"))
                     >= 7 * 86400).cast("int").alias("gc_eligible")))
    return (tomb.groupBy("d")
            .agg(F.count(F.lit(1)).alias("n_tombstones"),
                 F.sum("gc_eligible").alias("n_gc_eligible"),
                 (F.count(F.lit(1)) - F.sum("gc_eligible"))
                 .alias("n_retained"))
            .orderBy("d"))


TOMBSTONE_GC_SQL = """
WITH cdc AS (
  SELECT user_id AS row_key, CAST(event_id AS BIGINT) AS seqno, ts,
         CASE WHEN event_type = 'signup' THEN 'insert'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'update' END AS op
  FROM events
),
latest AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY row_key
                                 ORDER BY seqno DESC) AS rn
    FROM cdc) WHERE rn = 1
),
horizon AS (SELECT max(epoch(ts)) AS h FROM events),
tomb AS (
  SELECT CAST(ts AS DATE) AS d,
         CASE WHEN h - epoch(ts) >= 7 * 86400 THEN 1 ELSE 0 END
           AS gc_eligible
  FROM latest, horizon WHERE op = 'delete'
)
SELECT d, count(*) AS n_tombstones,
       CAST(sum(gc_eligible) AS BIGINT) AS n_gc_eligible,
       CAST(count(*) - sum(gc_eligible) AS BIGINT) AS n_retained
FROM tomb GROUP BY d ORDER BY d
"""


QUERIES["cdc_tombstone_gc_plan"] = (cdc_tombstone_gc_plan,
                                    TOMBSTONE_GC_SQL)
