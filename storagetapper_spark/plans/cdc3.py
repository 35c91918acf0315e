"""CDC warehouse-maintenance plans: SCD Type-2 history, incremental
aggregate maintenance (IVM), field-level audit, and seqno time travel.

The reference ships only latest-state materialization (encoder/sql.go
MERGE path); these are the standard downstream products a warehouse
builds from the same changelog.  All bind the ``events`` fixture as the
binlog feed (FIXTURES.md §F6) with exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.operators.history import (
    column_audit,
    delta_stream,
    scd2_history,
)
from storagetapper_spark.operators.merge import latest_state
from storagetapper_spark.plans.common import events_t, t
from storagetapper_spark.sources.changelog import (
    decompose_updates,
    events_as_changelog,
)

QUERIES: dict = {}


def _changelog(spark: SparkSession, sf: str) -> DataFrame:
    ev = events_t(spark, sf).select("event_id", "user_id", "event_type",
                                    F.round("value", 2).alias("value"))
    return events_as_changelog(ev)


_CL_SQL = """
  SELECT event_id, user_id, event_type, round(value, 2) AS value,
         CASE WHEN event_type = 'signup' THEN 'insert'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'update' END AS op,
         CAST(event_id AS BIGINT) AS seqno
  FROM events
"""


# --- SCD Type-2 dimension history ---------------------------------------

def cdc_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """Full version history as an SCD2 table: each non-delete changelog
    row is a version valid over [valid_from, valid_to) in seqno space; a
    delete closes the last version.  One window shuffle on the PK."""
    hist = scd2_history(_changelog(spark, sf), pk_cols=["user_id"])
    return hist.select("user_id", "valid_from", "valid_to", "is_current",
                       "event_type", "value")


SCD2_SQL = f"""
WITH cl AS ({_CL_SQL}),
v AS (
  SELECT user_id, event_type, value, op,
         seqno AS valid_from,
         lead(seqno) OVER (PARTITION BY user_id ORDER BY seqno, op)
           AS valid_to
  FROM cl
)
SELECT user_id, valid_from, valid_to,
       valid_to IS NULL AS is_current, event_type, value
FROM v WHERE op <> 'delete'
"""


# --- incremental aggregate maintenance (delta folding == recompute) -----

def cdc_incremental_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Maintain SUM(value)/COUNT(live) per group *incrementally*: fold the
    changelog's signed deltas with a plain SUM instead of re-scanning the
    latest state.  The oracle computes the same aggregate the direct way
    (latest state per key, then GROUP BY) — equality IS the IVM
    invariant.  Deltas are decimal so the fold is order-independent; the exact decimal total is surfaced as
    double (both engines derive the identical bits from the same exact
    decimal, so the check is still bit-exact)."""
    d = delta_stream(_changelog(spark, sf), pk_cols=["user_id"],
                     value_col="value", decimal_type="decimal(18,2)")
    return (d.groupBy((F.col("user_id") % 10).alias("bucket"))
             .agg(F.sum("value_delta").cast("decimal(18,2)")
                    .cast("double").alias("sum_value"),
                  F.sum("live_delta").alias("n_live")))


INCREMENTAL_AGG_SQL = f"""
WITH cl AS ({_CL_SQL}),
ranked AS (
  SELECT cl.*, row_number() OVER (PARTITION BY user_id
                                  ORDER BY seqno DESC, op DESC) AS rn
  FROM cl
),
state AS (SELECT * FROM ranked WHERE rn = 1 AND op <> 'delete')
SELECT b.bucket,
       CAST(CAST(COALESCE(s.sum_value, 0) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value,
       COALESCE(s.n_live, 0) AS n_live
FROM (SELECT DISTINCT user_id % 10 AS bucket FROM events) b
LEFT JOIN (
  SELECT user_id % 10 AS bucket,
         sum(CAST(value AS DECIMAL(18,2))) AS sum_value,
         count(*) AS n_live
  FROM state GROUP BY user_id % 10
) s USING (bucket)
"""


# --- field-level change audit -------------------------------------------

def cdc_column_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Which tracked columns changed at each seqno, per key (null-safe
    consecutive-version diff); no-change rows dropped."""
    audit = column_audit(_changelog(spark, sf), pk_cols=["user_id"],
                         tracked_cols=["event_type", "value"])
    return audit.select("user_id", "seqno", "changed_cols", "n_changed")


COLUMN_AUDIT_SQL = f"""
WITH cl AS ({_CL_SQL}),
d AS (
  SELECT user_id, seqno,
         concat_ws(',',
           CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
                THEN 'event_type' END,
           CASE WHEN value IS DISTINCT FROM lag(value) OVER w
                THEN 'value' END) AS changed_cols,
         (CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
               THEN 1 ELSE 0 END
          + CASE WHEN value IS DISTINCT FROM lag(value) OVER w
                 THEN 1 ELSE 0 END) AS n_changed
  FROM cl
  WINDOW w AS (PARTITION BY user_id ORDER BY seqno)
)
SELECT user_id, seqno, changed_cols, n_changed FROM d WHERE n_changed > 0
"""


# --- time travel: state at a seqno cut ----------------------------------

def cdc_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Reconstruct table state as of a past seqno (the reference's
    resume-from-GTID position, replayed as a query): filter the
    decomposed changelog to seqno <= cut, then latest-state.  The cut
    (60% of max event_id) is a broadcast scalar, not a driver collect."""
    cdc = decompose_updates(_changelog(spark, sf))
    cut = (events_t(spark, sf)
           .agg((F.expr("max(event_id) * 3 div 5") * 2 + 1)
                .cast("long").alias("cut_seqno")))
    at_cut = (cdc.crossJoin(F.broadcast(cut))
                 .where(F.col("seqno") <= F.col("cut_seqno")))
    state = latest_state(at_cut, pk_cols=["user_id"])
    return state.select("user_id", "event_id", "op", "seqno", "value",
                        "cut_seqno")


TIME_TRAVEL_SQL = f"""
WITH cl AS ({_CL_SQL}),
dec AS (
  SELECT event_id, user_id, event_type, value,
         'delete' AS op, seqno * 2 AS seqno
  FROM cl WHERE op = 'update'
  UNION ALL
  SELECT event_id, user_id, event_type, value,
         CASE WHEN op = 'update' THEN 'insert' ELSE op END AS op,
         seqno * 2 + 1 AS seqno
  FROM cl
),
cut AS (SELECT CAST((max(event_id) * 3) // 5 * 2 + 1 AS BIGINT) AS cut_seqno
        FROM events),
ranked AS (
  SELECT dec.*, cut.cut_seqno,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY seqno DESC, op DESC) AS rn
  FROM dec, cut WHERE seqno <= cut_seqno
)
SELECT user_id, event_id, op, seqno, value, cut_seqno
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""




# --- feed integrity: seqno gap / duplicate detection --------------------

def cdc_seqno_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Operational check on the at-least-once feed: per stream shard
    (user_id % 4 stands in for the binlog/Kafka partition), find seqno
    gaps (lost events) and duplicate seqnos (retransmits).  The
    reference trusts seqno monotonicity (changelog/mysql.go:396-402);
    this is the audit that verifies it.  The fixture feed is dense, so
    loss and retransmit are injected deterministically (drop
    event_id%97==13, duplicate event_id%101==7) — the query must
    recover exactly those injections."""
    base = events_t(spark, sf).select(
        (F.col("event_id") % 4).alias("shard"),
        F.col("event_id").cast("long").alias("seqno"))
    lossy = base.where(F.col("seqno") % 97 != 13)
    retrans = base.where(F.col("seqno") % 101 == 7)
    ev = lossy.unionByName(retrans)
    w = Window.partitionBy("shard").orderBy("seqno")
    nxt = F.lead("seqno").over(w)
    gaps = (ev.withColumn("next_seqno", nxt)
              .where(F.col("next_seqno").isNotNull()
                     & (F.col("next_seqno") - F.col("seqno") > 4))
              .select("shard", F.col("seqno").alias("gap_after"),
                      F.col("next_seqno").alias("resumes_at"),
                      ((F.col("next_seqno") - F.col("seqno")) / 4 - 1)
                      .cast("long").alias("missing")))
    dups = (ev.groupBy("shard", "seqno").agg(F.count(F.lit(1)).alias("n"))
              .where(F.col("n") > 1)
              .select("shard", F.col("seqno").alias("gap_after"),
                      F.col("seqno").alias("resumes_at"),
                      (-F.col("n") + 1).alias("missing")))
    return gaps.unionByName(dups)


SEQNO_GAPS_SQL = """
WITH base AS (
  SELECT event_id % 4 AS shard, CAST(event_id AS BIGINT) AS seqno
  FROM events
), ev AS (
  SELECT * FROM base WHERE seqno % 97 <> 13
  UNION ALL
  SELECT * FROM base WHERE seqno % 101 = 7
), gaps AS (
  SELECT shard, seqno AS gap_after,
         lead(seqno) OVER (PARTITION BY shard ORDER BY seqno) AS resumes_at
  FROM ev
)
SELECT shard, gap_after, resumes_at,
       CAST((resumes_at - gap_after) / 4 - 1 AS BIGINT) AS missing
FROM gaps
WHERE resumes_at IS NOT NULL AND resumes_at - gap_after > 4
UNION ALL
SELECT shard, seqno, seqno, CAST(1 - count(*) AS BIGINT)
FROM ev GROUP BY shard, seqno HAVING count(*) > 1
"""




def cdc_scd2_bitemporal(spark: SparkSession, sf: str) -> DataFrame:
    """Bitemporal SCD2: every version carries BOTH validity axes —
    system seqno (when the warehouse learned it) and event time (when
    it was true in the world).  Same single PK window; lead() computed
    once per axis."""
    ev = events_t(spark, sf).select(
        "event_id", "user_id", "event_type", "ts",
        F.round("value", 2).alias("value"))
    cdc = events_as_changelog(ev)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("seqno").asc(),
                                         F.col("op").asc())
    out = (cdc.withColumn("valid_from", F.col("seqno"))
              .withColumn("valid_to", F.lead("seqno").over(w))
              .withColumn("valid_from_ts", F.col("ts"))
              .withColumn("valid_to_ts", F.lead("ts").over(w))
              .where(F.col("op") != "delete")
              .withColumn("is_current", F.col("valid_to").isNull()))
    # event-time bounds emitted as formatted strings: a NULL open bound
    # stays SQL NULL (portable), where a NaT timestamp is harness-hostile
    fmt = "yyyy-MM-dd HH:mm:ss"
    return out.select(
        "user_id", "valid_from", "valid_to",
        F.date_format("valid_from_ts", fmt).alias("valid_from_ts"),
        F.date_format("valid_to_ts", fmt).alias("valid_to_ts"),
        "is_current", "event_type", "value")


SCD2_BITEMPORAL_SQL = f"""
WITH cl AS (
  SELECT event_id, user_id, event_type, ts, round(value, 2) AS value,
         CASE WHEN event_type = 'signup' THEN 'insert'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'update' END AS op,
         CAST(event_id AS BIGINT) AS seqno
  FROM events
),
v AS (
  SELECT user_id, event_type, value, op,
         seqno AS valid_from,
         lead(seqno) OVER w AS valid_to,
         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS valid_from_ts,
         lead(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S')) OVER w AS valid_to_ts
  FROM cl
  WINDOW w AS (PARTITION BY user_id ORDER BY seqno, op)
)
SELECT user_id, valid_from, valid_to, valid_from_ts, valid_to_ts,
       valid_to IS NULL AS is_current, event_type, value
FROM v WHERE op <> 'delete'
"""




# --- portable table checksum (migration validation) ---------------------

def cdc_table_checksum(spark: SparkSession, sf: str) -> DataFrame:
    """Order-independent, engine-portable table checksum — the
    constant-size validation a migration runs on BOTH systems to prove
    the copy (snapshot_diff's cousin with O(groups) output, so two
    100 TB systems exchange bytes, not rows).  Row hash = md5 over a
    canonical string rendering; group fold = bit_xor + count (both
    commutative — partitioning and order can't change the result)."""
    li = t(spark, sf, "lineitem")
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"),
        F.col("l_shipdate").cast("date").cast("string"),
        F.col("l_quantity").cast("decimal(12,2)").cast("string"))
    hashed = li.select(
        "l_returnflag",
        F.conv(F.substring(F.md5(canon), 1, 15), 16, 10)
         .cast("long").alias("_h"))
    return (hashed.groupBy("l_returnflag")
                  .agg(F.count(F.lit(1)).alias("n_rows"),
                       F.expr("bit_xor(_h)").alias("xor_hash")))


TABLE_CHECKSUM_SQL = """
WITH hashed AS (
  SELECT l_returnflag,
         CAST(('0x' || substring(md5(
            CAST(l_orderkey AS VARCHAR) || '|' ||
            CAST(l_linenumber AS VARCHAR) || '|' ||
            l_returnflag || '|' ||
            strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') || '|' ||
            CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR)
         ), 1, 15)) AS BIGINT) AS h
  FROM lineitem
)
SELECT l_returnflag, count(*) AS n_rows, bit_xor(h) AS xor_hash
FROM hashed GROUP BY l_returnflag
"""


QUERIES.update({
    "cdc_scd2_history": (cdc_scd2_history, SCD2_SQL),
    "cdc_incremental_agg": (cdc_incremental_agg, INCREMENTAL_AGG_SQL),
    "cdc_column_audit": (cdc_column_audit, COLUMN_AUDIT_SQL),
    "cdc_time_travel": (cdc_time_travel, TIME_TRAVEL_SQL),
    "cdc_seqno_gaps": (cdc_seqno_gaps, SEQNO_GAPS_SQL),
    "cdc_scd2_bitemporal": (cdc_scd2_bitemporal, SCD2_BITEMPORAL_SQL),
    "cdc_table_checksum": (cdc_table_checksum, TABLE_CHECKSUM_SQL),
})


# --- Debezium envelope normalization (S2 real-world adapter) ------------

def cdc_debezium_normalize(spark: SparkSession, sf: str) -> DataFrame:
    """Round-trip through the Debezium wire format: build envelopes
    {before, after, op: c/u/d, ts_ms, source{gtid,file,pos}} from the
    events feed with to_json (JVM-side), parse them back through
    sources/debezium.parse_debezium (the changelog/mysql.go:530-538 op
    mapping; seqno = file_index<<40 | pos so ordering survives binlog
    file rotation; row_key = length-prefixed PK concat matching
    snapshot_scan), and aggregate the normalized contract.  The oracle
    computes the same mapping straight from the raw feed — equality
    proves the adapter is lossless."""
    from pyspark.sql import types as T

    from storagetapper_spark.sources.debezium import parse_debezium

    ev = events_t(spark, sf).select("user_id", "event_id", "event_type",
                                    "ts", "value")
    row = F.struct(F.col("user_id"), F.col("event_type"), F.col("value"))
    code = (F.when(F.col("event_type") == "signup", F.lit("c"))
            .when(F.col("event_type") == "error", F.lit("d"))
            .otherwise(F.lit("u")))
    envelope = F.to_json(F.struct(
        F.when(code == "d", row).alias("before"),
        F.when(code != "d", row).alias("after"),
        code.alias("op"),
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.struct(
            F.concat(F.lit("uuid:1-"), F.col("event_id")).alias("gtid"),
            F.lit("binlog.000001").alias("file"),
            F.col("event_id").cast("long").alias("pos"),
            F.lit("app").alias("db"), F.lit("events").alias("table"),
        ).alias("source")), {"ignoreNullFields": "false"})
    feed = ev.select(envelope.alias("value"))
    table_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])
    parsed = parse_debezium(feed, table_schema, pk_cols=["user_id"])
    return (parsed.groupBy("op")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("seqno").alias("min_seqno"),
                 F.max("seqno").alias("max_seqno"),
                 F.countDistinct("row_key").alias("n_keys"))
            .orderBy("op"))


DEBEZIUM_SQL = """
WITH m AS (
  SELECT CASE WHEN event_type = 'signup' THEN 'insert'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'update' END AS op,
         -- file 'binlog.000001' → file_index 1; seqno = 1<<40 | pos
         1099511627776 + CAST(event_id AS BIGINT) AS seqno,
         -- length-prefixed row key (encoder.go GetRowKey)
         CAST(LENGTH(CAST(user_id AS VARCHAR)) AS VARCHAR)
           || CAST(user_id AS VARCHAR) AS row_key
  FROM events)
SELECT op, CAST(count(*) AS BIGINT) AS n_events,
       min(seqno) AS min_seqno, max(seqno) AS max_seqno,
       CAST(count(DISTINCT row_key) AS BIGINT) AS n_keys
FROM m GROUP BY op ORDER BY op
"""

QUERIES["cdc_debezium_normalize"] = (cdc_debezium_normalize, DEBEZIUM_SQL)
