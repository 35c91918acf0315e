"""CDC / event-pipeline query plans — the reference's actual operator
surface (SURVEY.md §2.1-2.5) bound to the driver fixtures with DuckDB
oracles.

The ``events`` fixture stands in for the binlog feed (FIXTURES.md §F6);
``customer``/``nation``/``lineitem`` stand in for source tables being
snapshotted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.functions.json_codec import decode_json, encode_json, restore_columns
from storagetapper_spark.functions.sql_codec import encode_sql
from storagetapper_spark.operators.merge import latest_state, snapshot_changelog_merge
from storagetapper_spark.plans.common import t
from storagetapper_spark.sources.changelog import decompose_updates, events_as_changelog
from storagetapper_spark.sources.snapshot import RowFilter, snapshot_scan


# --- snapshot scan: op/seqno/row_key derivation (S1 + P5) ---------------

def cdc_snapshot_scan(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber",
                                         "l_quantity", "l_returnflag")
    return snapshot_scan(li, pk_cols=["l_orderkey", "l_linenumber"])


SNAPSHOT_SCAN_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
       'insert' AS op, CAST(-1 AS BIGINT) AS seqno,
       concat(length(CAST(l_orderkey AS VARCHAR)), CAST(l_orderkey AS VARCHAR),
              length(CAST(l_linenumber AS VARCHAR)), CAST(l_linenumber AS VARCHAR)) AS row_key,
       CAST(0 AS BIGINT) AS ts
FROM lineitem
"""


# --- snapshot with row filters + column pruning (P1 + P2) ---------------

def cdc_snapshot_filtered(spark: SparkSession, sf: str) -> DataFrame:
    cust = t(spark, sf, "customer")
    filters = [
        RowFilter("c_mktsegment", ["BUILDING", "MACHINERY"], "=", "or"),
        RowFilter("c_acctbal", [100.0], ">", "and"),
    ]
    # output schema drops c_acctbal+c_nationkey; PK (c_custkey) protected
    return snapshot_scan(cust, pk_cols=["c_custkey"], filters=filters,
                         output_columns=["c_name", "c_mktsegment"])


SNAPSHOT_FILTERED_SQL = """
SELECT c_custkey, c_name, c_mktsegment,
       'insert' AS op, CAST(-1 AS BIGINT) AS seqno,
       concat(length(CAST(c_custkey AS VARCHAR)), CAST(c_custkey AS VARCHAR)) AS row_key,
       CAST(0 AS BIGINT) AS ts
FROM customer
WHERE (c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY')
  AND c_acctbal > 100.0
"""


# --- update → delete+insert decomposition (S3) --------------------------

def cdc_decompose_updates(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events").select("event_id", "user_id", "event_type", "value")
    cdc = events_as_changelog(ev)
    out = decompose_updates(cdc)
    return out.select("event_id", "user_id", "row_key", "op", "seqno",
                      F.round("value", 2).alias("value"))


DECOMPOSE_SQL = """
SELECT event_id, user_id, CAST(user_id AS VARCHAR) AS row_key,
       'delete' AS op, CAST(event_id * 2 AS BIGINT) AS seqno,
       round(value, 2) AS value
FROM events WHERE event_type NOT IN ('signup', 'error')
UNION ALL
SELECT event_id, user_id, CAST(user_id AS VARCHAR) AS row_key,
       CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS op,
       CAST(event_id * 2 + 1 AS BIGINT) AS seqno,
       round(value, 2) AS value
FROM events
"""


# --- latest-state materialization: max-seqno wins (E5/O1 semantics) -----

def cdc_latest_state(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events").select("event_id", "user_id", "event_type", "value")
    cdc = events_as_changelog(ev)  # op: signup→insert, error→delete, else update
    decomposed = decompose_updates(cdc)
    return latest_state(decomposed, pk_cols=["user_id"]) \
        .select("user_id", "event_id", "op", "seqno", F.round("value", 2).alias("value"))


def cdc_latest_state_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Same semantics via the max_by aggregation strategy (the
    alternative to the WindowGroupLimit plan in operators/merge.py) —
    an identical oracle row proves both physical strategies agree."""
    ev = t(spark, sf, "events").select("event_id", "user_id", "event_type", "value")
    decomposed = decompose_updates(events_as_changelog(ev))
    return latest_state(decomposed, pk_cols=["user_id"], strategy="agg") \
        .select("user_id", "event_id", "op", "seqno", F.round("value", 2).alias("value"))


LATEST_STATE_SQL = """
WITH cdc AS (
  SELECT event_id, user_id, 'delete' AS op, CAST(event_id * 2 AS BIGINT) AS seqno, value
  FROM events WHERE event_type NOT IN ('signup', 'error')
  UNION ALL
  SELECT event_id, user_id,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS op,
         CAST(event_id * 2 + 1 AS BIGINT) AS seqno, value
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seqno DESC, op DESC) AS rn
  FROM cdc
)
SELECT user_id, event_id, op, seqno, round(value, 2) AS value
FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


# --- snapshot ↔ changelog merge (O1, the signature construct) -----------

def cdc_snapshot_changelog_merge(spark: SparkSession, sf: str) -> DataFrame:
    cust = t(spark, sf, "customer")
    snap = (cust.select("c_custkey", F.round("c_acctbal", 2).alias("balance"))
                .withColumn("op", F.lit("insert"))
                .withColumn("seqno", F.lit(-1).cast("long")))
    orders = t(spark, sf, "orders")
    # synthetic changelog: each order updates the customer's balance;
    # finalized ('F') orders delete the key — exercises delete-wins.
    log = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.round("o_totalprice", 2).alias("balance"),
        F.when(F.col("o_orderstatus") == "F", "delete").otherwise("insert").alias("op"),
        F.col("o_orderkey").cast("long").alias("seqno"),
    )
    return snapshot_changelog_merge(snap, log, pk_cols=["c_custkey"]) \
        .select("c_custkey", "balance", "op", "seqno")


MERGE_SQL = """
WITH unioned AS (
  SELECT c_custkey, round(c_acctbal, 2) AS balance, 'insert' AS op,
         CAST(-1 AS BIGINT) AS seqno
  FROM customer
  UNION ALL
  SELECT o_custkey AS c_custkey, round(o_totalprice, 2) AS balance,
         CASE WHEN o_orderstatus = 'F' THEN 'delete' ELSE 'insert' END AS op,
         CAST(o_orderkey AS BIGINT) AS seqno
  FROM orders
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seqno DESC, op DESC) AS rn
  FROM unioned
)
SELECT c_custkey, balance, op, seqno FROM ranked WHERE rn = 1 AND op <> 'delete'
"""


# --- JSON common-format encode → decode round-trip (E1) -----------------

def cdc_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    nation = t(spark, sf, "nation")
    snap = snapshot_scan(nation, pk_cols=["n_nationkey"])
    encoded = encode_json(snap, pk_cols=["n_nationkey"])
    decoded = decode_json(encoded)
    schema = T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ])
    return restore_columns(decoded, schema)


JSON_ROUNDTRIP_SQL = """
SELECT 'insert' AS op, CAST(-1 AS BIGINT) AS seqno, CAST(0 AS BIGINT) AS ts,
       n_nationkey, n_name, n_regionkey
FROM nation
"""


# --- row-key extraction over composite PK (P5) --------------------------

def cdc_row_key(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    from storagetapper_spark.functions.keys import row_key_expr
    return li.select(
        "l_orderkey", "l_linenumber",
        row_key_expr(["l_orderkey", "l_linenumber"]).alias("row_key"),
    )


ROW_KEY_SQL = """
SELECT l_orderkey, l_linenumber,
       concat(length(CAST(l_orderkey AS VARCHAR)), CAST(l_orderkey AS VARCHAR),
              length(CAST(l_linenumber AS VARCHAR)), CAST(l_linenumber AS VARCHAR)) AS row_key
FROM lineitem
"""


# --- SQL statement encoder (E4) -----------------------------------------

def cdc_sql_encoder(spark: SparkSession, sf: str) -> DataFrame:
    nation = t(spark, sf, "nation")
    ev = (nation.withColumn("op", F.when(F.col("n_nationkey") % 5 == 0, "delete")
                                   .otherwise("insert"))
                .withColumn("seqno", F.col("n_nationkey").cast("long") + 100))
    return encode_sql(ev, table="nation_out", pk_cols=["n_nationkey"], dialect="mysql")


SQL_ENCODER_SQL = r"""
SELECT CAST(n_nationkey AS BIGINT) + 100 AS seqno,
       CASE WHEN n_nationkey % 5 = 0 THEN
         concat('DELETE FROM `nation_out` WHERE `n_nationkey`=',
                CAST(n_nationkey AS VARCHAR), ';')
       ELSE
         concat('INSERT INTO `nation_out` (`seqno`, `n_nationkey`, `n_name`, `n_regionkey`) VALUES ( ',
                CAST(CAST(n_nationkey AS BIGINT) + 100 AS VARCHAR), ', ',
                CAST(n_nationkey AS VARCHAR), ', ',
                '''', replace(n_name, '''', ''''''), '''', ', ',
                CAST(n_regionkey AS VARCHAR), ' );')
       END AS stmt
FROM nation
"""


# --- idempotent upsert encoder (E5) -------------------------------------

def cdc_sql_encoder_idempotent(spark: SparkSession, sf: str) -> DataFrame:
    region = t(spark, sf, "region")
    ev = (region.withColumn("op", F.lit("insert"))
                .withColumn("seqno", F.col("r_regionkey").cast("long") + 7))
    return encode_sql(ev, table="region_out", pk_cols=["r_regionkey"],
                      dialect="ansisql", idempotent=True)


SQL_IDEMPOTENT_SQL = r"""
SELECT CAST(r_regionkey AS BIGINT) + 7 AS seqno,
       concat('INSERT INTO "region_out" ("seqno", "r_regionkey", "r_name") VALUES ( ',
              CAST(CAST(r_regionkey AS BIGINT) + 7 AS VARCHAR), ', ',
              CAST(r_regionkey AS VARCHAR), ', ',
              '''', replace(r_name, '''', ''''''), '''',
              ' ) ON DUPLICATE KEY UPDATE ',
              '"r_regionkey"=IF("seqno" < VALUES("seqno"), VALUES("r_regionkey"), "r_regionkey"), ',
              '"r_name"=IF("seqno" < VALUES("seqno"), VALUES("r_name"), "r_name"), ',
              '"seqno"=IF("seqno" < VALUES("seqno"), VALUES("seqno"), "seqno");') AS stmt
FROM region
"""


# --- seqno dedup: drop retransmitted events (K2 at-least-once cleanup) --

def cdc_dedup_retransmit(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events").select("event_id", "user_id", "event_type", "value")
    # simulate at-least-once redelivery: events with k_mod 10 == 0 appear twice
    dup = ev.filter(F.col("event_id") % 10 == 0)
    stream = ev.unionByName(dup)
    return (stream.dropDuplicates(["event_id"])
                  .select("event_id", "user_id", "event_type",
                          F.round("value", 2).alias("value")))


DEDUP_RETRANSMIT_SQL = """
WITH stream AS (
  SELECT event_id, user_id, event_type, value FROM events
  UNION ALL
  SELECT event_id, user_id, event_type, value FROM events WHERE event_id % 10 = 0
)
SELECT DISTINCT event_id, user_id, event_type, round(value, 2) AS value
FROM stream
"""


QUERIES = {
    "cdc_snapshot_scan": (cdc_snapshot_scan, SNAPSHOT_SCAN_SQL),
    "cdc_snapshot_filtered": (cdc_snapshot_filtered, SNAPSHOT_FILTERED_SQL),
    "cdc_decompose_updates": (cdc_decompose_updates, DECOMPOSE_SQL),
    "cdc_latest_state": (cdc_latest_state, LATEST_STATE_SQL),
    "cdc_latest_state_agg": (cdc_latest_state_agg, LATEST_STATE_SQL),
    "cdc_snapshot_changelog_merge": (cdc_snapshot_changelog_merge, MERGE_SQL),
    "cdc_json_roundtrip": (cdc_json_roundtrip, JSON_ROUNDTRIP_SQL),
    "cdc_row_key": (cdc_row_key, ROW_KEY_SQL),
    "cdc_sql_encoder": (cdc_sql_encoder, SQL_ENCODER_SQL),
    "cdc_sql_encoder_idempotent": (cdc_sql_encoder_idempotent, SQL_IDEMPOTENT_SQL),
    "cdc_dedup_retransmit": (cdc_dedup_retransmit, DEDUP_RETRANSMIT_SQL),
}
