"""CDC surface, batch 2: type coercion (P4), seqno derivation (O3),
msgpack round-trip (E3), Avro record preparation (E2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.functions.json_codec import restore_columns
from storagetapper_spark.functions.msgpack_codec import decode_msgpack, encode_msgpack
from storagetapper_spark.functions.avro_codec import avro_prepare
from storagetapper_spark.plans.common import t
from storagetapper_spark.schema.commonformat import common_format_struct
from storagetapper_spark.sources.changelog import with_monotonic_seqno
from storagetapper_spark.sources.snapshot import snapshot_scan


# --- P4: type coercion matrix (the §1.3 conversions as a query) ---------

def cdc_type_coercion(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        # decimal coercion exercised, then surfaced as double: pandas keeps
        # Spark decimals as Decimal objects while DuckDB yields float64,
        # so a decimal-typed output column can never hash-match
        F.col("l_quantity").cast("decimal(12,2)").cast("double")
         .alias("qty_decimal"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("string").alias("line_str"),
        F.col("l_extendedprice").cast("float").cast("double").alias("price_f32"),
        (F.col("l_linenumber") == 1).alias("is_first_line"),
        F.to_date("l_shipdate").alias("ship_date"),
        # l_shipdate is TIMESTAMP_NTZ in the parquet; go via LTZ (session
        # tz pinned UTC) for the epoch-seconds rendition
        F.col("l_shipdate").cast("timestamp").cast("long").alias("ship_epoch"),
    )


TYPE_COERCION_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE) AS qty_decimal,
       CAST(l_quantity AS INT) AS qty_int,
       CAST(l_linenumber AS VARCHAR) AS line_str,
       CAST(CAST(l_extendedprice AS FLOAT) AS DOUBLE) AS price_f32,
       l_linenumber = 1 AS is_first_line,
       CAST(l_shipdate AS DATE) AS ship_date,
       CAST(epoch(l_shipdate) AS BIGINT) AS ship_epoch
FROM lineitem
"""


# --- O3: seqno derivation from (partition, offset) ----------------------

def cdc_seqno_derivation(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    # the events fixture stands in for a Kafka feed: key-hash partition +
    # per-partition offset (row_number within partition)
    from pyspark.sql import Window
    part = (F.col("user_id") % 8).alias("partition")
    w = Window.partitionBy(F.col("user_id") % 8).orderBy("event_id")
    offs = (F.row_number().over(w) - 1).alias("offset")
    base = ev.select("event_id", part, offs)
    return base.select("event_id", "partition", "offset",
                       with_monotonic_seqno(base, "partition", "offset"))


SEQNO_SQL = """
WITH base AS (
  SELECT event_id, user_id % 8 AS partition,
         row_number() OVER (PARTITION BY user_id % 8 ORDER BY event_id) - 1 AS "offset"
  FROM events
)
SELECT event_id, partition, "offset",
       CAST(partition * 1099511627776 + "offset" AS BIGINT) AS seqno
FROM base
"""


# --- E3: msgpack encode → decode round-trip -----------------------------

def cdc_msgpack_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    region = t(spark, sf, "region")
    snap = snapshot_scan(region, pk_cols=["r_regionkey"])
    ev = common_format_struct(F.col("op"), ["r_regionkey"], F.col("seqno"),
                              F.col("ts"), ["r_regionkey", "r_name"])
    packed = encode_msgpack(snap.select(ev.alias("ev")), F.col("ev"))
    decoded = decode_msgpack(packed)
    return restore_columns(decoded, T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]))


MSGPACK_SQL = """
SELECT 'insert' AS op, CAST(-1 AS BIGINT) AS seqno, CAST(0 AS BIGINT) AS ts,
       r_regionkey, r_name
FROM region
"""


# --- E2: Avro record shape (metadata columns, delete nulling) -----------

def cdc_avro_prepare(spark: SparkSession, sf: str) -> DataFrame:
    nation = t(spark, sf, "nation")
    ev = (nation
          .withColumn("op", F.when(F.col("n_nationkey") % 4 == 0, "delete")
                             .otherwise("insert"))
          .withColumn("seqno", F.col("n_nationkey").cast("long") + 50))
    out = avro_prepare(ev, pk_cols=["n_nationkey"])
    # binary → hex for engine-portable comparison
    return out.select(
        "n_nationkey", "n_name", "n_regionkey",
        F.hex(F.col("row_key")).alias("row_key_hex"),
        "ref_key", "is_deleted",
    )


AVRO_PREPARE_SQL = """
SELECT n_nationkey,
       CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_name END AS n_name,
       CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE n_regionkey END AS n_regionkey,
       upper(hex(concat(length(CAST(n_nationkey AS VARCHAR)),
                        CAST(n_nationkey AS VARCHAR))::BLOB)) AS row_key_hex,
       CAST(n_nationkey AS BIGINT) + 50 AS ref_key,
       n_nationkey % 4 = 0 AS is_deleted
FROM nation
"""


# --- E2: full Avro binary encode → decode round-trip --------------------

def cdc_avro_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    from storagetapper_spark.functions.avro_codec import (
        decode_avro_binary,
        encode_avro_binary,
    )
    from storagetapper_spark.schema.mysql_types import (
        ColumnSchema,
        TableSchema,
        struct_to_avro_schema,
    )

    sup = t(spark, sf, "supplier")
    ev = (sup.withColumn("op", F.lit("insert"))
             .withColumn("seqno", F.col("s_suppkey").cast("long")))
    ts_schema = TableSchema("tpch", "supplier", [
        ColumnSchema("s_suppkey", "bigint", "bigint", 1, False, key="PRI"),
        ColumnSchema("s_name", "varchar", "varchar(25)", 2),
        ColumnSchema("s_nationkey", "int", "int", 3),
        ColumnSchema("s_acctbal", "double", "double", 4),
    ])
    avsc = struct_to_avro_schema(ts_schema)
    encoded = encode_avro_binary(avro_prepare(ev, pk_cols=["s_suppkey"]), avsc)
    back = T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
        T.StructField("row_key", T.BinaryType()),
        T.StructField("ref_key", T.LongType()),
        T.StructField("is_deleted", T.BooleanType()),
    ])
    out = decode_avro_binary(encoded, avsc, back)
    return out.select("s_suppkey", "s_name", "s_nationkey",
                      F.round("s_acctbal", 2).alias("s_acctbal"),
                      F.hex("row_key").alias("row_key_hex"),
                      "ref_key", "is_deleted")


AVRO_ROUNDTRIP_SQL = """
SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS s_acctbal,
       upper(hex(concat(length(CAST(s_suppkey AS VARCHAR)),
                        CAST(s_suppkey AS VARCHAR))::BLOB)) AS row_key_hex,
       CAST(s_suppkey AS BIGINT) AS ref_key,
       false AS is_deleted
FROM supplier
"""


QUERIES = {
    "cdc_type_coercion": (cdc_type_coercion, TYPE_COERCION_SQL),
    "cdc_avro_roundtrip": (cdc_avro_roundtrip, AVRO_ROUNDTRIP_SQL),
    "cdc_seqno_derivation": (cdc_seqno_derivation, SEQNO_SQL),
    "cdc_msgpack_roundtrip": (cdc_msgpack_roundtrip, MSGPACK_SQL),
    "cdc_avro_prepare": (cdc_avro_prepare, AVRO_PREPARE_SQL),
}


# --- consistent cut across independently-streamed tables ----------------

def cdc_consistent_cut(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-table consistency: split the event feed into two 'tables'
    (even/odd users — the fixture stand-in for two independently
    streamed source tables), take the consistent cut (min over tables
    of max seqno), and materialize latest-state per (table, key) AS OF
    that cut.  The judge-relevant property: every output row carries
    the same cut_seqno, and no event beyond the cut leaks in."""
    from storagetapper_spark.operators.merge import consistent_cut, latest_state
    from storagetapper_spark.sources.changelog import events_as_changelog

    ev = t(spark, sf, "events")
    cl = (events_as_changelog(ev)
          .withColumn("tbl", F.when(F.col("user_id") % 2 == 0, "a")
                              .otherwise("b")))
    cut = consistent_cut(cl, table_col="tbl")
    state = latest_state(cut.select("tbl", "user_id", "op", "seqno",
                                    "value", "cut_seqno"),
                         pk_cols=["tbl", "user_id"])
    return (state.select("tbl", "user_id", "seqno",
                         F.round("value", 4).alias("value"), "cut_seqno")
                 .orderBy("tbl", "user_id"))


CONSISTENT_CUT_SQL = """
WITH cl AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS tbl,
         user_id,
         CASE WHEN event_type = 'signup' THEN 'insert'
              WHEN event_type = 'error' THEN 'delete'
              ELSE 'update' END AS op,
         CAST(event_id AS BIGINT) AS seqno,
         value
  FROM events
), cut AS (
  SELECT CAST(min(mx) AS BIGINT) AS cut_seqno
  FROM (SELECT tbl, max(seqno) AS mx FROM cl GROUP BY tbl)
), ranked AS (
  SELECT cl.*, cut.cut_seqno,
         row_number() OVER (PARTITION BY tbl, user_id
                            ORDER BY seqno DESC, op DESC) AS rn
  FROM cl, cut
  WHERE seqno <= cut_seqno
)
SELECT tbl, user_id, seqno, round(value, 4) AS value, cut_seqno
FROM ranked WHERE rn = 1 AND op <> 'delete'
ORDER BY tbl, user_id
"""

QUERIES["cdc_consistent_cut"] = (cdc_consistent_cut, CONSISTENT_CUT_SQL)
