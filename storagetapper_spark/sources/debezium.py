"""Debezium envelope adapter (S2 made real-world usable, VERDICT r3 #9).

The reference parses MySQL ROW binlog directly (changelog/mysql.go:
508-968, GTID resume :1019-1043).  The Spark-first stance is to consume
an already-externalized CDC feed — and the de-facto wire format for
that is Debezium's envelope:

    {"before": {...}|null, "after": {...}|null, "op": "c|r|u|d",
     "ts_ms": 1700000000000,
     "source": {"gtid": "...", "file": "binlog.000001", "pos": 4711,
                "db": "...", "table": "..."}}

(optionally wrapped as {"schema": ..., "payload": <envelope>} when the
connector runs with schemas enabled).

``parse_debezium`` normalizes that to the engine's op/seqno/row_key
contract (the exact mapping of changelog/mysql.go:530-538):

    c (create) / r (snapshot read) → insert, image = after
    u (update)                     → update, image = after
                                     (decompose_updates splits it into
                                     delete+insert exactly like the
                                     reference)
    d (delete)                     → delete, image = before

seqno = source.pos when present (binlog position: monotonic per
cluster, changelog/mysql.go:396-402), else ts_ms; gtid rides along for
the registry's resume bookkeeping (record_stream_start).

Everything is from_json + Column expressions — streaming-safe, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEBEZIUM_SOURCE_SCHEMA = T.StructType([
    T.StructField("gtid", T.StringType()),
    T.StructField("file", T.StringType()),
    T.StructField("pos", T.LongType()),
    T.StructField("db", T.StringType()),
    T.StructField("table", T.StringType()),
])


def debezium_envelope_schema(table_schema: T.StructType,
                             wrapped: bool = False) -> T.StructType:
    """The envelope StructType for ``from_json`` given the row schema."""
    env = T.StructType([
        T.StructField("before", table_schema),
        T.StructField("after", table_schema),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("source", DEBEZIUM_SOURCE_SCHEMA),
    ])
    if wrapped:
        return T.StructType([T.StructField("payload", env)])
    return env


def parse_debezium(df: DataFrame, table_schema: T.StructType,
                   pk_cols: list[str], value_col: str = "value",
                   wrapped: bool = False) -> DataFrame:
    """Debezium JSON strings → the engine's changelog contract:
    data columns + op/seqno/row_key/ts (+ gtid for resume points).

    Feed the result straight into ``decompose_updates`` /
    ``latest_state`` / ``incremental_upsert_sink`` — it is the same
    shape ``events_as_changelog`` produces.  Works identically on a
    batch frame and a readStream (pure Column expressions)."""
    schema = debezium_envelope_schema(table_schema, wrapped=wrapped)
    env = F.from_json(F.col(value_col), schema)
    if wrapped:
        env = env["payload"]
    parsed = df.withColumn("_env", env)
    op = (F.when(F.col("_env.op").isin("c", "r"), F.lit("insert"))
          .when(F.col("_env.op") == "u", F.lit("update"))
          .when(F.col("_env.op") == "d", F.lit("delete")))
    image = F.when(F.col("_env.op") == "d", F.col("_env.before")) \
             .otherwise(F.col("_env.after"))
    out = parsed.withColumn("_img", image).withColumn("_op", op)
    cols = [F.col(f"_img.{f.name}").alias(f.name)
            for f in table_schema.fields]
    return (out.where(F.col("_op").isNotNull())
            .select(
                *cols,
                F.col("_op").alias("op"),
                F.coalesce(F.col("_env.source.pos"), F.col("_env.ts_ms"))
                 .cast("long").alias("seqno"),
                F.concat_ws("", *[F.col(f"_img.{c}").cast("string")
                                  for c in pk_cols]).alias("row_key"),
                F.timestamp_millis(F.col("_env.ts_ms")).alias("ts"),
                F.col("_env.source.gtid").alias("gtid")))
