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

seqno orders by (source.file, source.pos): ``file_index << 40 | pos``,
where file_index is the numeric suffix of the binlog file name
("binlog.000007" → 7).  Binlog pos alone resets to 4 on every file
rotation, so pos by itself is NOT monotonic across a feed — the
reference sidesteps this with a strictly monotonic per-reader counter
(changelog/mysql.go nextSeqNo); composing (file, pos) into one long is
the stateless Column-only equivalent and preserves the same total
order.  pos < 2^40 holds for any binlog under 1 TiB (MySQL caps
max_binlog_size at 1 GiB).  ts_ms is NEVER mixed in as a fallback for
rows that lack pos — a wall-clock value is incomparable with a file
offset and would corrupt latest-state winner selection; posless feeds
opt in explicitly with ``seqno_from_ts=True``.  gtid rides along for
the registry's resume bookkeeping (record_stream_start).

row_key uses functions.keys.row_key_expr (length-prefixed PK concat,
encoder/encoder.go:99-126) applied to the row image — byte-identical
to the key snapshot_scan and events_as_changelog emit, so Debezium
changelog rows merge/dedup against snapshot rows, and composite PKs
cannot collide (plain concat would map ('ab','c') and ('a','bc') to
the same key).

Everything is from_json + Column expressions — streaming-safe, no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.functions.keys import row_key_expr

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
                   wrapped: bool = False,
                   seqno_from_ts: bool = False,
                   strict: bool = True) -> DataFrame:
    """Debezium JSON strings → the engine's changelog contract:
    data columns + op/seqno/row_key/ts (+ gtid for resume points).

    Feed the result straight into ``decompose_updates`` /
    ``latest_state`` / ``incremental_upsert_sink`` — it is the same
    shape ``events_as_changelog`` produces.  Works identically on a
    batch frame and a readStream (pure Column expressions).

    ``seqno_from_ts=True`` is for feeds whose connector emits no
    source position at all (e.g. some MongoDB/outbox setups): seqno
    falls back to ts_ms uniformly.  It is all-or-nothing by design —
    mixing per-row pos and ts_ms in one feed breaks the total order
    (see module docstring).

    ``strict=False`` (ADVICE r6): a feed with SPORADIC posless rows
    (e.g. a connector emitting posless snapshot 'r' events) no longer
    aborts the batch/stream — posless rows are EXCLUDED from the
    normalized output; pair with ``quarantine_debezium`` on the same
    raw frame to route them to a dead-letter sink.  The default stays
    fail-loud: silently dropping changelog rows is state corruption
    unless something downstream is watching the quarantine."""
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
    if seqno_from_ts:
        seqno = F.col("_env.ts_ms").cast("long")
    else:
        # (file, pos) composed into one orderable long; regexp_extract
        # yields '' (→ NULL cast) when the file name has no numeric
        # suffix, coalesced to 0 so single-file/fileless-pos feeds
        # still order by pos.
        file_idx = F.coalesce(
            F.regexp_extract(F.col("_env.source.file"), r"(\d+)$", 1)
             .cast("long"),
            F.lit(0))
        # A null pos with seqno_from_ts=False would produce a NULL seqno
        # that silently sorts last in latest_state's ORDER BY seqno DESC
        # (the row always loses winner selection) — fail loudly instead
        # so a feed with sporadically missing pos is surfaced, not
        # silently state-corrupting.  Feeds without pos must opt into
        # seqno_from_ts=True.
        pos = F.col("_env.source.pos")
        if strict:
            seqno = F.when(
                pos.isNotNull(), F.shiftleft(file_idx, 40) + pos
            ).otherwise(F.raise_error(F.concat(
                F.lit("debezium_normalize: null source.pos with "
                      "seqno_from_ts=False (row would get NULL seqno and "
                      "always lose latest-state ordering); op="),
                F.coalesce(F.col("_env.op"), F.lit("?")))))
        else:
            seqno = F.shiftleft(file_idx, 40) + pos
            out = out.where(pos.isNotNull())
    return (out.where(F.col("_op").isNotNull())
            .select(
                *cols,
                F.col("_op").alias("op"),
                seqno.cast("long").alias("seqno"),
                row_key_expr([F.col(f"_img.{c}") for c in pk_cols])
                 .alias("row_key"),
                F.timestamp_millis(F.col("_env.ts_ms")).alias("ts"),
                F.col("_env.source.gtid").alias("gtid")))


def quarantine_debezium(df: DataFrame, table_schema: T.StructType,
                        value_col: str = "value",
                        wrapped: bool = False) -> DataFrame:
    """Dead-letter side of ``parse_debezium(strict=False)``: the raw
    envelopes that parse to a recognized op but carry no source.pos
    (the rows the non-strict normalizer excludes), with the reason and
    whatever ordering hints survive, ready for a file/Kafka sink.
    Pure Column expressions — batch and readStream alike.  A pipeline
    wires both over the SAME raw frame:

        main = parse_debezium(raw, schema, pks, strict=False)
        dead = quarantine_debezium(raw, schema)
    """
    schema = debezium_envelope_schema(table_schema, wrapped=wrapped)
    env = F.from_json(F.col(value_col), schema)
    if wrapped:
        env = env["payload"]
    parsed = df.withColumn("_env", env)
    return (parsed
            .where(F.col("_env.op").isin("c", "r", "u", "d")
                   & F.col("_env.source.pos").isNull())
            .select(F.col(value_col).alias("raw"),
                    F.col("_env.op").alias("op"),
                    F.timestamp_millis(F.col("_env.ts_ms")).alias("ts"),
                    F.col("_env.source.gtid").alias("gtid"),
                    F.lit("null source.pos with seqno_from_ts=False")
                    .alias("reason")))
