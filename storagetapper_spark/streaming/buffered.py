"""Buffered two-stage pipeline (O2, streamer/buffer.go + main.go:98-111).

Reference topology: changelog reader → buffer pipe (Kafka topic / local
channel) → streamer re-encodes to the final output format.  The buffer
decouples binlog reading from (possibly slow) output encoding and lets
the stages run on different nodes.

Spark rendition: two jobs chained over a buffer directory (a
checkpointed Kafka topic in production):

  stage 1 (write_buffer):     cdc frame → common-format encode →
                              envelope wrap → append to buffer
  stage 2 (stream_from_buffer): buffer → skip-decode passthrough |
                              re-encode → (key, seqno, value) for a sink

Skip-decode passthrough (buffer.go:78-87): when the buffered payload is
already in the output format, stage 2 forwards the bytes — decided by a
column test on the envelope header, so passthrough rows never enter the
decode path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.functions.envelope import unwrap_df, wrap_df
from storagetapper_spark.functions.keys import row_key_expr
from storagetapper_spark.schema.commonformat import common_format_struct


def encode_json_value(df: DataFrame, pk_cols: list[str]) -> Column:
    """The common-format JSON value expression (projection-composable
    form of functions.json_codec.encode_json)."""
    field_cols = [c for c in df.columns
                  if c not in ("op", "seqno", "ts", "row_key", "_k")]
    ts = F.col("ts") if "ts" in df.columns else F.lit(0)
    ins = common_format_struct(F.col("op"), pk_cols, F.col("seqno"), ts, field_cols)
    dele = common_format_struct(F.col("op"), pk_cols, F.col("seqno"), ts, [])
    ev = F.when(F.col("op") == "delete", dele).otherwise(ins)
    return F.to_json(ev, {"ignoreNullFields": "false"})


def _event_struct(df: DataFrame, pk_cols: list[str]):
    field_cols = [c for c in df.columns
                  if c not in ("op", "seqno", "ts", "row_key", "_k")]
    ts = F.col("ts") if "ts" in df.columns else F.lit(0)
    ins = common_format_struct(F.col("op"), pk_cols, F.col("seqno"), ts, field_cols)
    dele = common_format_struct(F.col("op"), pk_cols, F.col("seqno"), ts, [])
    return F.when(F.col("op") == "delete", dele).otherwise(ins)


def write_buffer(cdc: DataFrame, pk_cols: list[str], buffer_dir: str,
                 buffer_format: str = "json") -> None:
    """Stage 1: encode IN THE BUFFER FORMAT (json or msgpack, the
    reference's two buffer codecs — config/config.go:206) +
    envelope-wrap + append to the buffer.  Buffer records are binary
    parquet rows locally (Kafka records in prod)."""
    if buffer_format == "msgpack":
        from storagetapper_spark.functions.msgpack_codec import encode_msgpack_udf

        value = encode_msgpack_udf()(_event_struct(cdc, pk_cols))
    else:
        value = encode_json_value(cdc, pk_cols)
    enc = cdc.select(
        row_key_expr(pk_cols).alias("key"),
        F.col("seqno"),
        value.alias("value"),
    )
    wrapped = wrap_df(enc, buffer_format)
    # binary records, like the Kafka buffer topic (parquet locally; note
    # Spark's base64() is MIME-chunked — unusable for text-line buffers)
    wrapped.write.mode("append").parquet(buffer_dir)


def read_buffer(spark: SparkSession, buffer_dir: str) -> DataFrame:
    """Stage 2 input: (header, payload) from enveloped buffer records."""
    return unwrap_df(spark.read.parquet(buffer_dir))


def stream_from_buffer(spark: SparkSession, buffer_dir: str,
                       output_format: str = "json") -> DataFrame:
    """Stage 2: route by envelope header.  Payloads already in the
    output format are FORWARDED untouched (skip-decode passthrough,
    streamer/buffer.go:78-87); others are decoded per their header
    format and re-encoded (encodeCommonFormat, buffer.go:88-99).

    Returns (key, seqno, value, passthrough); ``value`` is a string for
    json output, binary for msgpack output.
    """
    from storagetapper_spark.schema.commonformat import COMMON_FORMAT_SCHEMA

    buf = read_buffer(spark, buffer_dir)
    val_t = "string" if output_format == "json" else "binary"

    def base(df):
        return [F.col("header.Key").getItem(0).alias("key"),
                F.col("header.SeqNo").alias("seqno")]

    out = (buf.filter(F.col("header.Type") == output_format)
              .select(*base(buf), F.col("payload").cast(val_t).alias("value"),
                      F.lit(True).alias("passthrough")))
    rest = buf.filter(F.col("header.Type") != output_format)
    for src in ("json", "msgpack"):
        if src == output_format:
            continue
        part = rest.filter(F.col("header.Type") == src)
        if src == "json":
            ev = F.from_json(F.col("payload").cast("string"),
                             COMMON_FORMAT_SCHEMA)
        else:
            from storagetapper_spark.functions.msgpack_codec import decode_msgpack_udf

            ev = decode_msgpack_udf()(F.col("payload"))
        if output_format == "json":
            value = F.to_json(ev, {"ignoreNullFields": "false"})
        else:
            from storagetapper_spark.functions.msgpack_codec import encode_msgpack_udf

            value = encode_msgpack_udf()(ev)
        out = out.unionByName(part.select(
            *base(part), value.cast(val_t).alias("value"),
            F.lit(False).alias("passthrough")))
    return out
