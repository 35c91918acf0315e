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


def write_buffer(cdc: DataFrame, pk_cols: list[str], buffer_dir: str,
                 buffer_format: str = "json") -> None:
    """Stage 1: encode + envelope-wrap + append to the buffer.  Buffer
    records are base64 lines locally (binary Kafka records in prod)."""
    enc = cdc.select(
        row_key_expr(pk_cols).alias("key"),
        F.col("seqno"),
        encode_json_value(cdc, pk_cols).alias("value"),
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
    """Stage 2: route by envelope header.  Returns (key, seqno, value,
    passthrough) ready for any sink; ordering metadata comes from the
    header without touching the payload (the entire point of E6)."""
    buf = read_buffer(spark, buffer_dir)
    passthrough = F.col("header.Type") == output_format
    return buf.select(
        F.col("header.Key").getItem(0).alias("key"),
        F.col("header.SeqNo").alias("seqno"),
        # passthrough: forward bytes; re-encode hook would branch here
        # (e.g. decode_json → encode_avro_binary for an avro target)
        F.col("payload").cast("string").alias("value"),
        passthrough.alias("passthrough"),
    )
