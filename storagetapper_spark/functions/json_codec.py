"""JSON common-format encoder/decoder (E1, encoder/json.go:88-421).

Encode: row → CommonFormatEvent struct → ``to_json`` (JVM-side, no UDF).
Decode: ``from_json`` → map_from_entries(Fields) → per-column casts back
to the declared schema (the analog of fixFieldType,
encoder/json.go:157-236 — narrowing from JSON's untyped values to the
table schema's types).

Both directions are pure Column expressions inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.schema.commonformat import COMMON_FORMAT_SCHEMA, common_format_struct


def encode_json(df: DataFrame, pk_cols: list[str],
                op_col: str = "op", seqno_col: str = "seqno",
                ts_col: str = "ts",
                field_cols: list[str] | None = None) -> DataFrame:
    """Encode rows into common-format JSON strings.

    Output: (row_key-compatible) ``key`` string + ``value`` JSON string —
    the shape every sink takes (Kafka key/value, file lines).
    Delete events carry a null Fields array (doc/commonformat.md).
    """
    if field_cols is None:
        field_cols = [c for c in df.columns
                      if c not in (op_col, seqno_col, ts_col, "row_key")]
    # encode-time timestamp defaults to 0 when absent (GenTime=0 goldens)
    ts = F.col(ts_col) if ts_col in df.columns else F.lit(0)
    insert_ev = common_format_struct(F.col(op_col), pk_cols, F.col(seqno_col),
                                     ts, field_cols)
    delete_ev = common_format_struct(F.col(op_col), pk_cols, F.col(seqno_col),
                                     ts, [])
    ev = F.when(F.col(op_col) == "delete", delete_ev).otherwise(insert_ev)
    return df.select(
        F.concat_ws("", *[F.col(c).cast("string") for c in pk_cols]).alias("key"),
        # Go's json.Marshal emits explicit nulls ("Fields":null on deletes,
        # "Value":null on null columns) — match it (encoder/json.go:88-107)
        F.to_json(ev, {"ignoreNullFields": "false"}).alias("value"),
    )


def decode_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse common-format JSON back into the typed event struct."""
    return df.withColumn("event", F.from_json(F.col(value_col), COMMON_FORMAT_SCHEMA))


def restore_columns(decoded: DataFrame, schema: T.StructType,
                    event_col: str = "event") -> DataFrame:
    """Rebuild typed table columns from a decoded event (fixFieldType
    analog): Fields → map, then cast each value to the declared type."""
    m = F.map_from_entries(F.col(f"{event_col}.Fields"))
    cols: list[Column] = []
    for f in schema.fields:
        v = m.getItem(f.name)
        cols.append(v.cast(f.dataType).alias(f.name))
    return decoded.select(
        F.col(f"{event_col}.Type").alias("op"),
        F.col(f"{event_col}.SeqNo").alias("seqno"),
        F.col(f"{event_col}.Timestamp").alias("ts"),
        *cols,
    )
