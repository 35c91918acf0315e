"""Avro encoder surface (E2, encoder/avro.go + encoder/avro_schema.go).

Reference semantics implemented Spark-side:
  - three injected metadata columns (encoder/avro.go:35,108-162):
      row_key    BINARY  — length-prefixed PK concat
      ref_key    LONG    — the event seqno
      is_deleted BOOLEAN — delete events carry only key + flag
  - deletes null out all data fields (encoder/avro.go:148-162)
  - DATETIME/TIMESTAMP → epoch-milliseconds long (encoder/avro.go:283)
  - zero-time → NULL (encoder/avro.go:236-238)
  - Avro output schema with [null, T] unions (types/avro.go:45-62) from
    schema.mysql_types.struct_to_avro_schema

The actual Avro *binary* encoding uses spark-avro's ``to_avro`` when the
package jar is on the classpath (not shipped in this container); the
structural transform below is the engine-side operator either way and is
what the unit tests cover.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.functions.keys import row_key_expr


def avro_prepare(df: DataFrame, pk_cols: list[str],
                 op_col: str = "op", seqno_col: str = "seqno") -> DataFrame:
    """Project an event DataFrame into the Avro record shape: data fields
    (nulled for deletes, timestamps → epoch-ms) + row_key/ref_key/
    is_deleted metadata columns."""
    is_del = F.col(op_col) == "delete"
    cols = []
    for f in df.schema.fields:
        if f.name in (op_col, seqno_col, "ts", "row_key"):
            continue
        c = F.col(f.name)
        if isinstance(f.dataType, T.TimestampType):
            c = (c.cast("double") * 1000).cast("long")  # epoch ms
        if f.name not in pk_cols:
            c = F.when(is_del, F.lit(None)).otherwise(c)
        cols.append(c.alias(f.name))
    return df.select(
        *cols,
        row_key_expr(pk_cols).cast("binary").alias("row_key"),
        F.col(seqno_col).cast("long").alias("ref_key"),
        is_del.alias("is_deleted"),
    )


def to_avro_binary(df: DataFrame, avro_schema: dict,
                   struct_cols: list[str] | None = None) -> DataFrame:
    """Binary-encode via spark-avro when available (requires the
    org.apache.spark:spark-avro jar, not bundled here)."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "spark-avro package not on the classpath; add "
            "org.apache.spark:spark-avro_2.13:<spark-version> via "
            "spark.jars.packages") from e
    cols = struct_cols or df.columns
    return df.select(to_avro(F.struct(*cols), json.dumps(avro_schema)).alias("value"))
