"""The common-format event model (types/format.go:40-46, doc/commonformat.md).

CommonFormatEvent is the reference's wire format:
    {Type: "insert"|"delete"|"schema", Key: [...], SeqNo, Timestamp, Fields}

In Spark this is a typed StructType; ``Fields`` is an array of
(Name, Value) structs with stringified values, exactly as the JSON
encoder emits them (encoder/json.go:88-155).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Event-type constants (types/types.go:16-24).
INSERT = "insert"
DELETE = "delete"
SCHEMA = "schema"

#: Snapshot rows carry seqno = ^uint64(0) which, stored in a signed 64-bit
#: column, is -1 — strictly below every changelog seqno, so changelog rows
#: always supersede snapshot rows under max-seqno-wins
#: (snapshot/mysql.go:301, streamer/streamer.go:196-197, SURVEY.md §4.3).
SNAPSHOT_SEQNO = -1

COMMON_FORMAT_SCHEMA = T.StructType([
    T.StructField("Type", T.StringType(), False),
    T.StructField("Key", T.ArrayType(T.StringType()), True),
    T.StructField("SeqNo", T.LongType(), False),
    T.StructField("Timestamp", T.LongType(), False),
    T.StructField("Fields", T.ArrayType(
        T.StructType([
            T.StructField("Name", T.StringType(), False),
            T.StructField("Value", T.StringType(), True),
        ])), True),
])


def common_format_struct(op: Column | str, key_cols: list[str],
                         seqno: Column, ts: Column,
                         field_cols: list[str]) -> Column:
    """Build a CommonFormatEvent struct column from row columns.

    ``Fields`` is NULL for deletes (doc/commonformat.md: delete events
    carry only the key) — callers pass field_cols=[] for deletes.
    """
    op_col = F.lit(op) if isinstance(op, str) else op
    fields = (
        F.array(*[
            F.struct(F.lit(c).alias("Name"),
                     F.col(c).cast("string").alias("Value"))
            for c in field_cols
        ]) if field_cols else F.lit(None).cast(COMMON_FORMAT_SCHEMA["Fields"].dataType)
    )
    return F.struct(
        op_col.alias("Type"),
        F.array(*[F.col(c).cast("string") for c in key_cols]).alias("Key"),
        seqno.cast("long").alias("SeqNo"),
        ts.cast("long").alias("Timestamp"),
        fields.alias("Fields"),
    )
