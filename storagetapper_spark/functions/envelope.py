"""Envelope wrap/unwrap (E6, encoder/encoder.go:137-161).

The reference prepends a CommonFormat header {Type: output-format name,
Key, SeqNo, Timestamp} to an already-encoded opaque payload so the
buffer stage can route/order events without decoding them
(streamer/buffer.go:78-99 skip-decode passthrough).

Wire shape here: u32-BE header length + msgpack(header) + payload —
splittable without knowing the payload format.  In a pure-Spark lineage
envelopes are unnecessary (typed columns carry the metadata); this
exists for interop with reference-style buffer topics.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.functions.msgpack_codec import msgpack_pack, msgpack_unpack


def wrap(payload: bytes, fmt: str, key: list[str], seqno: int,
         timestamp: int = 0) -> bytes:
    header = msgpack_pack({"Type": fmt, "Key": key, "SeqNo": seqno,
                           "Timestamp": timestamp})
    return struct.pack(">I", len(header)) + header + payload


def unwrap(blob: bytes) -> tuple[dict, bytes]:
    n = struct.unpack_from(">I", blob, 0)[0]
    header = msgpack_unpack(bytes(blob[4:4 + n]))
    return header, bytes(blob[4 + n:])


_HEADER_SCHEMA = T.StructType([
    T.StructField("Type", T.StringType()),
    T.StructField("Key", T.ArrayType(T.StringType())),
    T.StructField("SeqNo", T.LongType()),
    T.StructField("Timestamp", T.LongType()),
])


def wrap_df(df: DataFrame, fmt: str, payload_col: str = "value",
            key_col: str = "key", seqno_col: str = "seqno") -> DataFrame:
    """Wrap an encoded frame: (key, seqno, value-bytes) → enveloped bytes."""
    @F.pandas_udf(T.BinaryType())
    def _wrap(key, seqno, payload):
        import pandas as pd
        return pd.Series([
            wrap(bytes(p) if not isinstance(p, bytes) else p, fmt,
                 [str(k)], int(s))
            for k, s, p in zip(key, seqno, payload)])

    return df.select(_wrap(F.col(key_col), F.col(seqno_col),
                           F.col(payload_col).cast("binary")).alias("value"))


def unwrap_df(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Split enveloped bytes into (header struct, payload binary)."""
    out_schema = T.StructType([
        T.StructField("header", _HEADER_SCHEMA),
        T.StructField("payload", T.BinaryType()),
    ])

    @F.pandas_udf(out_schema)
    def _unwrap(s):
        import pandas as pd
        rows = []
        for blob in s:
            h, p = unwrap(bytes(blob))
            rows.append({"header": h, "payload": p})
        return pd.DataFrame(rows)

    return df.select(_unwrap(F.col(value_col)).alias("e")).select("e.header", "e.payload")
