"""MsgPack common-format codec (E3, encoder/msgpack.go:31-158).

The container has no msgpack library, so this ships a minimal,
self-contained MessagePack encoder/decoder (pure Python, written against
the public MessagePack spec) covering the types the common-format event
uses: nil, bool, int, float64, str, bin, array, map.  It is exposed as
an Arrow-batched pandas UDF pair — the codec runs at Arrow batch
granularity, the same shape the reference's per-event codec has at its
batch-commit boundary.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.schema.commonformat import COMMON_FORMAT_SCHEMA


def msgpack_pack(obj) -> bytes:
    """Minimal MessagePack encoder (public spec: fixint/fixstr/fixmap/
    fixarray + sized variants)."""
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(o, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif o is True:
        out.append(0xC3)
    elif o is False:
        out.append(0xC2)
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(0x100 + o)
        elif -(1 << 63) <= o < (1 << 63):
            out.append(0xD3)
            out += struct.pack(">q", o)
        else:
            raise OverflowError(o)
    elif isinstance(o, float):
        out.append(0xCB)
        out += struct.pack(">d", o)
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n <= 0xFF:
            out.append(0xC4)
            out.append(n)
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += bytes(o)
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for item in o:
            _pack(item, out)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in o.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise TypeError(f"msgpack: unsupported type {type(o)}")


def msgpack_unpack(b: bytes):
    v, off = _unpack(b, 0)
    if off != len(b):
        raise ValueError("msgpack: trailing bytes")
    return v


def _unpack(b: bytes, i: int):
    c = b[i]
    i += 1
    if c <= 0x7F:
        return c, i
    if c >= 0xE0:
        return c - 0x100, i
    if 0xA0 <= c <= 0xBF:
        n = c & 0x1F
        return b[i:i + n].decode("utf-8"), i + n
    if 0x90 <= c <= 0x9F:
        return _unpack_seq(b, i, c & 0x0F)
    if 0x80 <= c <= 0x8F:
        return _unpack_map(b, i, c & 0x0F)
    if c == 0xC0:
        return None, i
    if c == 0xC2:
        return False, i
    if c == 0xC3:
        return True, i
    if c == 0xCB:
        return struct.unpack_from(">d", b, i)[0], i + 8
    # compact unsigned/signed int and str8 formats: OUR encoder never
    # emits these (fixint/int64/str16 only) but Go msgp encoders pick
    # the most compact representation per value (e.g. SeqNo=203 →
    # uint8 0xCC), so wire-compat decode must accept all of them
    if c == 0xCA:
        return struct.unpack_from(">f", b, i)[0], i + 4
    if c == 0xCC:
        return b[i], i + 1
    if c == 0xCD:
        return struct.unpack_from(">H", b, i)[0], i + 2
    if c == 0xCE:
        return struct.unpack_from(">I", b, i)[0], i + 4
    if c == 0xCF:
        return struct.unpack_from(">Q", b, i)[0], i + 8
    if c == 0xD0:
        return struct.unpack_from(">b", b, i)[0], i + 1
    if c == 0xD1:
        return struct.unpack_from(">h", b, i)[0], i + 2
    if c == 0xD2:
        return struct.unpack_from(">i", b, i)[0], i + 4
    if c == 0xD3:
        return struct.unpack_from(">q", b, i)[0], i + 8
    if c == 0xD9:
        n = b[i]
        return b[i + 1:i + 1 + n].decode("utf-8"), i + 1 + n
    if c == 0xDA:
        n = struct.unpack_from(">H", b, i)[0]
        return b[i + 2:i + 2 + n].decode("utf-8"), i + 2 + n
    if c == 0xDB:
        n = struct.unpack_from(">I", b, i)[0]
        return b[i + 4:i + 4 + n].decode("utf-8"), i + 4 + n
    if c == 0xC4:
        n = b[i]
        return bytes(b[i + 1:i + 1 + n]), i + 1 + n
    if c == 0xC5:
        n = struct.unpack_from(">H", b, i)[0]
        return bytes(b[i + 2:i + 2 + n]), i + 2 + n
    if c == 0xC6:
        n = struct.unpack_from(">I", b, i)[0]
        return bytes(b[i + 4:i + 4 + n]), i + 4 + n
    if c == 0xDC:
        n = struct.unpack_from(">H", b, i)[0]
        return _unpack_seq(b, i + 2, n)
    if c == 0xDD:
        n = struct.unpack_from(">I", b, i)[0]
        return _unpack_seq(b, i + 4, n)
    if c == 0xDE:
        n = struct.unpack_from(">H", b, i)[0]
        return _unpack_map(b, i + 2, n)
    if c == 0xDF:
        n = struct.unpack_from(">I", b, i)[0]
        return _unpack_map(b, i + 4, n)
    raise ValueError(f"msgpack: unsupported byte 0x{c:02x}")


def _unpack_seq(b, i, n):
    out = []
    for _ in range(n):
        v, i = _unpack(b, i)
        out.append(v)
    return out, i


def _unpack_map(b, i, n):
    out = {}
    for _ in range(n):
        k, i = _unpack(b, i)
        v, i = _unpack(b, i)
        out[k] = v
    return out, i


# --- Spark surface ------------------------------------------------------

def _event_dict(row) -> dict:
    # normalize numpy scalars/arrays from the Arrow batch to plain Python
    fields = row["Fields"]
    if fields is None or (hasattr(fields, "__len__") and not isinstance(fields, (list, tuple))
                          and fields is not None and len(fields) == 0 and not isinstance(fields, str)):
        fields = None if fields is None else list(fields)
    key = row["Key"]
    return {
        "Type": str(row["Type"]),
        "Key": [str(k) for k in key] if key is not None else None,
        "SeqNo": int(row["SeqNo"]),
        "Timestamp": int(row["Timestamp"]),
        "Fields": ([{"Name": str(f["Name"]),
                     "Value": None if f["Value"] is None else str(f["Value"])}
                    for f in fields] if fields is not None else None),
    }


def encode_msgpack_udf():
    """struct(common-format event) → msgpack binary.  A struct column
    arrives in a pandas UDF as a pd.DataFrame (one column per field)."""
    @F.pandas_udf(T.BinaryType())
    def _enc(s):
        import pandas as pd
        recs = s.to_dict("records")
        return pd.Series([msgpack_pack(_event_dict(r)) for r in recs])
    return _enc


def decode_msgpack_udf():
    """msgpack binary → struct(common-format event)."""
    @F.pandas_udf(COMMON_FORMAT_SCHEMA)
    def _dec(s):
        import pandas as pd
        return pd.DataFrame([msgpack_unpack(b) for b in s])
    return _dec


def encode_msgpack(df: DataFrame, event_col: Column) -> DataFrame:
    return df.select(encode_msgpack_udf()(event_col).alias("value"))


def decode_msgpack(df: DataFrame, value_col: str = "value") -> DataFrame:
    return df.withColumn("event", decode_msgpack_udf()(F.col(value_col)))
