"""Codec plugin registry (encoder/encoder.go:42-47 + Create :91-97).

The reference registers encoder constructors in a map keyed by format
name; pipes and readers have the same pattern.  Here: format name →
(encode, decode) callables over DataFrames, so jobs resolve their
output format by registration string exactly like `encoder.Create`.
New formats register via ``register_codec`` (the UDF/extension surface
of SURVEY §2.6).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class Codec:
    name: str
    encode: Callable  # (df, pk_cols, **kw) -> DataFrame with 'value'
    decode: Callable  # (df, **kw) -> DataFrame with 'event' struct


_CODECS: dict[str, Codec] = {}


def register_codec(name: str, encode: Callable, decode: Callable) -> None:
    _CODECS[name.lower()] = Codec(name.lower(), encode, decode)


def create(name: str) -> Codec:
    """encoder.Create analog: resolve a codec by format name."""
    try:
        return _CODECS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown output format {name!r}; registered: {sorted(_CODECS)}"
        ) from None


def registered() -> list[str]:
    return sorted(_CODECS)


def _register_builtins() -> None:
    from storagetapper_spark.functions import json_codec, msgpack_codec

    register_codec("json", json_codec.encode_json, json_codec.decode_json)

    def _mp_encode(df, pk_cols, **kw):
        from pyspark.sql import functions as F

        from storagetapper_spark.schema.commonformat import common_format_struct

        field_cols = [c for c in df.columns
                      if c not in ("op", "seqno", "ts", "row_key")]
        ts = F.col("ts") if "ts" in df.columns else F.lit(0)
        ev = common_format_struct(F.col("op"), pk_cols, F.col("seqno"), ts, field_cols)
        return msgpack_codec.encode_msgpack(df.select(ev.alias("ev")), F.col("ev"))

    register_codec("msgpack", _mp_encode, msgpack_codec.decode_msgpack)

    def _avro_encode(df, pk_cols, avro_schema=None, **kw):
        from storagetapper_spark.functions.avro_codec import (
            avro_prepare,
            encode_avro_binary,
        )
        if avro_schema is None:
            raise ValueError("avro codec needs avro_schema=")
        return encode_avro_binary(avro_prepare(df, pk_cols), avro_schema)

    def _avro_decode(df, avro_schema=None, spark_schema=None, **kw):
        from storagetapper_spark.functions.avro_codec import decode_avro_binary
        return decode_avro_binary(df, avro_schema, spark_schema)

    register_codec("avro", _avro_encode, _avro_decode)


_register_builtins()
