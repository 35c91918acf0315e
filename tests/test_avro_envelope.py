"""Avro binary codec round-trips and envelope wrap/unwrap (E2/E6)."""

import math

from pyspark.sql import types as T

from storagetapper_spark.functions.avro_codec import (
    avro_decode_record,
    avro_encode_record,
    avro_prepare,
    decode_avro_binary,
    encode_avro_binary,
)
from storagetapper_spark.functions.envelope import unwrap, unwrap_df, wrap, wrap_df
from storagetapper_spark.schema.mysql_types import (
    ColumnSchema,
    TableSchema,
    struct_to_avro_schema,
)

FIELDS = [
    {"name": "f_long", "type": ["null", "long"]},
    {"name": "f_int", "type": ["null", "int"]},
    {"name": "f_str", "type": ["null", "string"]},
    {"name": "f_bytes", "type": ["null", "bytes"]},
    {"name": "f_double", "type": ["null", "double"]},
    {"name": "f_float", "type": ["null", "float"]},
    {"name": "f_bool", "type": ["null", "boolean"]},
]


def test_avro_record_roundtrip():
    recs = [
        {"f_long": 1 << 54, "f_int": -42, "f_str": "héllo", "f_bytes": b"\x00\xff",
         "f_double": -2.5, "f_float": 1.5, "f_bool": True},
        {"f_long": 0, "f_int": 0, "f_str": "", "f_bytes": b"",
         "f_double": 0.0, "f_float": 0.0, "f_bool": False},
        {"f_long": None, "f_int": None, "f_str": None, "f_bytes": None,
         "f_double": None, "f_float": None, "f_bool": None},
        {"f_long": -(1 << 62), "f_int": 2147483647, "f_str": "x" * 1000,
         "f_bytes": bytes(range(256)), "f_double": math.pi, "f_float": 0.25,
         "f_bool": True},
    ]
    for r in recs:
        assert avro_decode_record(avro_encode_record(r, FIELDS), FIELDS) == r


def test_avro_zigzag_wire_compat():
    # known zigzag varint encodings from the Avro spec: 0→00, -1→01,
    # 1→02, -2→03, 2→04
    f = [{"name": "v", "type": ["null", "long"]}]
    assert avro_encode_record({"v": 0}, f) == b"\x02\x00"   # union=1, zz(0)
    assert avro_encode_record({"v": -1}, f) == b"\x02\x01"
    assert avro_encode_record({"v": 1}, f) == b"\x02\x02"
    assert avro_encode_record({"v": 64}, f) == b"\x02\x80\x01"
    assert avro_encode_record({"v": None}, f) == b"\x00"


def test_avro_spark_roundtrip(spark):
    ts = TableSchema("db1", "t1", [
        ColumnSchema("f1", "bigint", "bigint", 1, False, key="PRI"),
        ColumnSchema("f2", "varchar", "varchar(32)", 2),
        ColumnSchema("f3", "double", "double", 3),
    ])
    avsc = struct_to_avro_schema(ts)
    df = spark.createDataFrame(
        [(1, "a", 1.5, "insert", 10, 0), (2, None, None, "delete", 11, 0)],
        "f1 long, f2 string, f3 double, op string, seqno long, ts long")
    prepared = avro_prepare(df, pk_cols=["f1"])
    encoded = encode_avro_binary(prepared, avsc)
    back_schema = T.StructType([
        T.StructField("f1", T.LongType()),
        T.StructField("f2", T.StringType()),
        T.StructField("f3", T.DoubleType()),
        T.StructField("row_key", T.BinaryType()),
        T.StructField("ref_key", T.LongType()),
        T.StructField("is_deleted", T.BooleanType()),
    ])
    decoded = {r.ref_key: r for r in
               decode_avro_binary(encoded, avsc, back_schema).collect()}
    assert decoded[10].f1 == 1 and decoded[10].f2 == "a" and decoded[10].f3 == 1.5
    assert decoded[10].is_deleted is False
    assert bytes(decoded[10].row_key) == b"11"
    # delete: data nulled, key retained, flag set (avro.go:148-162)
    assert decoded[11].is_deleted is True and decoded[11].f2 is None
    assert decoded[11].f1 == 2


def test_envelope_roundtrip():
    payload = b"\x01\x02opaque-payload\xff"
    blob = wrap(payload, "avro", ["k1"], 42, 7)
    header, out = unwrap(blob)
    assert out == payload
    assert header == {"Type": "avro", "Key": ["k1"], "SeqNo": 42, "Timestamp": 7}


def test_envelope_spark_roundtrip(spark):
    df = spark.createDataFrame([("k1", 5, b"payload-a"), ("k2", 6, b"payload-b")],
                               "key string, seqno long, value binary")
    wrapped = wrap_df(df, "json")
    out = {r.header.SeqNo: (r.header.Key[0], bytes(r.payload))
           for r in unwrap_df(wrapped).collect()}
    assert out == {5: ("k1", b"payload-a"), 6: ("k2", b"payload-b")}
