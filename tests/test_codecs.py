"""Encoder round-trip tests (encoder/encoder_test.go pattern): golden
events, encode→decode equality, delete events carrying only the key."""

import datetime
import json

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.functions.json_codec import decode_json, encode_json, restore_columns
from storagetapper_spark.functions.msgpack_codec import (
    decode_msgpack,
    encode_msgpack,
    msgpack_pack,
    msgpack_unpack,
)
from storagetapper_spark.functions.sql_codec import create_table_sql, encode_sql
from storagetapper_spark.functions.avro_codec import avro_prepare
from storagetapper_spark.schema.commonformat import common_format_struct


def _event_df(spark):
    schema = T.StructType([
        T.StructField("f1", T.LongType(), False),
        T.StructField("f2", T.StringType(), True),
        T.StructField("f3", T.DoubleType(), True),
        T.StructField("op", T.StringType(), False),
        T.StructField("seqno", T.LongType(), False),
        T.StructField("ts", T.LongType(), False),
    ])
    rows = [
        (1, "abc", 1.5, "insert", 10, 0),
        (2, None, None, "insert", 11, 0),   # nulls survive the round trip
        (1, "abc", 1.5, "delete", 12, 0),   # delete: key only, no fields
        (1 << 54, "big", -2.25, "insert", 13, 0),  # 2^54 edge (encoder_test.go)
    ]
    return spark.createDataFrame(rows, schema)


def test_json_roundtrip(spark):
    df = _event_df(spark)
    enc = encode_json(df, pk_cols=["f1"])
    decoded = decode_json(enc)
    restored = restore_columns(decoded, T.StructType([
        T.StructField("f1", T.LongType()),
        T.StructField("f2", T.StringType()),
        T.StructField("f3", T.DoubleType()),
    ]))
    got = {(r.seqno): r for r in restored.collect()}
    assert got[10].f1 == 1 and got[10].f2 == "abc" and got[10].f3 == 1.5
    assert got[11].f2 is None and got[11].f3 is None
    assert got[13].f1 == 1 << 54
    # delete carries no fields → restored data columns are null
    assert got[12].op == "delete" and got[12].f1 is None


def test_json_delete_shape(spark):
    df = _event_df(spark)
    vals = [json.loads(r.value) for r in encode_json(df, pk_cols=["f1"]).collect()]
    by_seq = {v["SeqNo"]: v for v in vals}
    assert by_seq[12]["Type"] == "delete"
    assert by_seq[12]["Fields"] is None       # doc/commonformat.md delete shape
    assert by_seq[12]["Key"] == ["1"]
    assert by_seq[10]["Fields"] == [
        {"Name": "f1", "Value": "1"},
        {"Name": "f2", "Value": "abc"},
        {"Name": "f3", "Value": "1.5"},
    ]


def test_msgpack_primitives():
    cases = [None, True, False, 0, 1, 127, -1, -32, -33, 1 << 40, -(1 << 40),
             1.5, -2.25, "", "hello", "é" * 40, b"", b"\x00\xff", [1, "a", None],
             {"k": 1, "nested": [1, 2]}, "x" * 70000, list(range(20))]
    for c in cases:
        assert msgpack_unpack(msgpack_pack(c)) == c


def test_msgpack_roundtrip(spark):
    df = _event_df(spark)
    ev = common_format_struct(F.col("op"), ["f1"], F.col("seqno"), F.col("ts"),
                              ["f1", "f2", "f3"])
    packed = encode_msgpack(df.select(ev.alias("ev"), "op"), F.col("ev"))
    decoded = decode_msgpack(packed)
    rows = decoded.select("event.*").collect()
    by_seq = {r.SeqNo: r for r in rows}
    assert by_seq[10].Type == "insert"
    assert by_seq[10].Key == ["1"]
    assert [f.asDict() for f in by_seq[10].Fields] == [
        {"Name": "f1", "Value": "1"},
        {"Name": "f2", "Value": "abc"},
        {"Name": "f3", "Value": "1.5"},
    ]
    assert by_seq[11].Fields[1].Value is None


def test_sql_encoder_goldens(spark):
    df = _event_df(spark)
    stmts = {r.seqno: r.stmt for r in
             encode_sql(df, "t1", pk_cols=["f1"], dialect="mysql").collect()}
    assert stmts[10] == ("INSERT INTO `t1` (`seqno`, `f1`, `f2`, `f3`) "
                         "VALUES ( 10, 1, 'abc', 1.5 );")
    assert stmts[11] == ("INSERT INTO `t1` (`seqno`, `f1`, `f2`, `f3`) "
                         "VALUES ( 11, 2, NULL, NULL );")
    assert stmts[12] == "DELETE FROM `t1` WHERE `f1`=1;"
    # ansi dialect quoting
    ansi = {r.seqno: r.stmt for r in
            encode_sql(df, "t1", pk_cols=["f1"], dialect="ansisql").collect()}
    assert ansi[10].startswith('INSERT INTO "t1" ("seqno", "f1", "f2", "f3")')


def test_sql_quote_escaping(spark):
    df = spark.createDataFrame(
        [(1, "O'Brien", "insert", 5, 0)],
        "f1 long, f2 string, op string, seqno long, ts long")
    stmt = encode_sql(df, "t", pk_cols=["f1"]).collect()[0].stmt
    assert "'O''Brien'" in stmt


def test_create_table_sql():
    schema = T.StructType([
        T.StructField("f1", T.LongType(), False),
        T.StructField("f2", T.StringType(), True),
        T.StructField("f3", T.DecimalType(10, 2), True),
    ])
    ddl = create_table_sql("t1", schema, ["f1"], dialect="mysql")
    assert ddl == ("CREATE TABLE `t1` (`seqno` BIGINT NOT NULL, "
                   "`f1` BIGINT NOT NULL, `f2` TEXT, `f3` DECIMAL(10,2), "
                   "UNIQUE KEY(`seqno`), PRIMARY KEY (`f1`));")


def test_avro_prepare_metadata(spark):
    df = _event_df(spark)
    out = avro_prepare(df, pk_cols=["f1"]).collect()
    by_ref = {r.ref_key: r for r in out}
    assert by_ref[10].is_deleted is False
    assert by_ref[12].is_deleted is True
    # delete nulls out non-PK data fields, keeps the key (avro.go:148-162)
    assert by_ref[12].f2 is None and by_ref[12].f1 == 1
    assert bytes(by_ref[10].row_key) == b"11"  # len('1') + '1'


def test_avro_prepare_epoch_ms(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 2, 3, 4, 5), "insert", 9, 0)],
        "f1 long, f5 timestamp, op string, seqno long, ts long")
    r = avro_prepare(df, pk_cols=["f1"]).collect()[0]
    assert r.f5 == 1704164645000  # epoch ms (encoder/avro.go:283)


def test_decode_tolerates_garbage(spark):
    """Bad-record tolerance: malformed JSON decodes to a null event, not
    an exception — a 100 TB feed always contains garbage."""
    df = spark.createDataFrame(
        [("not json",), ("{\"Type\":",), ("",), (None,),
         ('{"Type":"insert","Key":["1"],"SeqNo":5,"Timestamp":0,'
          '"Fields":[{"Name":"f1","Value":"1"}]}',)],
        "value string")
    decoded = decode_json(df)
    rows = decoded.collect()
    ok = [r for r in rows if r.event is not None and r.event.Type is not None]
    assert len(ok) == 1 and ok[0].event.SeqNo == 5


def test_msgpack_decodes_reference_wire_format():
    """Golden bytes, hand-assembled per the public MessagePack spec the
    way a Go msgp encoder lays out CommonFormatEvent
    (reference types/format.go:40-46 + encoder/msgpack.go): a fixmap
    keyed by the Go field names, with each value in its MOST COMPACT
    encoding (uint8/16/32/64, int8, str8, nil Fields) — formats our own
    encoder never emits but a reference-produced message will contain."""
    from storagetapper_spark.functions.msgpack_codec import msgpack_unpack

    def fixstr(s):
        b = s.encode()
        return bytes([0xA0 | len(b)]) + b

    golden = bytearray()
    golden += bytes([0x85])                     # fixmap, 5 entries
    golden += fixstr("Type") + fixstr("insert")
    golden += fixstr("Key") + bytes([0x91])     # fixarray(1)
    golden += bytes([0xD9, 0x02]) + b"k1"       # str8 (msgp uses for len<256)
    golden += fixstr("SeqNo") + bytes([0xCE]) + (1 << 20).to_bytes(4, "big")
    golden += fixstr("Timestamp") + bytes([0xD3]) + \
        (1514764800000000000).to_bytes(8, "big")
    golden += fixstr("Fields") + bytes([0x92])  # fixarray(2)
    golden += bytes([0x82]) + fixstr("Name") + fixstr("f1") \
        + fixstr("Value") + bytes([0xCC, 0xCB])          # uint8 203
    golden += bytes([0x82]) + fixstr("Name") + fixstr("f2") \
        + fixstr("Value") + bytes([0xD0, 0x80])          # int8 -128

    ev = msgpack_unpack(bytes(golden))
    assert ev == {
        "Type": "insert",
        "Key": ["k1"],
        "SeqNo": 1 << 20,
        "Timestamp": 1514764800000000000,
        "Fields": [{"Name": "f1", "Value": 203},
                   {"Name": "f2", "Value": -128}],
    }

    # delete event with nil Fields and the remaining compact widths
    golden2 = bytes([0x85]) \
        + fixstr("Type") + fixstr("delete") \
        + fixstr("Key") + bytes([0x91, 0xCD]) + (300).to_bytes(2, "big") \
        + fixstr("SeqNo") + bytes([0xCF]) + ((1 << 40)).to_bytes(8, "big") \
        + fixstr("Timestamp") + bytes([0x00]) \
        + fixstr("Fields") + bytes([0xC0])
    ev2 = msgpack_unpack(golden2)
    assert ev2 == {"Type": "delete", "Key": [300], "SeqNo": 1 << 40,
                   "Timestamp": 0, "Fields": None}
