"""sources/debezium.parse_debezium against GOLDEN Debezium-shaped JSON
(the connector's documented envelope, both bare and schema-wrapped),
and its composition with decompose_updates — the reference op mapping
(changelog/mysql.go:530-538: update → delete(before)+insert(after))."""

import json

from pyspark.sql import types as T

from storagetapper_spark.sources.changelog import decompose_updates
from storagetapper_spark.sources.debezium import parse_debezium

TABLE = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("balance", T.DoubleType()),
])


def _envelopes():
    src = {"gtid": "3E11FA47-71CA-11E1-9E33-C80AA9429562:23",
           "file": "mysql-bin.000003", "db": "inventory",
           "table": "accounts"}
    return [
        {"before": None, "after": {"id": 1, "name": "ann", "balance": 10.0},
         "op": "c", "ts_ms": 1700000000000, "source": dict(src, pos=100)},
        {"before": None, "after": {"id": 2, "name": "bob", "balance": 5.0},
         "op": "r", "ts_ms": 1700000001000, "source": dict(src, pos=101)},
        {"before": {"id": 1, "name": "ann", "balance": 10.0},
         "after": {"id": 1, "name": "ann", "balance": 42.0},
         "op": "u", "ts_ms": 1700000002000, "source": dict(src, pos=102)},
        {"before": {"id": 2, "name": "bob", "balance": 5.0}, "after": None,
         "op": "d", "ts_ms": 1700000003000, "source": dict(src, pos=103)},
    ]


def test_parse_debezium_golden(spark):
    feed = spark.createDataFrame(
        [(json.dumps(e),) for e in _envelopes()], "value string")
    out = parse_debezium(feed, TABLE, pk_cols=["id"]).collect()
    by_seq = {r.seqno: r for r in out}
    assert len(out) == 4
    # c and r both normalize to insert with the AFTER image
    assert by_seq[100].op == "insert" and by_seq[100].balance == 10.0
    assert by_seq[101].op == "insert" and by_seq[101].name == "bob"
    # u keeps the after image until decomposition
    assert by_seq[102].op == "update" and by_seq[102].balance == 42.0
    # d carries the BEFORE image (the only one a delete has)
    assert by_seq[103].op == "delete" and by_seq[103].name == "bob"
    assert by_seq[103].row_key == "2"
    # binlog pos is the seqno; gtid rides along for resume bookkeeping
    assert by_seq[100].gtid.endswith(":23")
    assert by_seq[100].ts.year == 2023


def test_parse_debezium_schema_wrapped(spark):
    feed = spark.createDataFrame(
        [(json.dumps({"schema": {"type": "struct"}, "payload": e}),)
         for e in _envelopes()], "value string")
    out = parse_debezium(feed, TABLE, pk_cols=["id"], wrapped=True)
    assert {r.op for r in out.collect()} == {"insert", "update", "delete"}


def test_parse_debezium_feeds_decompose_updates(spark):
    feed = spark.createDataFrame(
        [(json.dumps(e),) for e in _envelopes()], "value string")
    cdc = parse_debezium(feed, TABLE, pk_cols=["id"]).drop("gtid", "ts")
    halves = decompose_updates(cdc).collect()
    # 4 events, the update splits in two
    assert len(halves) == 5
    upd = sorted([r for r in halves if r.row_key == "1"],
                 key=lambda r: r.seqno)
    # delete(before-slot) immediately precedes insert(after) — the
    # reference's consecutive-seqno pairing
    assert [r.op for r in upd] == ["insert", "delete", "insert"]
    assert upd[-2].seqno + 1 == upd[-1].seqno


def test_parse_debezium_streaming(spark, tmp_path):
    """The adapter is pure Column expressions — verify it binds on a
    readStream (no batch-only operations)."""
    import os
    src = str(tmp_path / "feed")
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b1.json"), "w") as f:
        for e in _envelopes():
            f.write(json.dumps({"value": json.dumps(e)}) + "\n")
    stream = (spark.readStream
              .schema(T.StructType([T.StructField("value", T.StringType())]))
              .json(src))
    q = (parse_debezium(stream, TABLE, pk_cols=["id"])
         .writeStream.format("memory").queryName("dbz_norm")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    assert spark.sql("select count(*) n from dbz_norm").collect()[0].n == 4
