"""sources/debezium.parse_debezium against GOLDEN Debezium-shaped JSON
(the connector's documented envelope, both bare and schema-wrapped),
and its composition with decompose_updates — the reference op mapping
(changelog/mysql.go:530-538: update → delete(before)+insert(after))."""

import json

import pytest
from pyspark.sql import types as T

from storagetapper_spark.sources.changelog import decompose_updates
from storagetapper_spark.sources.debezium import (parse_debezium,
                                                  quarantine_debezium)

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
    base = 3 << 40  # mysql-bin.000003
    by_seq = {r.seqno - base: r for r in out}
    assert len(out) == 4
    # c and r both normalize to insert with the AFTER image
    assert by_seq[100].op == "insert" and by_seq[100].balance == 10.0
    assert by_seq[101].op == "insert" and by_seq[101].name == "bob"
    # u keeps the after image until decomposition
    assert by_seq[102].op == "update" and by_seq[102].balance == 42.0
    # d carries the BEFORE image (the only one a delete has)
    assert by_seq[103].op == "delete" and by_seq[103].name == "bob"
    # row_key is the length-prefixed form snapshot_scan emits ('12' for
    # id=2), so changelog rows match snapshot rows key-for-key
    assert by_seq[103].row_key == "12"
    # gtid rides along for resume bookkeeping
    assert by_seq[100].gtid.endswith(":23")
    assert by_seq[100].ts.year == 2023


def test_parse_debezium_seqno_survives_file_rotation(spark):
    """Binlog pos resets on rotation; seqno = file_index<<40 | pos must
    keep the later file's events strictly after the earlier file's even
    though their raw pos is smaller."""
    src1 = {"gtid": "g:1", "file": "mysql-bin.000003", "pos": 999_999,
            "db": "d", "table": "t"}
    src2 = {"gtid": "g:2", "file": "mysql-bin.000004", "pos": 4,
            "db": "d", "table": "t"}
    envs = [
        {"before": None, "after": {"id": 1, "name": "a", "balance": 1.0},
         "op": "c", "ts_ms": 1700000000000, "source": src1},
        {"before": None, "after": {"id": 1, "name": "b", "balance": 2.0},
         "op": "u", "ts_ms": 1700000000500, "source": src2},
    ]
    feed = spark.createDataFrame(
        [(json.dumps(e),) for e in envs], "value string")
    out = sorted(parse_debezium(feed, TABLE, pk_cols=["id"]).collect(),
                 key=lambda r: r.seqno)
    # the post-rotation update wins despite pos 4 < 999999
    assert [r.op for r in out] == ["insert", "update"]
    assert out[0].seqno == (3 << 40) + 999_999
    assert out[1].seqno == (4 << 40) + 4


def test_parse_debezium_composite_pk_no_collision(spark):
    """('ab','c') vs ('a','bc'): plain concat collides, length-prefixed
    row_key must not."""
    schema = T.StructType([T.StructField("k1", T.StringType()),
                           T.StructField("k2", T.StringType())])
    src = {"gtid": "g", "file": "b.000001", "pos": 1, "db": "d",
           "table": "t"}
    envs = [
        {"before": None, "after": {"k1": "ab", "k2": "c"}, "op": "c",
         "ts_ms": 1, "source": dict(src, pos=1)},
        {"before": None, "after": {"k1": "a", "k2": "bc"}, "op": "c",
         "ts_ms": 2, "source": dict(src, pos=2)},
    ]
    feed = spark.createDataFrame(
        [(json.dumps(e),) for e in envs], "value string")
    keys = {r.row_key for r in
            parse_debezium(feed, schema, pk_cols=["k1", "k2"]).collect()}
    assert keys == {"2ab1c", "1a2bc"}


def test_parse_debezium_posless_feed_opt_in_ts(spark):
    """A connector that emits no source position must opt in to ts_ms
    seqnos explicitly; by default a posless row RAISES rather than
    getting a NULL seqno that silently always loses latest-state
    winner selection (ADVICE r5)."""
    env = {"before": None, "after": {"id": 9, "name": "x", "balance": 0.0},
           "op": "c", "ts_ms": 1700000000000,
           "source": {"gtid": None, "file": None, "pos": None,
                      "db": "d", "table": "t"}}
    feed = spark.createDataFrame([(json.dumps(env),)], "value string")
    with pytest.raises(Exception, match="null source.pos"):
        parse_debezium(feed, TABLE, pk_cols=["id"]).collect()
    assert parse_debezium(feed, TABLE, pk_cols=["id"],
                          seqno_from_ts=True) \
        .collect()[0].seqno == 1700000000000


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
    upd = sorted([r for r in halves if r.row_key == "11"],
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


def test_parse_debezium_nonstrict_quarantines_posless_rows(spark):
    """strict=False (ADVICE r6): a feed with one sporadic posless row
    keeps flowing — the good row is normalized, the posless one is
    excluded from the output and surfaced by quarantine_debezium."""
    good = {"before": None, "after": {"id": 1, "name": "a", "balance": 1.0},
            "op": "c", "ts_ms": 1700000000000,
            "source": {"gtid": "g1", "file": "binlog.000001", "pos": 100,
                       "db": "d", "table": "t"}}
    posless = {"before": None,
               "after": {"id": 2, "name": "b", "balance": 2.0},
               "op": "r", "ts_ms": 1700000001000,
               "source": {"gtid": None, "file": None, "pos": None,
                          "db": "d", "table": "t"}}
    feed = spark.createDataFrame(
        [(json.dumps(good),), (json.dumps(posless),)], "value string")
    out = parse_debezium(feed, TABLE, pk_cols=["id"], strict=False).collect()
    assert [r.id for r in out] == [1]
    dead = quarantine_debezium(feed, TABLE).collect()
    assert len(dead) == 1 and dead[0].op == "r"
    assert "null source.pos" in dead[0].reason
    assert json.loads(dead[0].raw)["after"]["id"] == 2
    # strict default on the same feed still fails loudly
    with pytest.raises(Exception, match="null source.pos"):
        parse_debezium(feed, TABLE, pk_cols=["id"]).collect()
