"""End-to-end Debezium resume: golden envelopes → parse_debezium →
gtid_guarded_upsert_sink, across a reader restart WITH binlog
rotation — the exact case where the (file << 40 | pos)-derived seqno
is regenerated higher for re-emitted transactions, so max-seqno-wins
alone would resurrect stale values (changelog/mysql.go:1019-1043's
reason for resuming from the executed GTID set, not a file
position)."""

import json
import os

from pyspark.sql import types as T

from storagetapper_spark.sources.debezium import parse_debezium
from storagetapper_spark.sources.gtid import GTIDSet
from storagetapper_spark.streaming.pipeline import (
    gtid_guarded_upsert_sink,
    read_state,
)

U = "3E11FA47-71CA-11E1-9E33-C80AA9429562"

TABLE = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("balance", T.DoubleType()),
])


def _env(gno, binfile, pos, op, image, ts):
    src = {"gtid": f"{U}:{gno}", "file": binfile, "db": "inventory",
           "table": "accounts", "pos": pos}
    return {"before": None if op in ("c", "r") else image,
            "after": image if op in ("c", "r", "u") else None,
            "op": op, "ts_ms": ts, "source": src}


def _drop(path, name, envelopes):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in envelopes:
            f.write(json.dumps(e) + "\n")


def _run(spark, src, state, ckpt):
    raw = (spark.readStream.format("text").schema("value string")
           .load(src))
    cdc = parse_debezium(raw, TABLE, pk_cols=["id"])
    q = gtid_guarded_upsert_sink(cdc, state, ckpt, pk_cols=["id"])
    q.awaitTermination(60)


def test_debezium_restart_across_binlog_rotation(spark, tmp_path):
    src, state, ckpt = (str(tmp_path / d) for d in ("feed", "st", "ck"))

    # run 1: mysql-bin.000003 — insert id=1 (gtid 21), update it to
    # balance 42 (gtid 22), insert id=2 (gtid 23)
    _drop(src, "b1.json", [
        _env(21, "mysql-bin.000003", 100, "c",
             {"id": 1, "name": "ann", "balance": 10.0}, 1700000000000),
        _env(22, "mysql-bin.000003", 101, "u",
             {"id": 1, "name": "ann", "balance": 42.0}, 1700000001000),
        _env(23, "mysql-bin.000003", 102, "c",
             {"id": 2, "name": "bob", "balance": 5.0}, 1700000002000),
    ])
    _run(spark, src, state, ckpt)
    got = {r.id: r.balance for r in read_state(spark, state).collect()}
    assert got == {1: 42.0, 2: 5.0}

    # restart: the log rotated to mysql-bin.000004, and the server
    # replays from gtid 21 — re-emitting 21 with a HIGHER derived seqno
    # (4 << 40 | 4) than run 1's update (3 << 40 | 101) — plus the
    # genuinely new gtid 24.
    _drop(src, "b2.json", [
        _env(21, "mysql-bin.000004", 4, "c",
             {"id": 1, "name": "ann", "balance": 10.0}, 1700000000000),
        _env(24, "mysql-bin.000004", 5, "c",
             {"id": 3, "name": "cat", "balance": 7.0}, 1700000003000),
    ])
    _run(spark, src, state, ckpt)
    got = {r.id: r.balance for r in read_state(spark, state).collect()}
    # the redelivered insert (seqno 4<<40|4 > 3<<40|101) would have
    # reverted id=1 to 10.0 under max-seqno alone
    assert got == {1: 42.0, 2: 5.0, 3: 7.0}
    saved = GTIDSet.parse(
        spark.read.parquet(os.path.join(state, "gtid_current"))
        .collect()[0]["executed_gtid_set"])
    assert saved.to_string() == f"{U.lower()}:21-24"
