"""Streaming schema evolution (S4 streaming form): DDL events in the CDC
feed reshape the materialized state mid-stream."""

import json
import os

from pyspark.sql import types as T

from storagetapper_spark.state import Registry, TableRegistration
from storagetapper_spark.streaming.evolution import (
    EVOLVING_CDC_SCHEMA,
    evolving_upsert_sink,
)

BASE_SCHEMA = T.StructType([
    T.StructField("f2", T.StringType()),
    T.StructField("f3", T.DoubleType()),
])


def _drop(path, name, events):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _ev(pk, op, seqno, ddl=None, **fields):
    return {"pk": pk, "op": op, "seqno": seqno, "ddl": ddl,
            "payload": json.dumps(fields) if fields else None}


def _run(spark, src, registry, state, ckpt):
    stream = spark.readStream.schema(EVOLVING_CDC_SCHEMA).json(src)
    q = evolving_upsert_sink(stream, registry, "svc.c1.db1.t1.v0",
                             state, ckpt, pk_cols=["pk"])
    q.awaitTermination(120)


def test_add_column_mid_stream(spark, tmp_path):
    src = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    registry = Registry(str(tmp_path / "reg.json"))
    registry.register(TableRegistration(
        service="svc", cluster="c1", db="db1", table="t1",
        pk_cols=["pk"], schema_json=BASE_SCHEMA.json()))

    # one batch containing: rows in old shape, ALTER ADD, rows in new
    # shape, ALTER DROP, rows in final shape — segments split by seqno
    _drop(src, "b1.json", [
        _ev(1, "insert", 1, f2="a", f3=1.5),
        _ev(2, "insert", 2, f2="b", f3=2.5),
        _ev(0, "schema", 3, ddl="ALTER TABLE t1 ADD COLUMN f4 bigint"),
        _ev(1, "insert", 4, f2="a2", f3=1.5, f4=40),
        _ev(3, "insert", 5, f2="c", f3=3.5, f4=41),
        _ev(0, "schema", 6, ddl="ALTER TABLE `t1` DROP COLUMN `f3`"),
        _ev(2, "insert", 7, f2="b2", f4=42),
    ])
    _run(spark, src, registry, state, ckpt)

    cur = spark.read.parquet(os.path.join(state, "current"))
    assert [f.name for f in cur.schema.fields] == ["pk", "op", "seqno", "f2", "f4"]
    got = {r.pk: (r.seqno, r.f2, r.f4) for r in cur.collect()}
    assert got[1] == (4, "a2", 40)     # updated post-ADD, survives DROP of f3
    assert got[2] == (7, "b2", 42)     # final-shape row
    assert got[3] == (5, "c", 41)

    # registry advanced two schema versions
    reg = registry.get("svc.c1.db1.t1.v0")
    evolved = T.StructType.fromJson(json.loads(reg.schema_json))
    assert [f.name for f in evolved.fields] == ["f2", "f4"]
    assert reg.schema_version == 2

    # late batch in the FINAL shape upserts normally
    _drop(src, "b2.json", [_ev(3, "delete", 8), _ev(4, "insert", 9, f2="d", f4=43)])
    _run(spark, src, registry, state, ckpt)
    cur2 = spark.read.parquet(os.path.join(state, "current"))
    got2 = {r.pk: (r.op, r.f2) for r in cur2.collect()}
    assert got2[3][0] == "delete"
    assert got2[4] == ("insert", "d")


def test_compat_policy_blocks_breaking_ddl(spark, tmp_path):
    """A feed pinned to 'full' compatibility must reject dropping a
    non-nullable column (old readers of new data cannot null-fill), and
    the state must not advance past the offending DDL."""
    import pytest

    from storagetapper_spark.streaming.evolution import (
        SchemaCompatError,
        apply_evolving_batch,
    )

    strict = T.StructType([
        T.StructField("f2", T.StringType(), True),
        T.StructField("f3", T.DoubleType(), False),   # required
    ])
    registry = Registry(str(tmp_path / "reg.json"))
    registry.register(TableRegistration(
        service="svc", cluster="c1", db="db1", table="t1",
        pk_cols=["pk"], schema_json=strict.json()))
    state = str(tmp_path / "state")

    rows = [
        _ev(1, "insert", 1, f2="a", f3=1.5),
        _ev(0, "schema", 2, ddl="ALTER TABLE t1 DROP COLUMN f3"),
        _ev(2, "insert", 3, f2="b"),
    ]
    batch = spark.createDataFrame(
        [tuple(r[k] for k in ("pk", "op", "seqno", "ddl", "payload"))
         for r in rows], EVOLVING_CDC_SCHEMA)

    with pytest.raises(SchemaCompatError) as ei:
        apply_evolving_batch(spark, batch, registry,
                             "svc.c1.db1.t1.v0", state, ["pk"],
                             compat_policy="full")
    assert ei.value.report.level == "BACKWARD"
    # registry schema unchanged — the DDL was gated before application
    reg = registry.get("svc.c1.db1.t1.v0")
    assert T.StructType.fromJson(json.loads(reg.schema_json)) == strict

    # a permissive feed (backward policy) accepts the same transition
    apply_evolving_batch(spark, batch, registry,
                         "svc.c1.db1.t1.v0", state, ["pk"],
                         compat_policy="backward")
    reg2 = registry.get("svc.c1.db1.t1.v0")
    assert "f3" not in {f.name for f in T.StructType.fromJson(
        json.loads(reg2.schema_json)).fields}
