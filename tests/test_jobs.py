"""Snapshot job lifecycle (§3.2 path) and zero-time normalization."""

import gzip
import json
import os

from pyspark.sql import functions as F

from storagetapper_spark.jobs import run_due_snapshots, run_snapshot_job
from storagetapper_spark.schema.mysql_types import normalize_zero_time
from storagetapper_spark.sources.snapshot import RowFilter
from storagetapper_spark.state import Registry, TableRegistration


def test_run_snapshot_job(spark, tmp_path, sf_dir):
    registry = Registry(str(tmp_path / "reg.json"))
    reg = registry.register(TableRegistration(
        service="svc", cluster="c1", db="tpch", table="nation",
        pk_cols=["n_nationkey"]))
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    manifest = run_snapshot_job(
        spark, registry, reg, src, str(tmp_path / "out"),
        filters=[RowFilter("n_regionkey", [0, 1], "=", "or")])
    # filters applied: regions 0,1 only (10 of 25 nations)
    assert manifest["total_records"] == 10
    out_dir = os.path.join(str(tmp_path / "out"), "svc.tpch.nation.v0")
    assert os.path.exists(os.path.join(out_dir, "_DONE"))
    # events decode as common-format inserts with seqno=-1
    part = [f for f in manifest["files"]][0]
    with gzip.open(os.path.join(out_dir, part), "rt") as f:
        ev = json.loads(f.readline())
    assert ev["Type"] == "insert" and ev["SeqNo"] == -1
    # bookkeeping: no longer due
    assert registry.tables_needing_snapshot() == []


def test_run_due_snapshots(spark, tmp_path, sf_dir):
    registry = Registry(str(tmp_path / "reg.json"))
    for t in ("region", "nation"):
        registry.register(TableRegistration(
            service="svc", cluster="c1", db="tpch", table=t,
            pk_cols=[f"{'r' if t == 'region' else 'n'}_{t}key"]))
    loader = lambda reg: spark.read.parquet(f"{sf_dir}/{reg.table}.parquet")  # noqa: E731
    results = run_due_snapshots(spark, registry, loader, str(tmp_path / "o"))
    assert set(results) == {"svc.c1.tpch.region.v0", "svc.c1.tpch.nation.v0"}
    assert results["svc.c1.tpch.region.v0"]["total_records"] == 5
    # second pass: nothing due
    assert run_due_snapshots(spark, registry, loader, str(tmp_path / "o")) == {}


def test_normalize_zero_time(spark):
    df = spark.createDataFrame(
        [("0000-00-00 00:00:00",), ("0000-00-00 00:00:00.123",),
         ("2024-01-02 03:04:05",), (None,)], "t string")
    out = df.select(normalize_zero_time(F.col("t")).alias("ts")).collect()
    assert out[0].ts is None and out[1].ts is None and out[3].ts is None
    assert out[2].ts is not None and out[2].ts.year == 2024


def test_run_due_snapshots_parallel(spark, tmp_path, sf_dir):
    """Worker-pool analog: 3 tables snapshot concurrently; one broken
    registration fails in isolation."""
    from storagetapper_spark.jobs import run_due_snapshots_parallel
    from storagetapper_spark.sinks.files import read_manifest
    from storagetapper_spark.state import Registry, TableRegistration

    registry = Registry(str(tmp_path / "reg.json"))
    for name, pk in [("region", "r_regionkey"), ("nation", "n_nationkey"),
                     ("supplier", "s_suppkey")]:
        registry.register(TableRegistration(
            service="svc", cluster="c1", db="tpch", table=name,
            pk_cols=[pk]))
    registry.register(TableRegistration(
        service="svc", cluster="c1", db="tpch", table="missing",
        pk_cols=["nope"]))

    def loader(reg):
        import os as _os
        path = _os.path.join(sf_dir, f"{reg.table}.parquet")
        return spark.read.parquet(path)

    out = str(tmp_path / "out")
    results = run_due_snapshots_parallel(spark, registry, loader, out,
                                         max_workers=4)
    assert len(results) == 4
    assert "error" in results["svc.c1.tpch.missing.v0"]
    ok = [k for k in results if "error" not in results[k]]
    assert len(ok) == 3
    for k in ok:
        m = results[k]
        assert m["total_records"] > 0
    # failed table still flagged for snapshot; successes cleared
    due = {r.table for r in registry.tables_needing_snapshot()}
    assert due == {"missing"}


def test_run_table_pipeline_handoff(spark, tmp_path):
    """The combined snapshot+changelog worker (streamer.Worker analog):
    resume point recorded before the snapshot, snapshot seeds state at
    seqno=-1, concurrent changelog events supersede it."""
    import json
    import os

    from pyspark.sql import types as T

    from storagetapper_spark.jobs import run_table_pipeline
    from storagetapper_spark.state import Registry, TableRegistration
    from storagetapper_spark.streaming.pipeline import read_state

    feed_schema = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("val", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("seqno", T.LongType()),
    ])
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    # events already buffered before/while the snapshot runs
    with open(os.path.join(feed, "b1.json"), "w") as f:
        f.write(json.dumps({"pk": 1, "val": "from-binlog", "op": "insert",
                            "seqno": 7}) + "\n")
        f.write(json.dumps({"pk": 2, "val": None, "op": "delete",
                            "seqno": 8}) + "\n")

    registry = Registry(str(tmp_path / "reg.json"))
    reg = registry.register(TableRegistration(
        service="svc", cluster="c", db="d", table="t", pk_cols=["pk"]))
    source = spark.createDataFrame(
        [(1, "snap-1"), (2, "snap-2"), (3, "snap-3")], "pk long, val string")

    out = run_table_pipeline(spark, registry, reg, source, feed, feed_schema,
                             str(tmp_path / "state"), str(tmp_path / "ckpt"))
    assert out["snapshot_rows"] == 3

    got = {r.pk: (r.val, r.seqno) for r in
           read_state(spark, str(tmp_path / "state")).collect()}
    assert got[1] == ("from-binlog", 7)   # changelog wins over snapshot
    assert 2 not in got                   # concurrent delete applied
    assert got[3][0] == "snap-3"          # untouched key keeps snapshot row
    # resume point was persisted before the snapshot (GTID analog)
    assert json.loads(registry.stream_resume_point(reg.key))["feed"] == feed
    assert registry.get(reg.key).need_snapshot is False


def test_run_due_snapshots_parallel_isolates_failures(spark, tmp_path, sf_dir):
    """The worker-pool analog (pool/pool.go:52-96): tables snapshot
    concurrently; one table's broken source fails only that table (the
    lease-timeout analog), the others complete and clear their flags."""
    from storagetapper_spark.jobs import run_due_snapshots_parallel

    registry = Registry(str(tmp_path / "reg.json"))
    for t, pk in (("region", "r_regionkey"), ("nation", "n_nationkey"),
                  ("broken", "x_pk")):
        registry.register(TableRegistration(
            service="svc", cluster="c1", db="tpch", table=t, pk_cols=[pk]))

    def loader(reg):
        if reg.table == "broken":
            raise IOError("source unavailable")
        return spark.read.parquet(f"{sf_dir}/{reg.table}.parquet")

    results = run_due_snapshots_parallel(
        spark, registry, loader, str(tmp_path / "o"), max_workers=3)
    assert results["svc.c1.tpch.region.v0"]["total_records"] == 5
    assert results["svc.c1.tpch.nation.v0"]["total_records"] == 25
    assert "error" in results["svc.c1.tpch.broken.v0"]
    # failed table stays due for retry; successes are cleared
    due = {r.key for r in registry.tables_needing_snapshot()}
    assert due == {"svc.c1.tpch.broken.v0"}


def test_run_snapshot_job_avro(spark, tmp_path, sf_dir):
    """E2E avro snapshot (jobs dispatch through the codec registry,
    encoder/encoder.go:91-97): parquet-contained binary records, a
    _SCHEMA doc written before _DONE (the schema-first event order of
    streamer/snapshot.go:231-234), and a lossless decode back."""
    import pyspark.sql.types as T

    from storagetapper_spark.functions.avro_codec import decode_avro_binary

    registry = Registry(str(tmp_path / "reg.json"))
    reg = registry.register(TableRegistration(
        service="svc", cluster="c1", db="tpch", table="region",
        pk_cols=["r_regionkey"], output_format="avro"))
    src = spark.read.parquet(f"{sf_dir}/region.parquet")
    manifest = run_snapshot_job(
        spark, registry, reg, src, str(tmp_path / "out"), compression=None)
    assert manifest["total_records"] == 5
    out_dir = os.path.join(str(tmp_path / "out"), "svc.tpch.region.v0")
    assert os.path.exists(os.path.join(out_dir, "_DONE"))
    avsc = json.load(open(os.path.join(out_dir, "_SCHEMA")))
    assert avsc["name"] == "region"
    assert [f["name"] for f in avsc["fields"]][-3:] == \
        ["row_key", "ref_key", "is_deleted"]
    back_schema = T.StructType([
        T.StructField("r_regionkey", T.LongType()),
        T.StructField("r_name", T.StringType()),
        T.StructField("row_key", T.BinaryType()),
        T.StructField("ref_key", T.LongType()),
        T.StructField("is_deleted", T.BooleanType()),
    ])
    decoded = decode_avro_binary(
        spark.read.parquet(out_dir), avsc, back_schema)
    rows = {r.r_regionkey: r for r in decoded.collect()}
    assert len(rows) == 5
    assert rows[0].ref_key == -1 and rows[0].is_deleted is False
    assert rows[0].r_name == "AFRICA"


def test_run_snapshot_job_msgpack(spark, tmp_path, sf_dir):
    """E2E msgpack snapshot: binary common-format events round-trip."""
    from storagetapper_spark.functions.msgpack_codec import decode_msgpack

    registry = Registry(str(tmp_path / "reg.json"))
    reg = registry.register(TableRegistration(
        service="svc", cluster="c1", db="tpch", table="nation",
        pk_cols=["n_nationkey"], output_format="msgpack"))
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    manifest = run_snapshot_job(
        spark, registry, reg, src, str(tmp_path / "out"), compression=None)
    assert manifest["total_records"] == 25
    out_dir = os.path.join(str(tmp_path / "out"), "svc.tpch.nation.v0")
    doc = json.load(open(os.path.join(out_dir, "_SCHEMA")))
    assert doc["table"] == "nation" and doc["pk"] == ["n_nationkey"]
    decoded = decode_msgpack(spark.read.parquet(out_dir)).select("event.*")
    evs = decoded.collect()
    assert len(evs) == 25
    assert all(e.Type == "insert" and e.SeqNo == -1 for e in evs)
    names = {f["Name"] for e in evs for f in e.Fields}
    assert "n_name" in names
