"""Registry + schema evolution tests (O6-O8, S4 analogs)."""

from pyspark.sql import types as T

from storagetapper_spark.schema.evolution import apply_change, conform, parse_ddl
from storagetapper_spark.state import Registry, TableRegistration


def _reg(**kw):
    base = dict(service="svc", cluster="c1", db="db1", table="t1",
                pk_cols=["id"])
    base.update(kw)
    return TableRegistration(**base)


def test_register_roundtrip(tmp_path):
    path = str(tmp_path / "registry.json")
    reg = Registry(path)
    reg.register(_reg())
    reg.register(_reg(table="t2", version=3))
    # survives restart (the reference's MySQL state table persistence)
    reg2 = Registry(path)
    assert [t.table for t in reg2.list()] == ["t1", "t2"]
    assert reg2.get("svc.c1.db1.t2.v3").version == 3
    # re-register updates in place (INSERT..ON DUPLICATE KEY)
    reg2.register(_reg(output_format="avro"))
    assert Registry(path).get("svc.c1.db1.t1.v0").output_format == "avro"
    assert reg2.deregister("svc.c1.db1.t1.v0")
    assert not reg2.deregister("missing")


def test_topic_template():
    t = _reg(version=2)
    assert t.topic() == "svc.db1.t1.v2"
    assert t.topic("{cluster}-{table}") == "c1-t1"


def test_snapshot_scheduling(tmp_path):
    reg = Registry(str(tmp_path / "r.json"))
    reg.register(_reg(snapshot_interval_sec=100))
    key = "svc.c1.db1.t1.v0"
    assert [t.key for t in reg.tables_needing_snapshot(now=0)] == [key]
    reg.clear_need_snapshot(key, now=1000.0)
    # not due again until interval elapses (O7 periodic snapshots)
    assert reg.tables_needing_snapshot(now=1050.0) == []
    assert [t.key for t in reg.tables_needing_snapshot(now=1101.0)] == [key]


def test_schema_versioning(tmp_path):
    reg = Registry(str(tmp_path / "r.json"))
    reg.register(_reg())
    v1 = reg.update_schema("svc.c1.db1.t1.v0", '{"fields": []}')
    v2 = reg.update_schema("svc.c1.db1.t1.v0", '{"fields": ["x"]}')
    assert (v1, v2) == (1, 2)


def test_parse_ddl_variants():
    # the 4 ALTER quoting variants (changelog/mysql.go:110-120)
    for stmt in ['ALTER TABLE t1 ADD f2 varchar(32)',
                 'ALTER TABLE `t1` ADD COLUMN f2 varchar(32)',
                 'alter table db1.t1 add f2 varchar(32)',
                 'ALTER TABLE `db1`.`t1` ADD `f2` varchar(32)']:
        c = parse_ddl(stmt)
        assert c.kind == "add" and c.table == "t1" and c.column == "f2"
        assert c.mysql_type == "varchar(32)"
    d = parse_ddl("ALTER TABLE t1 DROP COLUMN f2")
    assert d.kind == "drop" and d.column == "f2"
    r = parse_ddl("RENAME TABLE db1.t1 TO db1.t9")
    assert r.kind == "rename_table" and r.new_table == "t9"
    # FK-only alters are skipped (changelog/mysql.go:583-586)
    fk = parse_ddl("ALTER TABLE t1 ADD CONSTRAINT fk FOREIGN KEY (a) REFERENCES p(id)")
    assert fk.kind == "noop"
    assert parse_ddl("INSERT INTO t1 VALUES (1)") is None


def test_apply_change_and_conform(spark):
    schema = T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ])
    s2 = apply_change(schema, parse_ddl("ALTER TABLE t ADD f2 decimal(8,2)"))
    assert s2["f2"].dataType == T.DecimalType(8, 2)
    s3 = apply_change(s2, parse_ddl("ALTER TABLE t DROP v"))
    assert [f.name for f in s3.fields] == ["id", "f2"]
    # conform an old-schema batch onto the new schema
    old_batch = spark.createDataFrame([(1, "x")], schema)
    out = conform(old_batch, s3)
    assert out.columns == ["id", "f2"]
    assert out.collect()[0].f2 is None


def test_stream_start_offset_resume(tmp_path):
    """GTID-persistence analog (changelog/mysql.go:1019-1043): the
    stream start position recorded before a snapshot survives a registry
    restart, so a re-created stream resumes from it instead of 'latest'
    (SURVEY §7.3 risk 2 — the gap-free handoff)."""
    import json

    from storagetapper_spark.state import Registry, TableRegistration

    path = str(tmp_path / "registry.json")
    reg = Registry(path)
    t = reg.register(TableRegistration(
        service="svc", cluster="c1", db="d1", table="t1",
        pk_cols=["pk"]))

    offsets = json.dumps({"topic.v0": {"0": 120, "1": 98}})
    reg.record_stream_start(t.key, offsets, now=1000.0)

    # registry re-created (process restart, checkpoint lost)
    reg2 = Registry(path)
    assert reg2.stream_resume_point(t.key) == offsets
    assert reg2.get(t.key).stream_started_at == 1000.0
    # unknown stream: no recorded start -> caller must use 'earliest'
    assert reg2.stream_resume_point("nope") is None
