"""Multi-table changelog fan-out + gap-free snapshot↔changelog handoff."""

import pytest
from pyspark.sql import functions as F

from storagetapper_spark.operators.merge import snapshot_changelog_merge
from storagetapper_spark.schema.commonformat import SNAPSHOT_SEQNO
from storagetapper_spark.state import Registry, TableRegistration
from storagetapper_spark.streaming.fanout import fanout_to_files, route_cdc


def _mixed(spark):
    rows = [
        ("db1", "t1", 1, "a", "insert", 1),
        ("db1", "t1", 2, "b", "insert", 2),
        ("db1", "t2", 1, "x", "insert", 3),
        ("db2", "t1", 9, "z", "insert", 4),
    ]
    return spark.createDataFrame(
        rows, "db string, tbl string, pk long, val string, op string, seqno long")


def test_route_cdc(spark, tmp_path):
    registry = Registry(str(tmp_path / "r.json"))
    r1 = registry.register(TableRegistration("s", "c", "db1", "t1", pk_cols=["pk"]))
    r2 = registry.register(TableRegistration("s", "c", "db1", "t2", pk_cols=["pk"]))
    routed = route_cdc(_mixed(spark), [r1, r2])
    assert routed[r1.key].count() == 2
    assert {r.val for r in routed[r2.key].collect()} == {"x"}
    # db2.t1 is unregistered → nowhere (mirror of reference skipping
    # unregistered tables in the binlog stream)


def test_no_pk_refused(spark):
    reg = TableRegistration("s", "c", "db1", "t1", pk_cols=[])
    with pytest.raises(ValueError):
        route_cdc(_mixed(spark), [reg])


def test_fanout_to_files(spark, tmp_path):
    registry = Registry(str(tmp_path / "r.json"))
    registry.register(TableRegistration("s", "c", "db1", "t1", pk_cols=["pk"]))
    registry.register(TableRegistration("s", "c", "db1", "t2", pk_cols=["pk"]))
    res = fanout_to_files(_mixed(spark), registry, str(tmp_path / "out"))
    assert res["s.c.db1.t1.v0"]["total_records"] == 2
    assert res["s.c.db1.t2.v0"]["total_records"] == 1


def test_gap_free_handoff_with_concurrent_writes(spark):
    """Risk register §7.3.2: rows changed DURING the snapshot appear in
    both the snapshot (at some intermediate value) and the changelog.
    Because every changelog seqno ≥ 0 > SNAPSHOT_SEQNO, the merged state
    must equal a pure changelog replay, regardless of which intermediate
    value the snapshot captured."""
    # source history for pk=1: v0 → v1 → v2 (changelog carries all)
    log = spark.createDataFrame(
        [(1, "v0", "insert", 0), (1, "v1", "insert", 1), (1, "v2", "insert", 2),
         (2, "w0", "insert", 3), (2, None, "delete", 4)],
        "pk long, val string, op string, seqno long")
    for snapshot_saw in ("v0", "v1", "v2"):  # any racy capture point
        snap = spark.createDataFrame(
            [(1, snapshot_saw, "insert", SNAPSHOT_SEQNO),
             (2, "w0", "insert", SNAPSHOT_SEQNO),
             (3, "only-in-snap", "insert", SNAPSHOT_SEQNO)],
            "pk long, val string, op string, seqno long")
        got = {r.pk: r.val for r in
               snapshot_changelog_merge(snap, log, ["pk"]).collect()}
        assert got == {1: "v2", 3: "only-in-snap"}
