"""Snapshot scan, row filters, column pruning, update decomposition,
key extraction (S1/S3/P1/P2/P5)."""

import pytest
from pyspark.sql import functions as F

from storagetapper_spark.functions.keys import row_key_expr
from storagetapper_spark.schema.commonformat import SNAPSHOT_SEQNO
from storagetapper_spark.sources.changelog import decompose_updates, events_as_changelog
from storagetapper_spark.sources.snapshot import RowFilter, prune_columns, snapshot_scan


def test_snapshot_scan_columns(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    out = snapshot_scan(df, pk_cols=["id"])
    rows = out.collect()
    assert out.columns == ["id", "v", "op", "seqno", "row_key", "ts"]
    assert all(r.op == "insert" and r.seqno == SNAPSHOT_SEQNO for r in rows)
    assert {r.row_key for r in rows} == {"11", "12"}


def test_row_filter_or_and(spark):
    df = spark.createDataFrame(
        [(1, "x", 5.0), (2, "y", 50.0), (3, "x", 500.0)],
        "id long, tag string, val double")
    out = snapshot_scan(df, ["id"], filters=[
        RowFilter("tag", ["x", "y"], "=", "or"),
        RowFilter("val", [10.0], ">", "and"),
    ])
    assert {r.id for r in out.collect()} == {2, 3}


def test_row_filter_like_and_unsupported(spark):
    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "id long, s string")
    out = snapshot_scan(df, ["id"], filters=[RowFilter("s", ["a%"], "like")])
    assert [r.id for r in out.collect()] == [1]
    with pytest.raises(ValueError):
        RowFilter("s", ["a"], "regexp").to_column()


def test_prune_protects_pk(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], "id long, v string, x double")
    out = prune_columns(df, output_columns=["v"], pk_cols=["id"])
    assert out.columns == ["id", "v"]
    # PK requested for drop is still kept
    out2 = prune_columns(df, output_columns=[], pk_cols=["id"])
    assert out2.columns == ["id"]


def test_row_key_length_prefix(spark):
    # encoder/encoder.go:101-116 — len(v)+v per PK column
    df = spark.createDataFrame([(12, 345), (1, 2)], "a long, b long")
    keys = {tuple([r.a, r.b]): r.k for r in
            df.select("a", "b", row_key_expr(["a", "b"]).alias("k")).collect()}
    assert keys[(12, 345)] == "2123345"
    assert keys[(1, 2)] == "1112"


def test_decompose_updates(spark):
    cdc = spark.createDataFrame(
        [(1, "u1", "update", 5), (2, "i1", "insert", 6), (3, "d1", "delete", 7)],
        "pk long, val string, op string, seqno long")
    out = decompose_updates(cdc).collect()
    by = sorted([(r.op, r.seqno, r.pk) for r in out])
    # update 5 → delete@10, insert@11; insert 6 → 13; delete 7 → 15
    assert by == [("delete", 10, 1), ("delete", 15, 3),
                  ("insert", 11, 1), ("insert", 13, 2)]


def test_decompose_no_delete_on_update(spark):
    cdc = spark.createDataFrame([(1, "u", "update", 5)],
                                "pk long, val string, op string, seqno long")
    out = decompose_updates(cdc, no_delete_on_update=True).collect()
    assert [(r.op, r.seqno) for r in out] == [("insert", 11)]


def test_events_as_changelog_mapping(spark, sf_dir):
    from storagetapper_spark.plans.common import events_t
    ev = events_t(spark, sf_dir)
    cdc = events_as_changelog(ev)
    ops = {r.event_type: r.op for r in
           cdc.select("event_type", "op").distinct().collect()}
    assert ops["signup"] == "insert" and ops["error"] == "delete"
    assert ops["click"] == ops["view"] == ops["purchase"] == "update"


def test_ordering_contract_after_decompose(spark):
    """§4.3: for one PK, sorting by seqno gives delete-before-insert for
    each update, and preserves original event order."""
    cdc = spark.createDataFrame(
        [(1, "a", "update", 1), (1, "b", "update", 2)],
        "pk long, val string, op string, seqno long")
    seq = [(r.op, r.val) for r in
           decompose_updates(cdc).orderBy("seqno").collect()]
    assert seq == [("delete", "a"), ("insert", "a"),
                   ("delete", "b"), ("insert", "b")]


def test_snapshot_diff(spark):
    """Minimal change set between two snapshots: insert/update/delete,
    unchanged rows dropped."""
    from storagetapper_spark.operators.snapshot_diff import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "pk long, v string, x double")
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged
         (2, "b2", 20.0),         # update
         (4, "d", 40.0)],         # insert; pk=3 deleted
        "pk long, v string, x double")
    got = {r.pk: (r.op, r.v, r.x) for r in
           snapshot_diff(old, new, ["pk"]).collect()}
    assert got == {2: ("update", "b2", 20.0),
                   3: ("delete", None, None),
                   4: ("insert", "d", 40.0)}
