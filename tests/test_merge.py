"""Latest-state / upsert / snapshot-changelog-merge semantics (E5/O1,
SURVEY.md §4.3 — the per-PK max-seqno-wins invariant)."""

from storagetapper_spark.operators.merge import (
    idempotent_upsert,
    latest_state,
    snapshot_changelog_merge,
)
from storagetapper_spark.schema.commonformat import SNAPSHOT_SEQNO

CDC_SCHEMA = "pk long, val string, op string, seqno long"


def test_latest_state_max_seqno_wins(spark):
    cdc = spark.createDataFrame([
        (1, "a", "insert", 1),
        (1, "b", "insert", 5),
        (1, "c", "insert", 3),
        (2, "x", "insert", 2),
    ], CDC_SCHEMA)
    got = {r.pk: r.val for r in latest_state(cdc, ["pk"]).collect()}
    assert got == {1: "b", 2: "x"}


def test_latest_state_delete_wins_and_drops(spark):
    cdc = spark.createDataFrame([
        (1, "a", "insert", 1),
        (1, None, "delete", 9),
        (2, "x", "insert", 2),
    ], CDC_SCHEMA)
    got = latest_state(cdc, ["pk"]).collect()
    assert {r.pk for r in got} == {2}
    # tombstones kept when requested
    kept = latest_state(cdc, ["pk"], drop_deleted=False).collect()
    assert {r.pk: r.op for r in kept} == {1: "delete", 2: "insert"}


def test_latest_state_update_pair_tiebreak(spark):
    # update decomposed to delete+insert at the same seqno: insert wins
    cdc = spark.createDataFrame([
        (1, None, "delete", 7),
        (1, "after", "insert", 7),
    ], CDC_SCHEMA)
    got = latest_state(cdc, ["pk"]).collect()
    assert len(got) == 1 and got[0].val == "after"


def test_snapshot_superseded_by_changelog(spark):
    snap = spark.createDataFrame(
        [(1, "snap", "insert", SNAPSHOT_SEQNO), (2, "snap", "insert", SNAPSHOT_SEQNO)],
        CDC_SCHEMA)
    log = spark.createDataFrame([(1, "log", "insert", 0)], CDC_SCHEMA)
    got = {r.pk: r.val for r in
           snapshot_changelog_merge(snap, log, ["pk"]).collect()}
    # seqno 0 (first changelog event) still beats the snapshot's -1
    assert got == {1: "log", 2: "snap"}


def test_idempotent_upsert_guard(spark):
    existing = spark.createDataFrame([(1, "cur", "insert", 10)], CDC_SCHEMA)
    stale = spark.createDataFrame([(1, "old", "insert", 5)], CDC_SCHEMA)
    fresh = spark.createDataFrame([(1, "new", "insert", 15)], CDC_SCHEMA)
    assert idempotent_upsert(existing, stale, ["pk"]).collect()[0].val == "cur"
    assert idempotent_upsert(existing, fresh, ["pk"]).collect()[0].val == "new"
    # replay is a no-op (at-least-once convergence, pipe/kafka.go:43-53)
    twice = idempotent_upsert(idempotent_upsert(existing, fresh, ["pk"]),
                              fresh, ["pk"])
    assert twice.collect()[0].val == "new"


def test_composite_pk(spark):
    cdc = spark.createDataFrame([
        (1, 1, "a", "insert", 1),
        (1, 2, "b", "insert", 2),
        (1, 1, "c", "insert", 3),
    ], "k1 long, k2 long, val string, op string, seqno long")
    got = {(r.k1, r.k2): r.val for r in latest_state(cdc, ["k1", "k2"]).collect()}
    assert got == {(1, 1): "c", (1, 2): "b"}


def test_strategies_agree(spark):
    import random
    rnd = random.Random(7)
    rows = [(rnd.randrange(50), f"v{i}",
             rnd.choice(["insert", "delete"]), i)
            for i in range(500)]
    cdc = spark.createDataFrame(rows, CDC_SCHEMA)
    a = {(r.pk, r.val, r.seqno) for r in
         latest_state(cdc, ["pk"], strategy="agg").collect()}
    w = {(r.pk, r.val, r.seqno) for r in
         latest_state(cdc, ["pk"], strategy="window").collect()}
    assert a == w
    # tombstone retention agrees too
    a2 = {(r.pk, r.op) for r in
          latest_state(cdc, ["pk"], strategy="agg", drop_deleted=False).collect()}
    w2 = {(r.pk, r.op) for r in
          latest_state(cdc, ["pk"], strategy="window", drop_deleted=False).collect()}
    assert a2 == w2


def test_consistent_cut_low_watermark(spark):
    """The cut is min-over-tables of max(seqno); events beyond it are
    excluded even for the table that HAS them."""
    from storagetapper_spark.operators.merge import consistent_cut

    rows = [("a", 1, 10), ("a", 1, 50),      # table a reached seqno 50
            ("b", 2, 20), ("b", 2, 30)]      # table b only reached 30
    df = spark.createDataFrame(rows, "table string, pk long, seqno long")
    out = consistent_cut(df).collect()
    assert all(r.cut_seqno == 30 for r in out)
    assert {(r.table, r.seqno) for r in out} == {("a", 10), ("b", 20),
                                                 ("b", 30)}
