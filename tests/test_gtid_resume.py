"""GTID-set resume semantics (sources/gtid.py): interval bookkeeping
parity with the reference's incGTID (changelog/mysql.go:718-752),
distributed == pure fold, and the end-to-end crash/replay contract —
an at-least-once redelivery filtered by the saved executed set applies
every transaction exactly once."""

import random

from pyspark.sql import functions as F

from storagetapper_spark.sources.gtid import (GTIDSet, executed_intervals,
                                              filter_unexecuted, fold_batch)

U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
U2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"


def test_parse_roundtrip_and_canonical_form():
    s = GTIDSet.parse(f"{U2}:1-3,{U1.upper()}:7:1-5")
    # uuids lowercased + sorted, singleton kept, adjacent 1-5:7 stays split
    assert s.to_string() == f"{U1}:1-5:7,{U2}:1-3"
    # coalescing: adding 6 bridges 1-5 and 7
    s.add(U1, 6)
    assert s.to_string() == f"{U1}:1-7,{U2}:1-3"


def test_incgtid_semantics():
    s = GTIDSet()
    for g in (1, 2, 3):          # sequential: extend the last interval
        s.add(U1, g)
    assert s.to_string() == f"{U1}:1-3"
    s.add(U1, 10)                # gap: open a new interval
    assert s.to_string() == f"{U1}:1-3:10"
    s.add(U1, 2)                 # re-seen executed gno: no-op
    assert s.to_string() == f"{U1}:1-3:10"
    assert s.contains(U1, 3) and s.contains(U1, 10)
    assert not s.contains(U1, 4) and not s.contains(U2, 1)


def test_insertion_order_invariance():
    gnos = list(range(1, 30)) + [50, 52, 53, 90]
    rng = random.Random(7)
    canon = None
    for _ in range(5):
        order = gnos[:]
        rng.shuffle(order)
        s = GTIDSet()
        for g in order:
            s.add(U1, g)
        canon = canon or s.to_string()
        assert s.to_string() == canon
    assert canon == f"{U1}:1-29:50:52-53:90"


def test_distributed_fold_equals_pure(spark):
    rows = [(f"{U1}:{g}",) for g in (1, 2, 3, 5, 6, 9)] \
        + [(f"{U2.upper()}:{g}",) for g in (4, 2, 3)] \
        + [(f"{U1}:2",)]  # duplicate delivery of an event
    df = spark.createDataFrame(rows, "gtid string").repartition(7)
    got = {(r.uuid, r.start_gno, r.stop_gno)
           for r in executed_intervals(df).collect()}
    assert got == {(U1, 1, 3), (U1, 5, 6), (U1, 9, 9), (U2, 2, 4)}
    folded = fold_batch(GTIDSet.parse(f"{U1}:4"), df)
    assert folded.to_string() == f"{U1}:1-6:9,{U2}:2-4"


def test_gap_events_pass_the_resume_filter(spark):
    state = GTIDSet.parse(f"{U1}:1-5:8-9")
    df = spark.createDataFrame(
        [(f"{U1}:{g}",) for g in (5, 6, 7, 8, 10)], "gtid string")
    kept = sorted(r.gtid for r in filter_unexecuted(df, state).collect())
    # 6,7 sit in the gap (never applied) and 10 is new — all kept;
    # 5 and 8 are in the executed set — dropped
    assert kept == [f"{U1}:10", f"{U1}:6", f"{U1}:7"]


def test_crash_replay_applies_each_transaction_exactly_once(spark):
    """The resume contract end-to-end: run A applies batches 0-1 and
    saves the folded set; the restarted run B redelivers batch 1
    (at-least-once) plus new batch 2.  With filter_unexecuted in
    front of the sink, the union of applied rows equals the
    uninterrupted one-shot run — every transaction exactly once."""
    events = [(f"{U1}:{g}", f"k{g % 4}", g) for g in range(1, 61)] \
        + [(f"{U2}:{g}", f"j{g % 3}", 100 + g) for g in range(1, 31)]
    schema = "gtid string, row_key string, seqno long"
    batches = [
        spark.createDataFrame(
            [e for e in events if int(e[0].split(":")[1]) % 3 == i],
            schema)
        for i in range(3)
    ]
    state = GTIDSet()
    applied = []

    def run(batch, st):
        fresh = filter_unexecuted(batch, st)
        applied.append(fresh)
        return fold_batch(st, fresh)

    # run A: batches 0 and 1
    state = run(batches[0], state)
    state = run(batches[1], state)
    saved = GTIDSet.parse(state.to_string())  # persisted + restored
    # run B (after crash): batch 1 redelivered, then batch 2
    saved = run(batches[1], saved)
    saved = run(batches[2], saved)

    out = applied[0]
    for d in applied[1:]:
        out = out.unionByName(d)
    got = sorted(tuple(r) for r in out.collect())
    want = sorted(events)
    assert got == want  # no transaction lost, none applied twice
    assert saved.to_string() == f"{U1}:1-60,{U2}:1-30"


def test_resume_filter_is_one_broadcast_anti_join(spark):
    state = GTIDSet.parse(f"{U1}:1-1000000")
    df = spark.createDataFrame(
        [(f"{U1}:{g}",) for g in range(1, 50)], "gtid string")
    plan = filter_unexecuted(df, state)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_malformed_gtids_drop_from_fold_but_pass_the_filter(spark):
    """A gtid without a numeric ':gno' suffix parses to a NULL gno: it
    carries no position, so the interval fold skips it (previously the
    NULL island crashed fold_batch's int() on the driver) while the
    resume filter keeps the row — it can never match an executed
    interval, so dropping it would LOSE data."""
    df = spark.createDataFrame(
        [(f"{U1}:1",), (f"{U1}:2",), ("garbage-no-gno",), (f"{U1}:abc",)],
        "gtid string")
    got = {(r.uuid, r.start_gno, r.stop_gno)
           for r in executed_intervals(df).collect()}
    assert got == {(U1, 1, 2)}
    folded = fold_batch(GTIDSet(), df)  # must not raise on NULL gno
    assert folded.to_string() == f"{U1}:1-2"
    kept = sorted(r.gtid for r in filter_unexecuted(df, folded).collect())
    assert kept == [f"{U1}:abc", "garbage-no-gno"]
