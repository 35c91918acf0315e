"""Gap-free snapshot↔changelog handoff under concurrent writes
(SURVEY §7.3 risk 2; reference streamer/streamer.go:105-157).

The reference's dance — create the changelog consumer BEFORE the
snapshot, wait for the replica to catch up to the consumer's start
GTID, give snapshot rows MAX seqno so binlog events supersede them —
collapses in Spark to: (a) the changelog feed's checkpoint/start offset
is recorded before the batch snapshot read, (b) snapshot rows carry
seqno = -1 (SNAPSHOT_SEQNO) so every changelog event (seqno ≥ 0) wins,
(c) max-seqno-wins is idempotent so overlap between the snapshot and
already-buffered changelog events is harmless.
"""

import json
import os

from pyspark.sql import types as T

from storagetapper_spark.sources.snapshot import SNAPSHOT_SEQNO
from storagetapper_spark.streaming.pipeline import (
    incremental_upsert_sink,
    read_changelog_stream,
    read_state,
)

CDC_SCHEMA = T.StructType([
    T.StructField("pk", T.LongType()),
    T.StructField("val", T.StringType()),
    T.StructField("op", T.StringType()),
    T.StructField("seqno", T.LongType()),
])


def _drop(path, name, events):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def test_snapshot_handoff_with_concurrent_writes(spark, tmp_path):
    src = str(tmp_path / "feed")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    # changelog events already flowing BEFORE the snapshot begins —
    # pk=1 is updated concurrently, pk=2 will be deleted mid-snapshot
    _drop(src, "b1.json", [
        {"pk": 1, "val": "binlog-early", "op": "insert", "seqno": 10},
    ])

    # consistent snapshot of the source table, seqno = -1: rows 1-4.
    # The snapshot OVERLAPS b1 (pk=1 appears in both) — exactly the
    # reference scenario where the row read by the snapshot is older
    # than a buffered binlog event for the same key.
    snap = spark.createDataFrame(
        [(pk, f"snap-{pk}", "insert", SNAPSHOT_SEQNO) for pk in (1, 2, 3, 4)],
        CDC_SCHEMA)
    os.makedirs(state, exist_ok=True)
    snap.write.mode("overwrite").parquet(os.path.join(state, "current"))

    # writes that land WHILE the snapshot is materializing
    _drop(src, "b2.json", [
        {"pk": 2, "val": None, "op": "delete", "seqno": 11},
        {"pk": 5, "val": "binlog-new", "op": "insert", "seqno": 12},
    ])

    # stream drains everything from the recorded start (checkpoint is
    # fresh → reads b1 AND b2) and merges onto the snapshot state
    q = incremental_upsert_sink(
        read_changelog_stream(spark, src, CDC_SCHEMA), state, ckpt,
        pk_cols=["pk"])
    q.awaitTermination(60)

    got = {r.pk: (r.val, r.seqno) for r in read_state(spark, state).collect()}
    assert got[1] == ("binlog-early", 10)   # changelog beats snapshot
    assert 2 not in got                     # concurrent delete propagated
    assert got[3] == ("snap-3", SNAPSHOT_SEQNO)   # untouched keys survive
    assert got[4] == ("snap-4", SNAPSHOT_SEQNO)
    assert got[5] == ("binlog-new", 12)     # row born during the snapshot

    # resume from the recorded offset: a re-created stream with the SAME
    # checkpoint must process only the new file, and replayed history
    # (still on disk) must not regress the state (idempotence)
    _drop(src, "b3.json", [
        {"pk": 3, "val": "binlog-late", "op": "insert", "seqno": 13},
    ])
    q2 = incremental_upsert_sink(
        read_changelog_stream(spark, src, CDC_SCHEMA), state, ckpt,
        pk_cols=["pk"])
    q2.awaitTermination(60)

    got = {r.pk: (r.val, r.seqno) for r in read_state(spark, state).collect()}
    assert got[3] == ("binlog-late", 13)
    assert got[1] == ("binlog-early", 10)
    assert 2 not in got
