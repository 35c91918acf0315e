"""Throttle translation (O5) and streaming watchdog (O9)."""

import json
import os

from pyspark.sql import types as T

from storagetapper_spark.streaming.monitor import ProgressRecorder, Watchdog
from storagetapper_spark.throttle import SlidingWindowRate, ThrottleConfig, source_options


def test_source_options_iops():
    opts = source_options(ThrottleConfig(target_iops=5000), trigger_interval_sec=2.0)
    assert opts["maxOffsetsPerTrigger"] == "10000"
    assert opts["fetchsize"] == "5000"


def test_source_options_mbs():
    opts = source_options(ThrottleConfig(target_mb_per_sec=128.0),
                          avg_event_bytes=1024, avg_file_bytes=64 << 20)
    assert opts["maxFilesPerTrigger"] == "1"
    assert int(opts["maxOffsetsPerTrigger"]) == 125000
    # unlimited → no options (reference default: throttling off)
    assert source_options(ThrottleConfig()) == {}


def test_sliding_window_rate():
    sw = SlidingWindowRate(target_per_sec=100.0)
    assert sw.advice(100, now=0.0) == 0.0          # warm-up
    assert sw.advice(100, now=1.0) == 0.0          # at target
    adv = sw.advice(300, now=2.0)                  # burst over target
    assert adv > 0.0
    sw2 = SlidingWindowRate(target_per_sec=0.0)    # unlimited
    sw2.advice(1e9, 0.0)
    assert sw2.advice(1e9, 1.0) == 0.0


def test_progress_recorder_and_watchdog(spark, tmp_path):
    src = str(tmp_path / "mon_src")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        for i in range(5):
            f.write(json.dumps({"x": i}) + "\n")

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        stream = spark.readStream.schema(
            T.StructType([T.StructField("x", T.LongType())])).json(src)
        q = (stream.writeStream.format("memory").queryName("mon_out")
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        # listener callbacks are async — wait for delivery
        import time
        for _ in range(40):
            p = rec.progress.get(str(q.id))
            if p and p.get("rows", 0) >= 5:
                break
            time.sleep(0.25)
        p = rec.progress[str(q.id)]
        assert p["rows"] == 5 and p["batches"] >= 1

        # watchdog: fresh progress → not stalled; stale clock → stalled
        wd = Watchdog(rec, stall_sec=300)
        assert wd.stalled(now=p["last_progress_at"] + 10) == []
        dead = wd.stalled(now=p["last_progress_at"] + 1000)
        if "terminated_at" not in p:
            assert str(q.id) in dead
    finally:
        spark.streams.removeListener(rec)


def test_stateful_metrics_in_recorder(spark, tmp_path):
    """Conflation telemetry: state rows/memory + conflation ratio from
    stateOperators progress."""
    from storagetapper_spark.streaming.stateful import conflate_cdc

    src = str(tmp_path / "conf_src")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        for i in range(10):   # 10 events, 2 keys -> ratio 0.2
            f.write(json.dumps({"pk": i % 2, "val": f"v{i}",
                                "op": "insert", "seqno": i}) + "\n")

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        stream = spark.readStream.schema(
            "pk long, val string, op string, seqno long").json(src)
        conf = conflate_cdc(stream, ["pk"], ["val"])
        q = (conf.writeStream.format("memory").queryName("conf_out")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(90)
        import time
        for _ in range(40):
            p = rec.progress.get(str(q.id))
            if p and "state_rows" in p:
                break
            time.sleep(0.25)
        p = rec.progress[str(q.id)]
        assert p["state_rows"] == 2            # one state row per key
        assert p["state_memory_bytes"] > 0
        assert p["conflation_ratio"] == 0.2    # 10 events -> 2 outputs
    finally:
        spark.streams.removeListener(rec)


def test_observed_feed_metrics(spark, tmp_path):
    """df.observe content metrics reach the recorder: rows, max seqno,
    delete count must match what was actually written to the feed."""
    import json
    import os
    import time

    from pyspark.sql import types as T

    from storagetapper_spark.streaming.monitor import (
        ProgressRecorder,
        with_feed_metrics,
    )
    from storagetapper_spark.streaming.pipeline import read_changelog_stream

    schema = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("seqno", T.LongType()),
    ])
    src = str(tmp_path / "feed")
    os.makedirs(src)
    events = [{"pk": i, "op": "delete" if i % 3 == 0 else "insert",
               "seqno": 100 + i} for i in range(30)]
    with open(os.path.join(src, "b.json"), "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        stream = with_feed_metrics(read_changelog_stream(spark, src, schema))
        q = (stream.writeStream.format("noop")
             .option("checkpointLocation", str(tmp_path / "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(60)
        # listener delivery is async — poll briefly
        deadline = time.time() + 20
        obs = None
        while time.time() < deadline:
            p = rec.progress.get(str(q.id), {})
            obs = p.get("observed", {}).get("feed")
            if obs and obs["rows"] >= 30:
                break
            time.sleep(0.5)
        assert obs is not None
        assert obs["rows"] == 30
        assert obs["max_seqno"] == 129
        assert obs["deletes"] == sum(1 for e in events if e["op"] == "delete")
    finally:
        spark.streams.removeListener(rec)
