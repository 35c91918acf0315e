"""Streaming per-day HLL sketch maintenance: incremental == one-shot,
replay-idempotent, and the end-to-end file-source sink."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.plans.common import events_t
from storagetapper_spark.streaming.sketches import (
    day_sketches,
    merge_sketch_batch,
    read_estimates,
    sketch_sink,
)


def _estimates(sk_df):
    return {str(r.d): round(r.est)
            for r in sk_df.select(
                "d", F.hll_sketch_estimate("sk").alias("est")).collect()}


def test_incremental_merge_equals_one_shot(spark, sf_dir):
    ev_full = events_t(spark, sf_dir)
    parts = [ev_full.where(F.col("event_id") % 3 == i) for i in range(3)]
    state = None
    for b in parts:
        state = merge_sketch_batch(state, day_sketches(b))
    got = _estimates(state)
    want = _estimates(day_sketches(ev_full))
    assert got == want  # Spark HLL is deterministic; merge is associative


def test_merge_replay_is_idempotent(spark, sf_dir):
    ev = events_t(spark, sf_dir)
    b0 = ev.where(F.col("event_id") % 2 == 0)
    b1 = ev.where(F.col("event_id") % 2 == 1)
    once = merge_sketch_batch(merge_sketch_batch(None, day_sketches(b0)),
                              day_sketches(b1))
    replayed = merge_sketch_batch(once, day_sketches(b1))  # same batch again
    assert _estimates(replayed) == _estimates(once)  # set semantics


def test_sketch_sink_end_to_end(spark, tmp_path):
    schema = T.StructType([
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
    ])
    src, state, ckpt = (str(tmp_path / d) for d in ("feed", "state", "ckpt"))

    def drop(name, rows):
        os.makedirs(src, exist_ok=True)
        with open(os.path.join(src, name), "w") as f:
            for ts, uid in rows:
                f.write(json.dumps({"ts": ts, "user_id": uid}) + "\n")

    drop("b1.json", [("2026-01-01T10:00:00", 1), ("2026-01-01T11:00:00", 2),
                     ("2026-01-02T09:00:00", 1)])
    stream = (spark.readStream.schema(schema).json(src))
    sketch_sink(stream, state, ckpt).awaitTermination(60)
    est1 = {str(r.day): round(r.est)
            for r in read_estimates(spark, state).withColumnRenamed(
                "d", "day").collect()}
    assert est1 == {"2026-01-01": 2, "2026-01-02": 1}

    # second micro-batch: new user on day 2, repeat user on day 1
    drop("b2.json", [("2026-01-01T12:00:00", 1), ("2026-01-02T10:00:00", 3)])
    stream = (spark.readStream.schema(schema).json(src))
    sketch_sink(stream, state, ckpt).awaitTermination(60)
    est2 = {str(r.day): round(r.est)
            for r in read_estimates(spark, state).withColumnRenamed(
                "d", "day").collect()}
    assert est2 == {"2026-01-01": 2, "2026-01-02": 2}

    # rolling 2-day window union across stored sketches
    rolled = {str(r.day): round(r.est)
              for r in read_estimates(spark, state, window_days=2).collect()}
    assert rolled == {"2026-01-01": 2, "2026-01-02": 3}
