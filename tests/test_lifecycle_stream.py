"""Streaming growth accounting: incremental == batch, replay-idempotent."""

import os

from pyspark.sql import functions as F

from storagetapper_spark.plans.relational11 import events_user_lifecycle
from storagetapper_spark.plans.common import events_t
from storagetapper_spark.streaming import lifecycle as L


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_lifecycle_equals_batch(spark, sf_dir, tmp_path):
    state = str(tmp_path / "state")
    ev = events_t(spark, sf_dir)
    # three chunks split by day ranges (simulating day-ordered arrival)
    chunks = [
        ev.filter(F.col("ts").cast("date") <= F.lit("2024-01-10")),
        ev.filter((F.col("ts").cast("date") > F.lit("2024-01-10"))
                  & (F.col("ts").cast("date") <= F.lit("2024-01-20"))),
        ev.filter(F.col("ts").cast("date") > F.lit("2024-01-20")),
    ]
    for i, ch in enumerate(chunks):
        L.ingest_batch(spark, ch, i, state)
    got = _rows(L.current_lifecycle(spark, state))
    want = _rows(events_user_lifecycle(spark, sf_dir))
    assert got == want


def test_streaming_lifecycle_replay_idempotent(spark, sf_dir, tmp_path):
    state = str(tmp_path / "state")
    ev = events_t(spark, sf_dir)
    first = ev.filter(F.col("ts").cast("date") <= F.lit("2024-01-15"))
    L.ingest_batch(spark, first, 0, state)
    before = _rows(L.current_lifecycle(spark, state))
    # at-least-once replay of the SAME batch id must replace, not add
    L.ingest_batch(spark, first, 0, state)
    after = _rows(L.current_lifecycle(spark, state))
    assert before == after
    # presence rows did not duplicate
    n = (spark.read.parquet(state)
         .groupBy("user_id", "day").count()
         .filter(F.col("count") > 1).count())
    assert n == 0


def test_streaming_lifecycle_out_of_order_chunks(spark, sf_dir, tmp_path):
    """Late-arriving EARLIER days reclassify retroactively — order of
    ingestion must not matter."""
    state = str(tmp_path / "state")
    ev = events_t(spark, sf_dir)
    late = ev.filter(F.col("ts").cast("date") <= F.lit("2024-01-10"))
    early = ev.filter(F.col("ts").cast("date") > F.lit("2024-01-10"))
    L.ingest_batch(spark, early, 0, state)
    L.ingest_batch(spark, late, 1, state)
    got = _rows(L.current_lifecycle(spark, state))
    want = _rows(events_user_lifecycle(spark, sf_dir))
    assert got == want


def test_lifecycle_available_now_stream(spark, sf_dir, tmp_path):
    """End-to-end through a real Structured Streaming query: split the
    events fixture into parquet files, stream them with
    maxFilesPerTrigger=1 via foreachBatch, and the folded decomposition
    must equal the batch query."""
    src_dir = str(tmp_path / "src")
    ev = events_t(spark, sf_dir).select("user_id", "ts")
    ev.repartition(3).write.parquet(src_dir)
    source = (spark.readStream
              .schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(src_dir))
    state = str(tmp_path / "state")
    q = (source.writeStream
         .foreachBatch(L.lifecycle_sink(state))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    got = _rows(L.current_lifecycle(spark, state))
    want = _rows(events_user_lifecycle(spark, sf_dir))
    assert got == want
