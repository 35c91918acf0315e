"""Streaming absorption state: stream == batch bit-exactness against
the REGISTERED events_absorption_funnel query (batches split on
user_id so no transition straddles a batch), replay idempotence, and
probability bounds on the served rows."""

from pyspark.sql import functions as F

from storagetapper_spark.plans.common import events_t
from storagetapper_spark.plans.registry import QUERIES
from storagetapper_spark.streaming import absorption as AB


def test_streamed_absorption_equals_registered_batch_query(spark, sf_dir,
                                                           tmp_path):
    state = str(tmp_path / "ab")
    ev = events_t(spark, sf_dir)
    for i in range(3):
        AB.ingest_batch(spark, ev.filter(F.col("user_id") % 3 == i),
                        i, state)
    got = sorted(tuple(r) for r in
                 AB.current_absorption(spark, state).collect())
    want = sorted(tuple(r) for r in
                  QUERIES["events_absorption_funnel"](spark,
                                                      sf_dir).collect())
    assert got == want


def test_replay_idempotent_and_bounds(spark, sf_dir, tmp_path):
    state = str(tmp_path / "ab")
    ev = events_t(spark, sf_dir)
    first = ev.filter(F.col("user_id") % 3 == 0)
    AB.ingest_batch(spark, first, 0, state)
    before = sorted(tuple(r) for r in
                    AB.current_transitions(spark, state).collect())
    AB.ingest_batch(spark, first, 0, state)  # at-least-once redelivery
    after = sorted(tuple(r) for r in
                   AB.current_transitions(spark, state).collect())
    assert after == before
    for r in AB.current_absorption(spark, state).collect():
        assert 0 <= r.one_step_nano <= r.absorb_8_nano <= 1_000_000_000
