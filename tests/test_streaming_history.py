"""Batch-incremental SCD2 / IVM maintenance: folding micro-batches must
equal the one-shot computation over the concatenated changelog."""

import math

from pyspark.sql import functions as F

from storagetapper_spark.operators.history import scd2_history
from storagetapper_spark.operators.merge import latest_state
from storagetapper_spark.plans.common import events_t
from storagetapper_spark.sources.changelog import events_as_changelog
from storagetapper_spark.streaming.history import (
    apply_delta_batch,
    scd2_apply_batch,
)


def _changelog(spark, sf_dir):
    ev = events_t(spark, sf_dir).select(
        "event_id", "user_id", "event_type",
        F.round("value", 2).alias("value"))
    return events_as_changelog(ev)


def _batches(cdc, cuts):
    lo = None
    for hi in [*cuts, None]:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("seqno") >= lo)
        if hi is not None:
            cond = cond & (F.col("seqno") < hi)
        yield cdc.where(cond)
        lo = hi


def _scd2_key(r):
    return (r.user_id, r.valid_from, r.valid_to, r.is_current,
            r.event_type, r.value)


def test_scd2_incremental_equals_full(spark, sf_dir):
    cdc = _changelog(spark, sf_dir)
    state = None
    for b in _batches(cdc, [300, 700]):
        state = scd2_apply_batch(state, b, pk_cols=["user_id"])
    got = sorted(_scd2_key(r) for r in state.collect())
    want = sorted(_scd2_key(r)
                  for r in scd2_history(cdc, pk_cols=["user_id"]).collect())
    assert got == want


def test_scd2_apply_batch_replay_is_idempotent(spark, sf_dir):
    cdc = _changelog(spark, sf_dir)
    batches = list(_batches(cdc, [500]))
    once = scd2_apply_batch(scd2_apply_batch(None, batches[0], ["user_id"]),
                            batches[1], ["user_id"])
    replayed = scd2_apply_batch(once, batches[1], ["user_id"])  # same batch again
    got = sorted(_scd2_key(r) for r in replayed.collect())
    want = sorted(_scd2_key(r) for r in once.collect())
    assert got == want


def test_delta_fold_equals_direct_aggregate(spark, sf_dir):
    cdc = _changelog(spark, sf_dir).withColumn(
        "bucket", (F.col("user_id") % 10).cast("long"))
    agg, keystate = None, None
    for b in _batches(cdc, [250, 500, 750]):
        agg, keystate = apply_delta_batch(
            agg, keystate, b, pk_cols=["user_id"], value_col="value",
            group_col="bucket")
        # materialize each generation (foreachBatch persists to the
        # state dir in production; plans would otherwise stack)
        agg = b.sparkSession.createDataFrame(agg.collect(), agg.schema)
        keystate = b.sparkSession.createDataFrame(
            keystate.collect(), keystate.schema)
    state = latest_state(cdc, pk_cols=["user_id"])
    direct = {r.bucket: (float(r.s), r.n) for r in
              state.groupBy("bucket")
                   .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
                        F.count(F.lit(1)).alias("n")).collect()}
    folded = {r.bucket: (float(r.sum_value), r.n_live) for r in agg.collect()}
    for b, (s, n) in direct.items():
        fs, fn = folded[b]
        assert fn == n, b
        assert math.isclose(fs, s, abs_tol=1e-9), b
    # buckets never touched by a live key may exist with zero totals
    for b, (fs, fn) in folded.items():
        if b not in direct:
            assert fn == 0 and fs == 0.0


def test_keystate_tracks_latest_per_key(spark, sf_dir):
    cdc = _changelog(spark, sf_dir).withColumn(
        "bucket", (F.col("user_id") % 10).cast("long"))
    agg, keystate = apply_delta_batch(
        None, None, cdc, pk_cols=["user_id"], value_col="value",
        group_col="bucket")
    ks = {r.user_id: (float(r.last_value), r.live) for r in keystate.collect()}
    latest = latest_state(cdc, pk_cols=["user_id"], drop_deleted=False)
    for r in latest.collect():
        lv, live = ks[r.user_id]
        if r.op == "delete":
            assert (lv, live) == (0.0, 0)
        else:
            assert live == 1 and math.isclose(lv, r.value, abs_tol=1e-9)
