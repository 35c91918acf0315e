"""Streaming CUSUM: incremental folding across ordered micro-batches
equals the one-shot recursion, and matches the batch query's end state."""

import math

from pyspark.sql import functions as F

from storagetapper_spark.plans.common import events_t
from storagetapper_spark.plans.registry import QUERIES
from storagetapper_spark.streaming.cusum import (
    fold_cusum_batch,
    train_baseline,
)


def _daily(ev):
    return (ev.groupBy("event_type", F.to_date("ts").alias("d"))
            .agg(F.count(F.lit(1)).alias("x")))


def _state_key(rows):
    return {r.event_type: (str(r.last_d), round(r.sp, 9), round(r.sn, 9),
                           r.n_alarms_up, r.n_alarms_down) for r in rows}


def test_incremental_folding_equals_one_shot(spark, sf_dir):
    ev = events_t(spark, sf_dir)
    base = train_baseline(ev)
    daily = _daily(ev)
    dates = sorted(r.d for r in daily.select("d").distinct().collect())
    cut1, cut2 = str(dates[len(dates) // 3]), str(dates[2 * len(dates) // 3])
    batches = [daily.where(F.col("d") < cut1),
               daily.where((F.col("d") >= cut1) & (F.col("d") < cut2)),
               daily.where(F.col("d") >= cut2)]
    state = None
    for b in batches:
        state = fold_cusum_batch(state, b, base)
    got = _state_key(state.collect())
    want = _state_key(fold_cusum_batch(None, daily, base).collect())
    assert got == want


def test_stream_end_state_matches_batch_query(spark, sf_dir):
    ev = events_t(spark, sf_dir)
    state = fold_cusum_batch(None, _daily(ev), train_baseline(ev))
    got = {r.event_type: (round(r.sp, 6), round(r.sn, 6))
           for r in state.collect()}
    rows = QUERIES["anomaly_cusum"](spark, sf_dir).collect()
    last: dict = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.d)):
        last[r.event_type] = (r.sp, r.sn)
    for et, (sp, sn) in last.items():
        assert math.isclose(got[et][0], sp, abs_tol=1e-6)
        assert math.isclose(got[et][1], sn, abs_tol=1e-6)


def test_series_absent_from_batch_keeps_state(spark, sf_dir):
    ev = events_t(spark, sf_dir)
    base = train_baseline(ev)
    daily = _daily(ev)
    s1 = fold_cusum_batch(None, daily, base)
    only_click = daily.where("event_type = 'click'").limit(0)
    # an empty batch (no series at all) leaves every state row intact
    s2 = fold_cusum_batch(s1, only_click, base)
    assert _state_key(s2.collect()) == _state_key(s1.collect())
