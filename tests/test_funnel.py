"""Generalized N-step funnel operator: greedy earliest-match semantics,
horizon bound, and equivalence with the oracle-matched 3-step SQL query."""

from datetime import datetime

from pyspark.sql import functions as F

from storagetapper_spark.operators.funnel import funnel, funnel_counts


def _ev(uid, typ, ts):
    return (uid, typ, datetime.fromisoformat(ts))


def test_funnel_semantics(spark):
    events = spark.createDataFrame([
        # u1 completes all 3 in order
        _ev(1, "a", "2024-01-01T00:00:00"),
        _ev(1, "b", "2024-01-01T01:00:00"),
        _ev(1, "c", "2024-01-01T02:00:00"),
        # u2: step2 happens BEFORE step1 -> only step1 counts
        _ev(2, "b", "2024-01-01T00:00:00"),
        _ev(2, "a", "2024-01-01T01:00:00"),
        # u3: same-timestamp step1+step2 -> >= semantics, both count
        _ev(3, "a", "2024-01-01T00:00:00"),
        _ev(3, "b", "2024-01-01T00:00:00"),
        # u4: noise types ignored; c before b ignored, later c counts
        _ev(4, "a", "2024-01-01T00:00:00"),
        _ev(4, "x", "2024-01-01T00:30:00"),
        _ev(4, "c", "2024-01-01T01:00:00"),
        _ev(4, "b", "2024-01-01T02:00:00"),
        _ev(4, "c", "2024-01-01T03:00:00"),
    ], "user_id long, event_type string, ts timestamp")

    f = funnel(events, ["a", "b", "c"])
    got = {r.user_id: r.steps_completed for r in f.collect()}
    assert got == {1: 3, 2: 1, 3: 2, 4: 3}

    counts = funnel_counts(f, 3).collect()[0]
    assert (counts.step1, counts.step2, counts.step3) == (4, 3, 2)


def test_funnel_horizon(spark):
    events = spark.createDataFrame([
        _ev(1, "a", "2024-01-01T00:00:00"),
        _ev(1, "b", "2024-01-03T00:00:00"),   # beyond 1-day horizon
        _ev(2, "a", "2024-01-01T00:00:00"),
        _ev(2, "b", "2024-01-01T12:00:00"),   # within
    ], "user_id long, event_type string, ts timestamp")
    f = funnel(events, ["a", "b"], horizon_seconds=86400)
    got = {r.user_id: r.steps_completed for r in f.collect()}
    assert got == {1: 1, 2: 2}


def test_funnel_matches_sql_chain(spark, sf_dir):
    """Greedy walk == the min-agg chain the DuckDB oracle verified."""
    from storagetapper_spark.plans.timeseries2 import funnel_view_click_purchase

    sql_counts = funnel_view_click_purchase(spark, sf_dir).collect()[0]
    from storagetapper_spark.plans.common import events_t
    ev = events_t(spark, sf_dir)
    f = funnel(ev, ["view", "click", "purchase"],
               horizon_seconds=7 * 86400)
    ops = funnel_counts(f, 3).collect()[0]
    assert ops.step1 == sql_counts.step1_view
    assert ops.step2 == sql_counts.step2_click
    assert ops.step3 == sql_counts.step3_purchase
