"""As-of join and time-range join semantics."""

import datetime as dt

from storagetapper_spark.operators.asof import asof_join, time_range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:00"), 100.0),
         ("A", _ts("2024-01-01T10:05:00"), 101.0),
         ("B", _ts("2024-01-01T10:01:00"), 50.0)],
        "sym string, ts timestamp, px double")
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:03:00"), 10),   # after 10:00 quote
         ("A", _ts("2024-01-01T10:05:00"), 20),   # ties quote → inclusive
         ("A", _ts("2024-01-01T09:59:00"), 30),   # before any quote
         ("B", _ts("2024-01-01T11:00:00"), 40)],
        "sym string, ts timestamp, qty int")
    got = {r.qty: r.px_asof for r in
           asof_join(trades, quotes, by=["sym"]).collect()}
    assert got == {10: 100.0, 20: 101.0, 30: None, 40: 50.0}


def test_asof_no_cross_key_leak(spark):
    r = spark.createDataFrame([("A", _ts("2024-01-01T00:00:00"), 1.0)],
                              "k string, ts timestamp, v double")
    l = spark.createDataFrame([("B", _ts("2024-01-02T00:00:00"), 9)],
                              "k string, ts timestamp, x int")
    out = asof_join(l, r, by=["k"]).collect()
    assert out[0].v_asof is None


def test_time_range_join(spark):
    base = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame(
        [("u1", base, 1)], "k string, ts timestamp, lid int")
    right = spark.createDataFrame(
        [("u1", base + dt.timedelta(minutes=m), m) for m in (-5, 0, 30, 59, 60, 90)],
        "k string, rts timestamp, m int")
    got = sorted(r.m for r in
                 time_range_join(left, right, by=["k"],
                                 lower_sec=0, upper_sec=3600).collect())
    # [ts, ts+1h): includes 0, 30, 59; excludes -5, 60, 90
    assert got == [0, 30, 59]
    # shifted window [10m, 70m)
    got2 = sorted(r.m for r in
                  time_range_join(left, right, by=["k"],
                                  lower_sec=600, upper_sec=4200).collect())
    assert got2 == [30, 59, 60]


def test_asof_tolerance(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:00"), 100.0)],
        "sym string, ts timestamp, px double")
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:04:00"), 1),    # 240s stale → in tol
         ("A", _ts("2024-01-01T10:05:00"), 2),    # 300s → boundary, in
         ("A", _ts("2024-01-01T10:05:01"), 3),    # 301s → out
         ("A", _ts("2024-01-01T09:00:00"), 4)],   # no match at all
        "sym string, ts timestamp, qty int")
    got = {r.qty: r.px_asof for r in
           asof_join(trades, quotes, by=["sym"],
                     tolerance_sec=300).collect()}
    assert got == {1: 100.0, 2: 100.0, 3: None, 4: None}
    # tolerance must not change the output column set
    plain_cols = asof_join(trades, quotes, by=["sym"]).columns
    tol_cols = asof_join(trades, quotes, by=["sym"],
                         tolerance_sec=300).columns
    assert plain_cols == tol_cols


def test_asof_forward(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:00"), 100.0),
         ("A", _ts("2024-01-01T10:05:00"), 101.0)],
        "sym string, ts timestamp, px double")
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01T09:59:00"), 1),   # next quote is 10:00
         ("A", _ts("2024-01-01T10:00:00"), 2),   # ties → inclusive
         ("A", _ts("2024-01-01T10:01:00"), 3),   # next is 10:05
         ("A", _ts("2024-01-01T10:06:00"), 4)],  # nothing later
        "sym string, ts timestamp, qty int")
    got = {r.qty: r.px_asof for r in
           asof_join(trades, quotes, by=["sym"],
                     direction="forward").collect()}
    assert got == {1: 100.0, 2: 100.0, 3: 101.0, 4: None}


def test_asof_forward_tolerance(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:10:00"), 100.0)],
        "sym string, ts timestamp, px double")
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:06:00"), 1),   # 240s ahead → in
         ("A", _ts("2024-01-01T10:00:00"), 2)],  # 600s ahead → out
        "sym string, ts timestamp, qty int")
    got = {r.qty: r.px_asof for r in
           asof_join(trades, quotes, by=["sym"], direction="forward",
                     tolerance_sec=300).collect()}
    assert got == {1: 100.0, 2: None}


def test_asof_tie_among_equal_ts_right_rows_is_deterministic(spark):
    """Several right rows sharing (key, ts): the fill must pick the
    SAME one regardless of physical partitioning (ADVICE r6 — the
    window now tiebreaks on a content hash, so the winner is the
    max-xxhash64 row, arbitrary but repeatable)."""
    dup = [("A", _ts("2024-01-01T10:00:00"), float(v)) for v in
           (1.0, 2.0, 3.0, 4.0, 5.0)]
    l = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:30:00"), 1)],
        "sym string, ts timestamp, qty int")
    picks = set()
    for nparts in (1, 2, 7):
        r = spark.createDataFrame(
            dup, "sym string, ts timestamp, px double").repartition(nparts)
        for direction in ("backward", "forward", "nearest"):
            got = asof_join(l, r, by=["sym"],
                            direction=direction).collect()[0].px_asof
            picks.add((direction, got))
    # one pick per direction, stable across all partitionings
    assert len(picks) == 3, picks
