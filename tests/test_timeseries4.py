"""Unit semantics for the timeseries4 batch (similarity search is
oracle-pinned; these pin the parts a hash can't explain: discord
exclusion zones, non-overlapping pattern counting, z-norm behavior).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from storagetapper_spark.operators.text import occurrence_count


def test_pattern_count_non_overlapping(spark):
    # "v,c,p,v,c,p" → 2; "v,c,p,c,p" → 1; "v,v,c,p" → 1
    df = spark.createDataFrame(
        [("view,click,purchase,view,click,purchase",),
         ("view,click,purchase,click,purchase",),
         ("view,view,click,purchase",),
         ("click,purchase,view",)],
        "stream string")
    got = [r[0] for r in df.select(
        occurrence_count(F.col("stream"), "view,click,purchase")).collect()]
    assert got == [2, 1, 1, 0]


def test_pattern_match_orders_by_time_not_arrival(spark):
    from storagetapper_spark.plans.timeseries4 import events_pattern_match  # noqa: F401
    # direct check of the sort key: same-ts ties break by event_id
    base = dt.datetime(2024, 1, 1)
    rows = [  # arrival order scrambled; time order = view,click,purchase
        (3, base + dt.timedelta(seconds=2), 7, "purchase", 0.0, "{}"),
        (1, base + dt.timedelta(seconds=0), 7, "view", 0.0, "{}"),
        (2, base + dt.timedelta(seconds=1), 7, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    seq = F.transform(
        F.array_sort(F.collect_list(
            F.struct(F.col("ts"), F.col("event_id"), F.col("event_type")))),
        lambda s: s["event_type"])
    got = (df.groupBy("user_id").agg(F.array_join(seq, ",").alias("s"))
           .collect()[0]["s"])
    assert got == "view,click,purchase"


def test_discord_exclusion_zone(spark):
    """A window must not pick an overlapping neighbor as its nearest
    match — inject one anomalous week into an otherwise repeating
    series and require the discord to land on it."""
    from storagetapper_spark.plans.timeseries4 import ts_discord_detection

    import tempfile

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(40):
        # repeating weekly shape, except days 20-26 get a spike pattern
        n = 5 + (d % 7) + (20 if 20 <= d <= 26 and d % 2 == 0 else 0)
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(days=d), 1, "evt",
                         0.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(f"{tmp}/events.parquet")
        for name in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "documents", "embeddings"):
            pass  # ts_discord_detection only reads events
        out = ts_discord_detection(spark, tmp).collect()
    assert len(out) == 1
    day = out[0]["discord_day"]
    # the discord window must touch the injected anomaly span
    assert dt.date(2024, 1, 15) <= day <= dt.date(2024, 1, 27), day
