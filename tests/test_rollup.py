"""Continuous-aggregate rollup: re-aggregation exactness and avg carry."""

import datetime as dt

from pyspark.sql import functions as F

from storagetapper_spark.operators.rollup import finalize, reaggregate, rollup_bucket


def test_two_level_equals_direct(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(minutes=7 * i), "a" if i % 3 else "b", float(i))
            for i in range(500)]
    ev = spark.createDataFrame(rows, "ts timestamp, g string, value double")
    hourly = rollup_bucket(ev, "ts", "1 hour", ["g"], "value")
    daily_via_hourly = reaggregate(hourly, "1 day", ["g"])
    daily_direct = rollup_bucket(ev, "ts", "1 day", ["g"], "value")
    a = {(r.bucket_start, r.g): (round(r.v_sum, 6), r.v_count, r.v_min, r.v_max)
         for r in daily_via_hourly.collect()}
    b = {(r.bucket_start, r.g): (round(r.v_sum, 6), r.v_count, r.v_min, r.v_max)
         for r in daily_direct.collect()}
    assert a == b


def test_finalize_avg(spark):
    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, m), "g", 2.0) for m in range(10)],
        "ts timestamp, g string, value double")
    out = finalize(rollup_bucket(ev, "ts", "1 hour", ["g"], "value")).collect()
    assert out[0].v_avg == 2.0 and out[0].v_count == 10
