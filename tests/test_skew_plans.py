"""Skew machinery semantics + physical-plan assertions (pushdown,
broadcast, bucketed co-location) — the scale contracts as tests."""

import pytest
from pyspark.sql import functions as F

from storagetapper_spark.operators.skew import (
    exchange_count,
    salted_agg,
    salted_join,
    write_bucketed,
)


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(k % 3, i) for i, k in enumerate(range(100))], "k long, v long")
    right = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "d")],
                                  "k long, name string")
    plain = {(r.k, r.v, r.name) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.v, r.name) for r in salted_join(left, right, "k").collect()}
    assert salted == plain and len(salted) == 100


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "x"), (99, "y")], "k long, v string")
    right = spark.createDataFrame([(1, "hit")], "k long, name string")
    rows = {r.k: r.name for r in salted_join(left, right, "k", how="left").collect()}
    assert rows == {1: "hit", 99: None}


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(i % 2, float(i)) for i in range(1000)], "k long, v double")
    plain = {(r.k): (r.s, r.n, r.mx) for r in
             df.groupBy("k").agg(F.sum("v").alias("s"),
                                 F.count(F.lit(1)).alias("n"),
                                 F.max("v").alias("mx")).collect()}
    salted = {(r.k): (r.sum_v, r.count_v, r.max_v) for r in
              salted_agg(df, ["k"], {"v": "sum"} | {}, n_salts=8)
              .join(salted_agg(df, ["k"], {"v": "count"}, 8), "k")
              .join(salted_agg(df, ["k"], {"v": "max"}, 8), "k").collect()}
    assert salted == plain


def test_salted_agg_rejects_noncombinable(spark):
    df = spark.createDataFrame([(1, 2.0)], "k long, v double")
    with pytest.raises(ValueError):
        salted_agg(df, ["k"], {"v": "avg"}).collect()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).selectExpr("id as k", "id * 2 as v")
        b = spark.range(0, 1000).selectExpr("id as k", "id * 3 as w")
        write_bucketed(a, "bk_a", "k", n_buckets=8)
        write_bucketed(b, "bk_b", "k", n_buckets=8)
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        assert joined.count() == 1000
        # co-located: bucketed scan joins without any shuffle Exchange
        assert exchange_count(joined) == 0
        # baseline sanity: the un-bucketed join DOES shuffle
        assert exchange_count(a.join(b, "k")) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_snapshot_filter_pushdown_plan(spark, sf_dir):
    """P2 row filters must reach the parquet scan (PushedFilters)."""
    from storagetapper_spark.sources.snapshot import RowFilter, snapshot_scan
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    snap = snapshot_scan(cust, ["c_custkey"],
                         filters=[RowFilter("c_acctbal", [100.0], ">")])
    plan = snap._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(c_acctbal,100.0)" in plan


def test_dim_join_broadcasts(spark, sf_dir):
    """q5-style dimension joins must be broadcast, not sort-merge."""
    from storagetapper_spark.plans.registry import QUERIES
    df = QUERIES["q5_local_supplier"](spark, sf_dir)
    df.collect()  # let AQE finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
