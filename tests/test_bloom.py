"""Bloom-filter join pruning (operators/bloom).

Covers the three contracts: no false negatives ever, a sane
false-positive rate at the advertised sizing, and join exactness (the
pruned join equals the plain join bit-for-bit).  Plus the plan shape
that makes the operator worth having: the membership predicate must sit
below the join's Exchange, on the probe-side scan stage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storagetapper_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prune_join,
)


def test_no_false_negatives(spark):
    build = spark.range(0, 5000).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom_build(build, "k", m_bits=1 << 16, k=4)
    missed = build.filter(~bloom_might_contain("k", words, k=4)).count()
    assert missed == 0


def test_false_positive_rate_sane(spark):
    build = spark.range(0, 5000).select(F.col("id").alias("k"))
    words = bloom_build(build, "k", m_bits=1 << 16, k=4)
    # disjoint probe keys: everything that passes is a false positive
    probe = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    fp = probe.filter(bloom_might_contain("k", words, k=4)).count()
    # theory: (1 - e^(-4*5000/65536))^4 ≈ 0.5%; allow generous slack
    assert fp / 20_000 < 0.05, fp


def test_bitmap_is_bounded_not_rowcount(spark):
    build = spark.range(0, 100_000).select(F.col("id").alias("k"))
    words = bloom_build(build, "k", m_bits=1 << 10, k=2)
    assert len(words) == (1 << 10) // 64  # 16 words, regardless of rows


def test_join_exactness(spark, sf_dir):
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_totalprice") > 200000)
              .select("o_orderkey"))
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice")
    pruned = (bloom_prune_join(lineitem, orders, "l_orderkey", "o_orderkey")
              .groupBy().agg(F.count(F.lit(1)).alias("n"),
                             F.round(F.sum("l_extendedprice"), 2).alias("s"))
              .collect()[0])
    plain = (lineitem.join(orders,
                           lineitem["l_orderkey"] == orders["o_orderkey"])
             .groupBy().agg(F.count(F.lit(1)).alias("n"),
                            F.round(F.sum("l_extendedprice"), 2).alias("s"))
             .collect()[0])
    assert (pruned["n"], pruned["s"]) == (plain["n"], plain["s"])
    assert plain["n"] > 0  # the fixture actually exercises the join


def test_predicate_below_exchange(spark, sf_dir):
    """The bloom predicate must prune at the scan, before any shuffle —
    in the executed plan, a Filter containing the bitmap lookup
    (element_at) appears and no Exchange precedes it on its input."""
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .filter(F.col("o_totalprice") > 200000).select("o_orderkey"))
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice")
    out = bloom_prune_join(lineitem, orders, "l_orderkey", "o_orderkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    filter_pos = plan.find("element_at")
    assert filter_pos != -1, "bloom predicate missing from physical plan"
    # walk the plan text below the filter (its children print after it):
    # the probe-side scan must follow without an intervening Exchange
    below = plan[filter_pos:]
    scan_pos = below.find("lineitem.parquet")
    assert scan_pos != -1
    assert "Exchange" not in below[:scan_pos], \
        "bloom predicate is above a shuffle — pruning happens too late"


def test_bloom_properties_fuzz(spark):
    """Randomized: NO false negatives for any key set / sizing combo."""
    import random

    rng = random.Random(42)
    for m_bits, k in ((1 << 10, 2), (1 << 12, 4), (1 << 16, 6)):
        keys = [rng.randrange(-2**62, 2**62) for _ in range(500)]
        build = spark.createDataFrame([(x,) for x in keys], "k long")
        words = bloom_build(build, "k", m_bits=m_bits, k=k)
        assert len(words) == m_bits // 64
        missed = build.filter(~bloom_might_contain("k", words, k=k)).count()
        assert missed == 0, (m_bits, k)


def test_outer_how_rejected(spark):
    """Pre-filter pruning is only exact for inner/semi joins: an outer
    'how' would need the pruned probe rows (they join to NULL), so the
    operator refuses rather than silently dropping them (ADVICE r5)."""
    import pytest

    a = spark.createDataFrame([(1,), (2,)], "k long")
    b = spark.createDataFrame([(1,)], "j long")
    for how in ("left", "left_outer", "full", "left_anti", "right"):
        with pytest.raises(ValueError, match="not exact"):
            bloom_prune_join(a, b, "k", "j", how=how)
    assert bloom_prune_join(a, b, "k", "j", how="left_semi").count() == 1
