"""Mergeable histogram sketch: dense-vector assembly and interpolated
quantiles within one bin width of exact."""

from pyspark.sql import functions as F

from storagetapper_spark.operators.sketch import (
    histogram_sketch,
    quantile_from_sketch,
)

LO, HI, BINS = 0.0, 100.0, 50


def test_histogram_sketch_and_quantile(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 100).cast("double").alias("v"),
        (F.col("id") % 3).alias("g"))

    sk = histogram_sketch(df, "v", LO, HI, n_bins=BINS, group_cols=["g"])
    rows = {r.g: r.bins for r in sk.collect()}
    assert len(rows) == 3
    for g, bins in rows.items():
        assert len(bins) == BINS
        assert sum(bins) == df.filter(F.col("g") == g).count()

    q = sk.select(
        "g",
        quantile_from_sketch(F.col("bins"), 0.5, LO, HI, BINS).alias("p50"),
        quantile_from_sketch(F.col("bins"), 0.95, LO, HI, BINS).alias("p95"))
    exact = (df.groupBy("g")
               .agg(F.expr("percentile(v, 0.5)").alias("e50"),
                    F.expr("percentile(v, 0.95)").alias("e95")))
    joined = q.join(exact, "g").collect()
    width = (HI - LO) / BINS
    for r in joined:
        assert abs(r.p50 - r.e50) <= width, (r.g, r.p50, r.e50)
        assert abs(r.p95 - r.e95) <= width, (r.g, r.p95, r.e95)


def test_sketch_merge_equals_direct(spark):
    """Sketching two halves and vector-adding equals sketching the whole
    — the mergeability contract that makes it shuffle-safe."""
    df = spark.range(0, 5000).select(
        ((F.col("id") * 37) % 100).cast("double").alias("v"))
    half1 = df.filter(F.col("v") < 50)
    half2 = df.filter(F.col("v") >= 50)

    whole = histogram_sketch(df, "v", LO, HI, n_bins=BINS).collect()[0].bins
    b1 = histogram_sketch(half1, "v", LO, HI, n_bins=BINS).collect()[0].bins
    b2 = histogram_sketch(half2, "v", LO, HI, n_bins=BINS).collect()[0].bins
    assert [a + b for a, b in zip(b1, b2)] == list(whole)
