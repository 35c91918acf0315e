"""Property-based proof of operators/ranks two-pass ranking: for ANY
data distribution and ANY bucket width, rank / ntile / percent_rank /
cume_dist derived from the two-pass form must be bit-identical to
Spark's own window functions over the same total ordering — including
adversarial cases (all values equal → one mega-bucket, n < tiles,
negative values, duplicate sort keys broken by the PK)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from storagetapper_spark.operators.ranks import ntile_from_rank, two_pass_rank

rows = st.lists(
    st.tuples(st.sampled_from(["x", "y"]),        # partition value
              st.integers(-50, 50)),              # sort value (dups likely)
    min_size=1, max_size=40)


@given(rows, st.sampled_from([1.0, 7.0, 1000.0]), st.integers(2, 5))
@settings(max_examples=10, deadline=None)
def test_two_pass_matches_window_functions(spark, data, width, tiles):
    df = spark.createDataFrame(
        [(p, v, i) for i, (p, v) in enumerate(data)],
        "part string, v long, pk long")
    got = two_pass_rank(df, [F.col("v").asc(), F.col("pk").asc()],
                        F.floor(F.col("v") / F.lit(width)),
                        partition=["part"])
    out = got.select(
        "pk", "_rank",
        ntile_from_rank(F.col("_rank"), F.col("_n"), tiles).alias("nt"),
        F.when(F.col("_n") == 1, F.lit(0.0))
         .otherwise((F.col("_rank") - 1) / (F.col("_n") - 1)).alias("pr"),
        (F.col("_rank") / F.col("_n")).alias("cd")).collect()
    w = Window.partitionBy("part").orderBy(F.col("v").asc(),
                                           F.col("pk").asc())
    want = df.select(
        "pk", F.row_number().over(w).alias("rank"),
        F.ntile(tiles).over(w).alias("nt"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd")).collect()
    got_by_pk = {r.pk: (r._rank, r.nt, r.pr, r.cd) for r in out}
    for r in want:
        assert got_by_pk[r.pk] == (r.rank, r.nt, r.pr, r.cd), r.pk


@given(st.lists(st.integers(0, 5), min_size=1, max_size=40),
       st.integers(2, 8))
@settings(max_examples=6, deadline=None)
def test_quantile_buckets_preserve_exactness_under_skew(spark, vals,
                                                        n_buckets):
    """quantile_buckets feeds two_pass_rank on HEAVILY skewed keys
    (duplicates everywhere): ranks must still equal the window form —
    the cutpoints only rebalance buckets, never change results."""
    from storagetapper_spark.operators.ranks import quantile_buckets

    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "v long, pk long")
    bucket = quantile_buckets(df, "v", n_buckets=n_buckets)
    got = two_pass_rank(df, [F.col("v").asc(), F.col("pk").asc()], bucket)
    w = Window.orderBy(F.col("v").asc(), F.col("pk").asc())
    want = {r.pk: r.rank
            for r in df.select("pk",
                               F.row_number().over(w).alias("rank")).collect()}
    for r in got.select("pk", "_rank").collect():
        assert want[r.pk] == r._rank


@given(st.lists(st.integers(-100, 100), min_size=1, max_size=40),
       st.sampled_from([1.0, 7.0, 1000.0]))
@settings(max_examples=8, deadline=None)
def test_exact_percentiles_match_percentile_cont(spark, vals, width):
    """ranks.exact_percentiles must reproduce percentile() (i.e.
    percentile_cont interpolation) bit-for-bit on arbitrary data —
    duplicates, negatives, single-element groups, any bucket width."""
    from storagetapper_spark.operators.ranks import exact_percentiles

    df = spark.createDataFrame([(int(v),) for v in vals], "v long")
    probs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = exact_percentiles(df, "v", probs,
                            F.floor(F.col("v") / F.lit(width))).collect()[0]
    want = df.agg(*[F.expr(f"percentile(v, {p})").alias(f"w{i}")
                    for i, p in enumerate(probs)]).collect()[0]
    for i, p in enumerate(probs):
        g = got[f"p_{str(p).replace('.', '_')}"]
        assert abs(g - want[f"w{i}"]) < 1e-9, (p, g, want[f"w{i}"])
