"""Size-guarded basket-array pair builds (r11, VERDICT r10 #4).

The guard must (a) reproduce the EXACT pair multiset of the unguarded
in-map i<j explode for any cap/chunk, and (b) actually spread a hot
basket's quadratic pair fan-out across tasks instead of concentrating
it in one (the straggler/OOM hazard the guard exists for).
"""

import itertools

import pytest
from pyspark.sql import functions as F

from storagetapper_spark.operators.skew import (
    basket_units,
    guarded_pair_explode,
    pair_list_expr,
)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "k int, ps array<int>")


def test_guarded_pairs_exact_multiset(spark):
    # mixed sizes straddling the cap, incl. singleton (no pairs) and a
    # basket whose size is not a chunk multiple
    rows = [(1, list(range(10))), (2, list(range(137))),
            (3, [5, 9]), (4, [7]), (5, list(range(64, 130)))]
    out = guarded_pair_explode(_baskets(spark, rows), "ps", "pa", "pb",
                               keep=("k",), cap=32, chunk=10)
    got = sorted((r.k, r.pa, r.pb) for r in out.collect())
    exp = sorted((k, a, b) for k, v in rows
                 for a, b in itertools.combinations(sorted(set(v)), 2))
    assert got == exp


def test_guarded_pairs_match_unguarded_explode(spark):
    rows = [(i, list(range(i, i + 50))) for i in range(20)]
    df = _baskets(spark, rows)
    unguarded = (df.select("k", F.explode(
        F.expr(pair_list_expr("ps", "pa", "pb"))).alias("_pr"))
        .select("k", "_pr.pa", "_pr.pb"))
    guarded = guarded_pair_explode(df, "ps", "pa", "pb", keep=("k",),
                                   cap=16, chunk=8)
    assert guarded.exceptAll(unguarded).count() == 0
    assert unguarded.exceptAll(guarded).count() == 0


def test_hot_basket_pairs_spread_across_tasks(spark):
    # VERDICT r10 #4 "done" case: ONE basket with 10^4 members must not
    # put its ~5x10^7 pairs through a single task.  Count pairs per
    # partition right after the guarded explode; the hot basket must
    # occupy several partitions with a bounded per-partition share.
    n = 10_000
    df = _baskets(spark, [(1, list(range(n)))])
    out = guarded_pair_explode(df, "ps", "pa", "pb", chunk=512)
    per_part = (out.groupBy(F.spark_partition_id().alias("pid"))
                .agg(F.count(F.lit(1)).alias("c")).collect())
    total = sum(r.c for r in per_part)
    assert total == n * (n - 1) // 2
    # chunked units bound per-task fan-out: with chunk=512 no partition
    # can exceed (units landing there) * 512^2; assert the hot basket
    # spread over >1 task and the max share is far below "all in one"
    assert len(per_part) > 1
    assert max(r.c for r in per_part) < 0.5 * total


def test_unit_decomposition_covers_every_pair_once(spark):
    # basket_units' chunk-pair units: every strict i<j pair appears in
    # exactly ONE unit (diag chunk or one (ca<cb) cross unit)
    rows = [(1, list(range(100)))]
    units = basket_units(_baskets(spark, rows), "ps",
                         keep=("k",), cap=10, chunk=16)
    got = units.select(
        "k", F.explode(F.expr(
            "CASE WHEN _u.diag THEN " + pair_list_expr("_u.xs", "a", "b")
            + " ELSE flatten(transform(_u.xs, x -> transform(_u.ys, "
            "y -> named_struct('a', x, 'b', y)))) END")).alias("p")
    ).select("p.a", "p.b").collect()
    pairs = [(r.a, r.b) for r in got]
    assert len(pairs) == len(set(pairs)) == 100 * 99 // 2
    assert all(a < b for a, b in pairs)


@pytest.mark.parametrize("cap,chunk", [(3, 2), (5, 5), (7, 3)])
def test_guard_exact_at_tiny_caps(spark, cap, chunk):
    rows = [(1, [1, 2, 3, 4, 5, 6, 7, 8]), (2, [10, 11, 12])]
    out = guarded_pair_explode(_baskets(spark, rows), "ps", "pa", "pb",
                               keep=("k",), cap=cap, chunk=chunk)
    got = sorted((r.k, r.pa, r.pb) for r in out.collect())
    exp = sorted((k, a, b) for k, v in rows
                 for a, b in itertools.combinations(v, 2))
    assert got == exp


@pytest.mark.parametrize("cap,chunk", [(3, 2), (5, 5), (1024, 512)])
def test_split_path_matches_single_path(spark, cap, chunk):
    # split=True (r11 session 3): small baskets explode in place, only
    # > cap baskets ride the unit spread — exact same pair multiset as
    # the single-path guard and the unguarded explode.
    rows = [(1, [1, 2, 3, 4, 5, 6, 7, 8]), (2, [10, 11, 12]),
            (3, list(range(100, 120))), (4, [7]), (5, [])]
    b = _baskets(spark, rows)
    split = sorted((r.k, r.pa, r.pb) for r in guarded_pair_explode(
        b, "ps", "pa", "pb", keep=("k",), cap=cap, chunk=chunk,
        split=True).collect())
    single = sorted((r.k, r.pa, r.pb) for r in guarded_pair_explode(
        b, "ps", "pa", "pb", keep=("k",), cap=cap, chunk=chunk).collect())
    exp = sorted((k, a, b2) for k, v in rows
                 for a, b2 in itertools.combinations(v, 2))
    assert split == single == exp
