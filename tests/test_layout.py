"""Z-order layout: footer-stat tightness, file skipping, compaction."""

import pytest
from pyspark.sql import functions as F

from storagetapper_spark.operators.layout import (
    compact_small_files,
    file_ranges,
    files_pruned,
    zorder_write,
    zvalue,
)


def _grid(spark, n=64):
    return spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
        F.col("id").alias("payload"))


def test_zvalue_interleaves_bits(spark):
    # (x=0b11, y=0b00) with 2 bits -> z = x bits at even positions = 0b0101
    df = spark.createDataFrame([(3, 0)], "x long, y long")
    z = df.select(zvalue([F.col("x"), F.col("y")],
                         [(0, 3), (0, 3)], bits=2).alias("z")).collect()[0].z
    assert z == 0b0101


def test_zorder_files_are_tight_boxes(spark, tmp_path):
    out = str(tmp_path / "z")
    zorder_write(_grid(spark), ["x", "y"], [(0, 63), (0, 63)], out,
                 n_files=8, bits=6)
    ranges = file_ranges(spark, out, ["x", "y"])
    assert len(ranges) == 8
    full_area = 64 * 64
    for r in ranges:
        (x0, x1), (y0, y1) = r["ranges"]["x"], r["ranges"]["y"]
        area = (x1 - x0 + 1) * (y1 - y0 + 1)
        # a random layout gives every file the full 4096-cell box; the
        # z-curve keeps each file's bounding box a small fraction of it
        assert area <= full_area / 2, r


def test_zorder_enables_file_skipping_on_both_dims(spark, tmp_path):
    out = str(tmp_path / "z2")
    zorder_write(_grid(spark), ["x", "y"], [(0, 63), (0, 63)], out,
                 n_files=8, bits=6)
    ranges = file_ranges(spark, out, ["x", "y"])
    skip_x, total = files_pruned(ranges, "x", 0, 7)
    skip_y, _ = files_pruned(ranges, "y", 0, 7)
    # narrow predicates on EITHER clustered dim must rule out files —
    # that's the whole point vs a single-column sort (which prunes one
    # dim perfectly and the other not at all)
    assert skip_x >= total // 4
    assert skip_y >= total // 4


def test_single_column_sort_cannot_prune_second_dim(spark, tmp_path):
    out = str(tmp_path / "sorted")
    (_grid(spark).repartitionByRange(8, "x").sortWithinPartitions("x")
        .write.mode("overwrite").parquet(out))
    ranges = file_ranges(spark, out, ["x", "y"])
    skip_y, total = files_pruned(ranges, "y", 0, 7)
    assert skip_y == 0  # the control: x-sort leaves y unprunable
    skip_x, _ = files_pruned(ranges, "x", 0, 7)
    assert skip_x >= total - 2


def test_zvalue_guards_dimension_overflow(spark):
    with pytest.raises(ValueError):
        zvalue([F.lit(1)] * 5, [(0, 1)] * 5, bits=16)


def test_compact_small_files(spark, tmp_path):
    src, out = str(tmp_path / "small"), str(tmp_path / "big")
    spark.range(10_000).repartition(50).write.parquet(src)
    import os
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 50
    n = compact_small_files(spark, src, out, target_rows_per_file=5_000)
    assert n == 2
    assert spark.read.parquet(out).count() == 10_000


# ---- registry layout queries (plans/layout.py) -----------------------

def test_bucketed_join_has_no_exchange_below_the_join(spark, sf_dir):
    """The whole point of the bucketed layout: the SMJ consumes bucket
    placement, so the join needs no shuffle.  Measured as an Exchange
    DELTA vs the identical plan over raw parquet (which must shuffle
    both sides)."""
    from storagetapper_spark.plans.common import t
    from storagetapper_spark.plans.layout import layout_bucketed_join

    bucketed = layout_bucketed_join(spark, sf_dir)
    plan_b = bucketed._jdf.queryExecution().executedPlan().toString()

    o = (t(spark, sf_dir, "orders")
         .filter(F.year("o_orderdate") == 1995)
         .select("o_orderkey", "o_orderpriority").hint("merge"))
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    raw = (o.join(li, o.o_orderkey == li.l_orderkey)
           .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
           .orderBy("o_orderpriority"))
    plan_r = raw._jdf.queryExecution().executedPlan().toString()

    assert "SortMergeJoin" in plan_b
    assert "Bucketed: true" in plan_b
    n_exchange_b = plan_b.count("+- Exchange")
    n_exchange_r = plan_r.count("+- Exchange")
    # raw plan shuffles both join inputs; bucketed plan keeps only the
    # post-join agg + sort exchanges
    assert n_exchange_b == n_exchange_r - 2


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    from storagetapper_spark.plans.common import t
    from storagetapper_spark.plans.layout import layout_bucketed_join

    got = {r.o_orderpriority: (r.n_items, r.revenue_cents)
           for r in layout_bucketed_join(spark, sf_dir).collect()}
    o = (t(spark, sf_dir, "orders")
         .filter(F.year("o_orderdate") == 1995))
    li = t(spark, sf_dir, "lineitem")
    net = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                  * 100).cast("long")
    want = {r.o_orderpriority: (r.n, r.c)
            for r in o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(net).alias("c"))
            .collect()}
    assert got == want


def test_compaction_plan_partitions_the_manifest(spark, sf_dir):
    from storagetapper_spark.plans.common import t
    from storagetapper_spark.plans.layout import (
        layout_compaction_plan, _TARGET_BYTES, _ROW_BYTES)

    out = layout_compaction_plan(spark, sf_dir).collect()
    o = t(spark, sf_dir, "orders")
    manifest = (o.groupBy("o_orderstatus",
                          F.col("o_orderdate").cast("date"))
                .agg(F.count(F.lit(1)).alias("n")).collect())
    # conservation: every manifest file lands in exactly one bin
    assert sum(r.n_files for r in out) == len(manifest)
    assert (sum(r.bin_bytes for r in out)
            == sum(r.n for r in manifest) * _ROW_BYTES)
    by_st = {}
    for r in out:
        by_st.setdefault(r.st, []).append(r)
    for st, bins in by_st.items():
        bins.sort(key=lambda r: r.bin)
        # dense numbering from 0
        assert [r.bin for r in bins] == list(range(len(bins)))
        # contiguous, non-overlapping day ranges (sorted layout kept)
        for a, b in zip(bins, bins[1:]):
            assert a.day_max < b.day_min
        # every bin but the last reaches the target (cumsum binning
        # closes a bin only once it spills past the boundary)
        for r in bins[:-1]:
            assert r.bin_bytes >= _TARGET_BYTES - 366 * _ROW_BYTES * 40
