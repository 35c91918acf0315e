"""Mergeable sketches for distributed approximation.

The deterministic member of the sketch family: an equi-width histogram
whose per-partition form is a count vector — merging is vector addition,
so Spark's partial aggregation IS the sketch merge (map-side combine,
one tiny row per group across the shuffle).  Quantiles interpolate
within the hit bin, bounding error by bin width — the classic
histogram-sketch trade, and unlike HLL/t-digest the result is
bit-deterministic, so a SQL oracle can verify it exactly.

At 100 TB: the shuffle carries ``n_bins`` longs per group regardless of
row count; exact ``percentile()`` by contrast materializes every value
per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def histogram_sketch(df: DataFrame, value_col: str, lo: float, hi: float,
                     n_bins: int = 64,
                     group_cols: list[str] | None = None) -> DataFrame:
    """Per-group equi-width histogram: bin counts as an array column.
    Values are clamped into [lo, hi] (open-topped last bin)."""
    width = (hi - lo) / n_bins
    bin_id = F.least(
        F.greatest(F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
                   F.lit(0)),
        F.lit(n_bins - 1)).cast("int")
    gcols = group_cols or []
    counts = (df.withColumn("_bin", bin_id)
                .groupBy(*gcols, "_bin")
                .agg(F.count(F.lit(1)).alias("_n")))
    # assemble the dense vector: aggregate (bin, n) pairs per group
    return (counts.groupBy(*gcols)
            .agg(F.array_sort(F.collect_list(F.struct("_bin", "_n")))
                  .alias("_pairs"))
            .select(*gcols,
                    F.transform(
                        F.sequence(F.lit(0), F.lit(n_bins - 1)),
                        lambda i: F.coalesce(
                            F.element_at(
                                F.map_from_entries("_pairs"), i.cast("int")),
                            F.lit(0).cast("long"))).alias("bins")))


def quantile_from_sketch(bins: Column, q: float, lo: float, hi: float,
                         n_bins: int = 64) -> Column:
    """Linear-interpolated quantile from a histogram vector: find the
    bin where the cumulative count crosses q·total, interpolate within
    it.  Max error = one bin width."""
    width = (hi - lo) / n_bins
    total = F.aggregate(bins, F.lit(0).cast("long"), lambda a, x: a + x)
    target = F.lit(q) * total.cast("double")
    # cumulative counts per bin index
    cum = F.transform(
        F.sequence(F.lit(1), F.lit(n_bins)),
        lambda i: F.aggregate(F.slice(bins, F.lit(1), i),
                              F.lit(0).cast("long"), lambda a, x: a + x))
    # first bin whose cumulative ≥ target
    hit = F.array_position(
        F.transform(cum, lambda c: c.cast("double") >= target), True)
    prev_cum = F.when(hit == 1, F.lit(0).cast("long")) \
                .otherwise(F.element_at(cum, (hit - 1).cast("int")))
    in_bin = F.element_at(bins, hit.cast("int"))
    frac = F.when(in_bin > 0,
                  (target - prev_cum.cast("double")) / in_bin.cast("double")) \
            .otherwise(F.lit(0.0))
    return F.lit(lo) + (hit.cast("double") - 1 + frac) * F.lit(width)
