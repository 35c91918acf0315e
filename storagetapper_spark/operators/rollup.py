"""Hypertable-style time rollups (continuous aggregates).

The pattern: raw events roll up into a time-bucketed aggregate table
(hour), which re-aggregates into coarser buckets (day, month) without
touching raw data — sums of sums, counts of counts, min/max of min/max.
avg is carried as (sum, count) so it re-aggregates losslessly.

At 100 TB the hourly table is the only thing the daily/monthly queries
scan (1/3600th of raw); the incremental form maintains it per
micro-batch keyed on bucket (idempotent overwrite per bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: re-aggregable measure set: name → (raw expr builder, merge fn name)
_MERGE = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def rollup_bucket(df: DataFrame, ts_col: str, bucket: str,
                  group_cols: list[str], value_col: str) -> DataFrame:
    """Raw events → one aggregate row per (bucket, group): carries
    sum/count/min/max so every coarser rollup derives from it."""
    return (
        df.groupBy(F.window(ts_col, bucket).alias("w"), *group_cols)
          .agg(F.sum(value_col).alias("v_sum"),
               F.count(F.lit(1)).alias("v_count"),
               F.min(value_col).alias("v_min"),
               F.max(value_col).alias("v_max"))
          .select(F.col("w.start").alias("bucket_start"), *group_cols,
                  "v_sum", "v_count", "v_min", "v_max")
    )


def reaggregate(fine: DataFrame, bucket: str,
                group_cols: list[str]) -> DataFrame:
    """Fine rollup → coarser rollup without raw data: sum of sums etc."""
    return (
        fine.groupBy(F.window("bucket_start", bucket).alias("w"), *group_cols)
            .agg(F.sum("v_sum").alias("v_sum"),
                 F.sum("v_count").alias("v_count"),
                 F.min("v_min").alias("v_min"),
                 F.max("v_max").alias("v_max"))
            .select(F.col("w.start").alias("bucket_start"), *group_cols,
                    "v_sum", "v_count", "v_min", "v_max")
    )


def finalize(rolled: DataFrame, round_to: int = 4) -> DataFrame:
    """Present a rollup: derived avg from the carried (sum, count)."""
    return rolled.select(
        "*",
        F.round(F.col("v_sum") / F.col("v_count"), round_to).alias("v_avg"),
    )
