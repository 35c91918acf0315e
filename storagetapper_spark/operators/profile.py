"""Column profiling: the ANALYZE/data-quality pass every ingest runs —
per-column null rates, distinct counts, min/max, and average width,
computed in ONE scan.

Scale shape: all statistics for all columns fold into a single
aggregate over one pass (Spark computes the partial aggregates
map-side; the exchange carries one row per partition).  The wide
1-row result is then stacked to long form driver-side-free with
``stack`` — no per-column jobs, no N scans for N columns (the naive
``for c in columns: df.agg(...)`` profiler is N full scans).
``n_distinct`` is exact here; swap ``approx_count_distinct`` in at
100 TB where a 2% error is free speedup (the sketch is partial-
aggregable the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row per column: (column, n_rows, n_null, n_distinct,
    min_val, max_val, avg_len) — min/max/len on the string form so
    heterogeneous columns stack into one typed result."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long")
             .alias(f"{c}__null"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
            F.round(F.avg(F.length(s)), 4).alias(f"{c}__len"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__null, {c}__distinct, {c}__min, {c}__max, {c}__len"
        for c in cols)
    return wide.selectExpr(
        "_n AS n_rows",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_null, n_distinct, min_val, max_val, avg_len)"
    ).select("column_name", "n_rows", "n_null", "n_distinct",
             "min_val", "max_val", "avg_len")
