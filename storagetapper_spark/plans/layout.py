"""Storage-layout analytics: zone-map pruning simulation — how much of
the fact table could a scan SKIP for a month predicate, under the
natural (insertion-order) layout vs a shipdate-sorted rewrite?

This is the decision query behind `OPTIMIZE ... ZORDER`-style layout
jobs: zone maps (per-chunk min/max) are what parquet row-group skipping
and Spark's data-source pruning consume, and the benefit of sorting is
exactly the prunable-share delta this query measures.

Plan shape: chunk ids come from the scale-safe two-pass global rank
(4096-row chunks; two INDEPENDENT rank passes over the scan — never
chained, per operators/ranks.py guidance), zone maps are one agg per
layout, and the month-predicate sweep is a broadcast of 6 rows against
the chunk-level table (thousands of rows at any corpus size ÷ 4096).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_CHUNK = 4096
_MONTHS = ["1995-03-01", "1996-01-01", "1996-09-01",
           "1997-06-01", "1998-02-01", "1998-12-01"]


def _zones(li, order_cols, bucket_col) -> DataFrame:
    from storagetapper_spark.operators.ranks import two_pass_rank

    ranked = two_pass_rank(li, order_cols, bucket_col)
    return (ranked.select(
        F.floor((F.col("_rank") - 1) / _CHUNK).alias("chunk"),
        "ship_day")
        .groupBy("chunk")
        .agg(F.min("ship_day").alias("zmin"),
             F.max("ship_day").alias("zmax")))


def layout_zone_map_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """For six sample month predicates: the share of 4096-row chunks a
    zone-map scan skips under the natural layout (orderkey order — low
    shipdate locality) vs a shipdate-sorted layout (near-perfect
    skipping).  The sorted-vs-natural delta is the measured case for a
    layout rewrite."""
    li = (t(spark, sf, "lineitem")
          .select("l_orderkey", "l_linenumber",
                  F.col("l_shipdate").cast("date").alias("ship_day")))
    nat = _zones(li, [F.col("l_orderkey"), F.col("l_linenumber")],
                 F.floor(F.col("l_orderkey") / 65536))
    srt = _zones(li, [F.col("ship_day"), F.col("l_orderkey"),
                      F.col("l_linenumber")],
                 F.floor(F.unix_date(F.col("ship_day")) / 64))
    months = spark.createDataFrame(
        [(m,) for m in _MONTHS], "m string").select(
        F.col("m").cast("date").alias("m_start"),
        F.add_months(F.col("m").cast("date"), 1).alias("m_end"))

    def sweep(z, label):
        miss = ((F.col("zmax") < F.col("m_start"))
                | (F.col("zmin") >= F.col("m_end")))
        return (z.crossJoin(F.broadcast(months))
                .groupBy("m_start")
                .agg(F.count(F.lit(1)).alias(f"n_chunks_{label}"),
                     F.sum(F.when(miss, 1).otherwise(0))
                     .alias(f"n_pruned_{label}")))

    a = sweep(nat, "nat")
    b = sweep(srt, "sorted")
    return (a.join(b, "m_start")
            .select(F.col("m_start").alias("month"),
                    "n_chunks_nat", "n_pruned_nat",
                    F.floor(F.col("n_pruned_nat") * 1000000
                            / F.col("n_chunks_nat")).cast("long")
                    .alias("prune_nat_micro"),
                    "n_chunks_sorted", "n_pruned_sorted",
                    F.floor(F.col("n_pruned_sorted") * 1000000
                            / F.col("n_chunks_sorted")).cast("long")
                    .alias("prune_sorted_micro"))
            .orderBy("month"))


_M_SQL = ", ".join(f"DATE '{m}'" for m in _MONTHS)

ZONE_MAP_SQL = f"""
WITH li AS (
  SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_day
  FROM lineitem
),
nat AS (
  SELECT CAST(floor((row_number() OVER (ORDER BY l_orderkey,
                                        l_linenumber) - 1)
                    / {_CHUNK}) AS BIGINT) AS chunk, ship_day
  FROM li
),
srt AS (
  SELECT CAST(floor((row_number() OVER (ORDER BY ship_day, l_orderkey,
                                        l_linenumber) - 1)
                    / {_CHUNK}) AS BIGINT) AS chunk, ship_day
  FROM li
),
zn AS (SELECT chunk, min(ship_day) AS zmin, max(ship_day) AS zmax
       FROM nat GROUP BY chunk),
zs AS (SELECT chunk, min(ship_day) AS zmin, max(ship_day) AS zmax
       FROM srt GROUP BY chunk),
months AS (
  SELECT m_start, m_start + INTERVAL 1 MONTH AS m_end
  FROM (SELECT unnest([{_M_SQL}]) AS m_start)
),
an AS (
  SELECT m.m_start, count(*) AS n_chunks_nat,
         sum(CASE WHEN z.zmax < m.m_start OR z.zmin >= m.m_end
                  THEN 1 ELSE 0 END) AS n_pruned_nat
  FROM zn z CROSS JOIN months m GROUP BY m.m_start
),
asrt AS (
  SELECT m.m_start, count(*) AS n_chunks_sorted,
         sum(CASE WHEN z.zmax < m.m_start OR z.zmin >= m.m_end
                  THEN 1 ELSE 0 END) AS n_pruned_sorted
  FROM zs z CROSS JOIN months m GROUP BY m.m_start
)
SELECT an.m_start AS month,
       CAST(an.n_chunks_nat AS BIGINT) AS n_chunks_nat,
       CAST(an.n_pruned_nat AS BIGINT) AS n_pruned_nat,
       CAST(floor(an.n_pruned_nat * 1000000 / an.n_chunks_nat)
            AS BIGINT) AS prune_nat_micro,
       CAST(asrt.n_chunks_sorted AS BIGINT) AS n_chunks_sorted,
       CAST(asrt.n_pruned_sorted AS BIGINT) AS n_pruned_sorted,
       CAST(floor(asrt.n_pruned_sorted * 1000000 / asrt.n_chunks_sorted)
            AS BIGINT) AS prune_sorted_micro
FROM an JOIN asrt ON asrt.m_start = an.m_start
ORDER BY month
"""


QUERIES = {
    "layout_zone_map_pruning": (layout_zone_map_pruning, ZONE_MAP_SQL),
}
