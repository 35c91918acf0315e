"""Batch 16: interval-union coverage (gaps-and-islands merge) — the
interval-MERGING primitive that complements the existing overlap-pair
(overlapping_orders) and sweep-line (peak_concurrency) interval shapes.

Scale shape: everything is keyed by customer — the running-max window,
the island numbering, and the per-island agg all partition on
o_custkey, so there is exactly one shuffle on a high-cardinality key
and no global window anywhere.  Day arithmetic is exact integers
(unix_date), ratios floor-micro per SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_WIN_DAYS = 30  # fulfilment window length (same as overlapping_orders)


def interval_union_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Per market segment: how many customer-days are COVERED by the
    union of the customers' 30-day order-fulfilment windows, vs the sum
    of raw window lengths — the interval-merge dedup factor (how much
    concurrent fulfilment overlaps).

    Classic gaps-and-islands: per customer in start order, a window
    opens a new island when the running max end so far lies before its
    start; island coverage = island_max_end − island_min_start + 1."""
    o = t(spark, sf, "orders")
    iv = o.select(
        "o_custkey",
        F.unix_date(F.col("o_orderdate").cast("date")).alias("s"),
        (F.unix_date(F.col("o_orderdate").cast("date")) + _WIN_DAYS)
        .alias("e"))
    word = Window.partitionBy("o_custkey").orderBy("s", "e")
    prev_max = (F.max("e").over(
        word.rowsBetween(Window.unboundedPreceding, -1)))
    marked = iv.select(
        "o_custkey", "s", "e",
        F.when(prev_max.isNull() | (prev_max < F.col("s")), 1)
        .otherwise(0).alias("new_island"))
    islands = marked.select(
        "o_custkey", "s", "e",
        F.sum("new_island").over(
            word.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"))
    per_island = (islands.groupBy("o_custkey", "island")
                  .agg((F.max("e") - F.min("s") + 1).alias("covered"),
                       F.count(F.lit(1)).alias("n_windows")))
    per_cust = (per_island.groupBy("o_custkey")
                .agg(F.sum("covered").alias("covered_days"),
                     F.count(F.lit(1)).alias("n_islands"),
                     F.sum("n_windows").alias("n_orders")))
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    seg = (per_cust.join(c, per_cust.o_custkey == c.c_custkey)
           .groupBy("c_mktsegment")
           .agg(F.sum("covered_days").alias("covered_days"),
                (F.sum("n_orders") * (_WIN_DAYS + 1)).alias("raw_days"),
                F.sum("n_islands").alias("n_islands"),
                F.sum("n_orders").alias("n_orders")))
    return (seg.select(
        "c_mktsegment", "n_orders", "n_islands", "covered_days",
        "raw_days",
        F.floor(F.col("covered_days") * 1000000 / F.col("raw_days"))
        .cast("long").alias("coverage_micro"))
        .orderBy("c_mktsegment"))


INTERVAL_UNION_SQL = f"""
WITH iv AS (
  SELECT o_custkey,
         date_diff('day', DATE '1970-01-01',
                   CAST(o_orderdate AS DATE)) AS s,
         date_diff('day', DATE '1970-01-01',
                   CAST(o_orderdate AS DATE)) + {_WIN_DAYS} AS e
  FROM orders
),
marked AS (
  SELECT o_custkey, s, e,
         CASE WHEN max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) < s
                   OR max(e) OVER (PARTITION BY o_custkey ORDER BY s, e
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) IS NULL
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT o_custkey, s, e,
         sum(new_island) OVER (PARTITION BY o_custkey ORDER BY s, e
                               ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
),
per_island AS (
  SELECT o_custkey, island, max(e) - min(s) + 1 AS covered,
         count(*) AS n_windows
  FROM islands GROUP BY 1, 2
),
per_cust AS (
  SELECT o_custkey, sum(covered) AS covered_days,
         count(*) AS n_islands, sum(n_windows) AS n_orders
  FROM per_island GROUP BY 1
)
SELECT c_mktsegment,
       CAST(sum(n_orders) AS BIGINT) AS n_orders,
       CAST(sum(n_islands) AS BIGINT) AS n_islands,
       CAST(sum(covered_days) AS BIGINT) AS covered_days,
       CAST(sum(n_orders) * {_WIN_DAYS + 1} AS BIGINT) AS raw_days,
       CAST(floor(sum(covered_days) * 1000000
                  / (sum(n_orders) * {_WIN_DAYS + 1})) AS BIGINT)
         AS coverage_micro
FROM per_cust JOIN customer ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def profile_tukey_fences(spark: SparkSession, sf: str) -> DataFrame:
    """Tukey-fence outlier profiling per brand: quartiles of retail
    price cents (exact interpolated percentiles — identical (n−1)·p
    arithmetic both engines), fences at Q1−1.5·IQR / Q3+1.5·IQR, and
    the count outside.  Quartiles of integer cents land on quarter
    grid points, so they ride ×4 as exact ints and the fence compare
    is pure integers (cents×16 vs fence in ×16 units)."""
    p = t(spark, sf, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    base = p.select(F.col("p_brand").alias("brand"), cents.alias("c"))
    q = (base.groupBy("brand")
         .agg(F.count(F.lit(1)).alias("n"),
              (F.percentile("c", F.lit(0.25)) * 4).cast("long")
              .alias("q1_x4"),
              (F.percentile("c", F.lit(0.75)) * 4).cast("long")
              .alias("q3_x4")))
    lo = 4 * F.col("q1_x4") - 6 * (F.col("q3_x4") - F.col("q1_x4"))
    hi = 4 * F.col("q3_x4") + 6 * (F.col("q3_x4") - F.col("q1_x4"))
    j = base.join(F.broadcast(q), "brand")
    return (j.groupBy("brand", "n", "q1_x4", "q3_x4")
            .agg(F.sum(F.when((16 * F.col("c") < lo)
                              | (16 * F.col("c") > hi), 1)
                       .otherwise(0)).alias("n_outliers"))
            .orderBy("brand"))


TUKEY_SQL = """
WITH base AS (
  SELECT p_brand AS brand,
         CAST(round(p_retailprice * 100) AS BIGINT) AS c
  FROM part
),
q AS (
  SELECT brand, count(*) AS n,
         CAST(quantile_cont(c, 0.25) * 4 AS BIGINT) AS q1_x4,
         CAST(quantile_cont(c, 0.75) * 4 AS BIGINT) AS q3_x4
  FROM base GROUP BY brand
)
SELECT b.brand, q.n, q.q1_x4, q.q3_x4,
       CAST(sum(CASE WHEN 16 * b.c < 4 * q.q1_x4
                                      - 6 * (q.q3_x4 - q.q1_x4)
                       OR 16 * b.c > 4 * q.q3_x4
                                      + 6 * (q.q3_x4 - q.q1_x4)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM base b JOIN q USING (brand)
GROUP BY b.brand, q.n, q.q1_x4, q.q3_x4
ORDER BY b.brand
"""



def agg_mode_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-group MODE with a deterministic tiebreak (highest
    count, then lowest value) — the categorical summary SQL engines
    usually approximate or leave order-undefined: modal l_quantity per
    (returnflag, linestatus) with its count and share.

    Plan: one (group, value) hash agg (map-side combined), then a
    row_number over the per-group count ranking — the window
    partitions on the group key, so nothing global ever sorts."""
    li = t(spark, sf, "lineitem")
    cells = (li.groupBy(F.col("l_returnflag").alias("rf"),
                        F.col("l_linestatus").alias("ls"),
                        F.col("l_quantity").cast("long").alias("v"))
             .agg(F.count(F.lit(1)).alias("c")))
    w = Window.partitionBy("rf", "ls").orderBy(F.desc("c"), "v")
    wt = Window.partitionBy("rf", "ls")
    return (cells
            .withColumn("rn", F.row_number().over(w))
            .withColumn("n_group", F.sum("c").over(wt))
            .filter(F.col("rn") == 1)
            .select("rf", "ls", F.col("v").alias("mode_quantity"),
                    F.col("c").alias("mode_count"), "n_group",
                    F.floor(F.col("c") * 1000000 / F.col("n_group"))
                    .cast("long").alias("mode_share_micro"))
            .orderBy("rf", "ls"))


MODE_SQL = """
WITH cells AS (
  SELECT l_returnflag AS rf, l_linestatus AS ls,
         CAST(l_quantity AS BIGINT) AS v, count(*) AS c
  FROM lineitem GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY rf, ls ORDER BY c DESC, v) AS rn,
         sum(c) OVER (PARTITION BY rf, ls) AS n_group
  FROM cells
)
SELECT rf, ls, v AS mode_quantity, c AS mode_count,
       CAST(n_group AS BIGINT) AS n_group,
       CAST(floor(c * 1000000 / n_group) AS BIGINT) AS mode_share_micro
FROM ranked WHERE rn = 1
ORDER BY rf, ls
"""


QUERIES = {
    "interval_union_coverage": (interval_union_coverage,
                                INTERVAL_UNION_SQL),
    "profile_tukey_fences": (profile_tukey_fences, TUKEY_SQL),
    "agg_mode_exact": (agg_mode_exact, MODE_SQL),
}
