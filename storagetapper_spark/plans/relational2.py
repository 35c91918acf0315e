"""Relational layer, batch 2: statistical aggregates, percentiles,
pivot, date/string function library, null semantics, correlated
subqueries, cross join — completing the SURVEY.md §2.6 sweep."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


# --- statistical aggregates --------------------------------------------

def agg_stats(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .agg(F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
               F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
               F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
               F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
               F.round(F.min("l_extendedprice"), 2).alias("min_price"),
               F.round(F.max("l_extendedprice"), 2).alias("max_price"))
    )


AGG_STATS_SQL = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 4) AS sd_qty,
       round(var_samp(l_quantity), 4) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
"""


# --- exact percentiles -------------------------------------------------

def agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    # r10: one percentile(col, array(...)) buffer for the three price
    # quantiles instead of three independent sort buffers — identical
    # exact algorithm and interpolation, ~1/3 the agg memory and sort
    # work (guide §1.2 per-task work).
    pp = F.expr("percentile(l_extendedprice, array(0.5, 0.25, 0.95))")
    return (
        li.groupBy("l_linestatus")
          .agg(pp.alias("_pp"),
               F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"))
          .select("l_linestatus",
                  F.round(F.col("_pp")[0], 4).alias("p50"),
                  F.round(F.col("_pp")[1], 4).alias("p25"),
                  F.round(F.col("_pp")[2], 4).alias("p95"),
                  "median_qty")
    )


PERCENTILES_SQL = """
SELECT l_linestatus,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       round(quantile_cont(l_quantity, 0.5), 4) AS median_qty
FROM lineitem GROUP BY l_linestatus
"""


def agg_percentiles_tpr(spark: SparkSession, sf: str) -> DataFrame:
    """The SAME exact percentiles as agg_percentiles — same oracle SQL —
    computed scale-safely: operators/ranks.exact_percentiles ranks the
    values with the two-pass rank (parallel across price buckets, no
    per-group single-task sort) and interpolates the boundary rows.
    This retires the 'exact percentile family is scale-weak' flag with
    an EXACT plan, not an approximation: percentile() is kept in
    agg_percentiles as the reference form, this is the 100 TB form,
    and both hash-match the same DuckDB quantile_cont oracle."""
    from storagetapper_spark.operators.ranks import exact_percentiles

    li = t(spark, sf, "lineitem")
    price = exact_percentiles(
        li, "l_extendedprice", [0.5, 0.25, 0.95],
        F.floor(F.col("l_extendedprice") / F.lit(2000.0)),
        partition=["l_linestatus"])
    qty = exact_percentiles(
        li, "l_quantity", [0.5], F.floor(F.col("l_quantity") / F.lit(5.0)),
        partition=["l_linestatus"]) \
        .withColumnRenamed("p_0_5", "q_0_5")
    return (price.join(qty, "l_linestatus")
            .select("l_linestatus",
                    F.round("p_0_5", 4).alias("p50"),
                    F.round("p_0_25", 4).alias("p25"),
                    F.round("p_0_95", 4).alias("p95"),
                    F.round("q_0_5", 4).alias("median_qty")))


# exact percentile() sorts every group — correct for the oracle, wrong
# at 100 TB.  The scaled variant uses approx_percentile (t-digest-style
# mergeable sketch, one partial-agg pass, no per-group sort); its values
# are engine-specific, so the checkable contract mirrors approx_distinct:
# exact medians plus a self-consistency flag that Spark's sketch lands
# within 1% of Spark's own exact percentile (both deterministic).

def agg_percentiles_approx(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    exact = F.expr("percentile(l_extendedprice, 0.5)")
    approx = F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
    return (
        li.groupBy("l_linestatus")
          .agg(F.round(exact, 4).alias("p50_exact"),
               (F.abs(approx - exact) <= 0.01 * exact).alias("within_1pct"))
    )


PERCENTILES_APPROX_SQL = """
SELECT l_linestatus,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_exact,
       TRUE AS within_1pct
FROM lineitem GROUP BY l_linestatus
"""


# --- pivot (wide conditional aggregation) ------------------------------

def pivot_returnflag(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_linestatus")
          .pivot("l_returnflag", ["A", "N", "R"])
          .agg(F.round(F.sum("l_quantity"), 2))
    )


PIVOT_SQL = """
SELECT l_linestatus,
       round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
       round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
       round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
FROM lineitem GROUP BY l_linestatus
"""


# --- date function library ---------------------------------------------

def date_functions(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").alias("o_quarter"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        F.dayofyear(d).alias("doy"),
        F.weekofyear(d).alias("iso_week"),
    )


DATE_SQL = """
SELECT o_orderkey,
       quarter(o_orderdate) AS o_quarter,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       dayofyear(o_orderdate) AS doy,
       weekofyear(o_orderdate) AS iso_week
FROM orders
"""


# --- string function library, batch 2 ----------------------------------

def string_functions(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "Brand#(\\d+)", 1).cast("int").alias("brand_num"),
        F.translate("p_type", "aeiou", "AEIOU").alias("type_vowels"),
        F.reverse(F.col("p_name")).alias("name_rev"),
        F.expr("left(p_name, 5)").alias("name_l5"),
        F.expr("right(p_name, 3)").alias("name_r3"),
        F.instr(F.col("p_type"), "ED").alias("ed_pos"),
        F.repeat(F.col("p_brand"), 2).alias("brand_x2"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trim"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first_word"),
    )


STRING_SQL = """
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INT) AS brand_num,
       translate(p_type, 'aeiou', 'AEIOU') AS type_vowels,
       reverse(p_name) AS name_rev,
       left(p_name, 5) AS name_l5,
       right(p_name, 3) AS name_r3,
       instr(p_type, 'ED') AS ed_pos,
       repeat(p_brand, 2) AS brand_x2,
       trim('  ' || p_name || '  ') AS name_trim,
       string_split(p_type, ' ')[1] AS type_first_word
FROM part
"""


# --- null semantics ----------------------------------------------------

def null_semantics(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    neg = F.when(F.col("c_acctbal") < 0, F.col("c_acctbal"))  # null when >= 0
    return c.select(
        "c_custkey",
        F.round(F.coalesce(neg, F.lit(0.0)), 2).alias("neg_or_zero"),
        F.round(F.nullif(F.col("c_nationkey").cast("double"), F.lit(0.0)), 2)
         .alias("nation_nullif0"),
        neg.eqNullSafe(F.lit(None).cast("double")).alias("isnull_nullsafe"),
        F.isnull(neg).alias("is_null"),
        F.round(F.nvl2(neg, F.lit(1.0), F.lit(-1.0)), 1).alias("nvl2_flag"),
    )


NULL_SQL = """
SELECT c_custkey,
       round(coalesce(CASE WHEN c_acctbal < 0 THEN c_acctbal END, 0.0), 2) AS neg_or_zero,
       round(nullif(CAST(c_nationkey AS DOUBLE), 0.0), 2) AS nation_nullif0,
       (CASE WHEN c_acctbal < 0 THEN c_acctbal END IS NOT DISTINCT FROM NULL) AS isnull_nullsafe,
       (CASE WHEN c_acctbal < 0 THEN c_acctbal END IS NULL) AS is_null,
       round(CASE WHEN (CASE WHEN c_acctbal < 0 THEN c_acctbal END) IS NOT NULL
                  THEN 1.0 ELSE -1.0 END, 1) AS nvl2_flag
FROM customer
"""


# --- correlated EXISTS subquery ----------------------------------------

def exists_correlated(spark: SparkSession, sf: str) -> DataFrame:
    t(spark, sf, "orders").createOrReplaceTempView("_o2")
    t(spark, sf, "lineitem").createOrReplaceTempView("_l2")
    return spark.sql("""
        SELECT o_orderkey, o_orderstatus
        FROM _o2
        WHERE EXISTS (SELECT 1 FROM _l2
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """)


EXISTS_SQL = """
SELECT o_orderkey, o_orderstatus
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
"""


# --- scalar subquery + cross join --------------------------------------

def scalar_subquery_cross(spark: SparkSession, sf: str) -> DataFrame:
    c = t(spark, sf, "customer")
    # the scalar average rides an exact cents sum + shared division
    # (q1 idiom): a raw double avg()'s last ulp varies with partial
    # order, which would wobble every bal_vs_avg row and flip
    # above_avg at the boundary
    avg_bal = c.agg((F.sum(F.expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
                     .cast("double") / F.count(F.lit(1)) / 100.0).alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
         .select("c_custkey",
                 F.round(F.col("c_acctbal") - F.col("a"), 2).alias("bal_vs_avg"),
                 (F.col("c_acctbal") > F.col("a")).alias("above_avg"))
    )


SCALAR_SUBQ_SQL = """
SELECT c_custkey,
       round(c_acctbal
             - (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                            AS DOUBLE) / count(*) / 100.0
                FROM customer), 2) AS bal_vs_avg,
       c_acctbal > (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                                AS DOUBLE) / count(*) / 100.0
                    FROM customer) AS above_avg
FROM customer
"""


# --- approximate distinct --------------------------------------------
# HLL sketch values are engine-specific, so the checkable contract is:
# exact distinct count (oracle-comparable) plus a self-consistency flag
# asserting Spark's deterministic HLL lands within 5% of its own exact
# count — the oracle emits the exact counts and literal TRUE.

def approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .agg(F.countDistinct("l_partkey").alias("exact_parts"),
               F.approx_count_distinct("l_partkey").alias("_approx"))
          .select("l_returnflag", "exact_parts",
                  (F.abs(F.col("_approx") - F.col("exact_parts"))
                   <= 0.05 * F.col("exact_parts")).alias("within_5pct"))
    )


APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS within_5pct
FROM lineitem
GROUP BY l_returnflag
"""


# --- array / higher-order functions ------------------------------------

def array_functions(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    words = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(words).alias("n_words"),
        F.array_sort(words).getItem(0).alias("first_sorted"),
        F.array_max(F.transform(words, lambda w: F.length(w))).alias("longest_word"),
        F.concat_ws("_", F.slice(words, 1, 2)).alias("first_two"),
        F.size(F.filter(words, lambda w: F.length(w) > 4)).alias("n_long_words"),
    )


ARRAY_SQL = """
SELECT p_partkey,
       len(string_split(p_name, ' ')) AS n_words,
       list_sort(string_split(p_name, ' '))[1] AS first_sorted,
       list_max(list_transform(string_split(p_name, ' '), w -> length(w))) AS longest_word,
       array_to_string(string_split(p_name, ' ')[1:2], '_') AS first_two,
       len(list_filter(string_split(p_name, ' '), w -> length(w) > 4)) AS n_long_words
FROM part
"""


QUERIES = {
    "agg_stats": (agg_stats, AGG_STATS_SQL),
    "agg_percentiles": (agg_percentiles, PERCENTILES_SQL),
    "agg_percentiles_approx": (agg_percentiles_approx, PERCENTILES_APPROX_SQL),
    "agg_percentiles_tpr": (agg_percentiles_tpr, PERCENTILES_SQL),
    "pivot_returnflag": (pivot_returnflag, PIVOT_SQL),
    "date_functions": (date_functions, DATE_SQL),
    "string_functions2": (string_functions, STRING_SQL),
    "null_semantics": (null_semantics, NULL_SQL),
    "exists_correlated": (exists_correlated, EXISTS_SQL),
    "scalar_subquery_cross": (scalar_subquery_cross, SCALAR_SUBQ_SQL),
    "approx_distinct": (approx_distinct, APPROX_DISTINCT_SQL),
    "array_functions": (array_functions, ARRAY_SQL),
}


def agg_weighted_median(spark: SparkSession, sf: str) -> DataFrame:
    """Quantity-weighted median of extended price: the smallest price
    whose cumulative weight reaches half the total — exact integers on
    the price-cents grid (the percentile-grid discipline: group by
    quantized value, cumulative window over the bounded grid, one
    integer comparison 2*cumw >= W).  The plain median is reported
    next to it for the skew contrast."""
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.floor(F.col("l_quantity")).cast("long").alias("wt"))
    grid = li.groupBy("v").agg(F.sum("wt").alias("w"),
                               F.count(F.lit(1)).alias("c"))
    win = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select("v", F.sum("w").over(win).alias("cw"),
                      F.sum("c").over(win).alias("cc"))
    tot = grid.agg(F.sum("w").alias("tw"), F.sum("c").alias("tc"))
    j = cum.crossJoin(F.broadcast(tot))
    wmed = (j.filter(F.col("cw") * 2 >= F.col("tw"))
            .agg(F.min("v").alias("weighted_median_cents")))
    med = (j.filter(F.col("cc") * 2 >= F.col("tc"))
           .agg(F.min("v").alias("median_cents")))
    return (tot.crossJoin(F.broadcast(wmed)).crossJoin(F.broadcast(med))
            .select(F.col("tw").alias("total_weight"),
                    F.col("tc").alias("rows"),
                    "weighted_median_cents", "median_cents"))


WEIGHTED_MEDIAN_SQL = """
WITH li AS (
  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS v,
         CAST(floor(l_quantity) AS BIGINT) AS wt
  FROM lineitem
),
grid AS (
  SELECT v, CAST(sum(wt) AS BIGINT) AS w, count(*) AS c
  FROM li GROUP BY v
),
cum AS (
  SELECT v,
         CAST(sum(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cw,
         CAST(sum(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cc
  FROM grid
),
tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS tw, CAST(sum(c) AS BIGINT) AS tc
  FROM grid
)
SELECT tw AS total_weight, tc AS rows,
       (SELECT min(v) FROM cum, tot WHERE cw * 2 >= tw)
         AS weighted_median_cents,
       (SELECT min(v) FROM cum, tot WHERE cc * 2 >= tc)
         AS median_cents
FROM tot
"""


QUERIES["agg_weighted_median"] = (agg_weighted_median,
                                  WEIGHTED_MEDIAN_SQL)
