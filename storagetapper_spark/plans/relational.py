"""Relational operator layer (SURVEY.md §2.6) — the DuckDB-checked query
surface over the TPC-H-ish fixtures.

The reference implements none of these (it is a CDC pipeline); they come
from Spark built-ins.  Each query is written declaratively so Catalyst
applies predicate pushdown / column pruning / join selection; dimension
joins broadcast (autoBroadcastJoinThreshold in session.py).

Float-valued aggregates are rounded (2-6 dp) in BOTH the Spark plan and
the oracle SQL so partial-aggregation order differences can't flip the
value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


# --- Q1: pricing summary (scan + filter + hash agg, TPC-H Q1 shape) -----

def q1_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1.  Every aggregate is an exact-integer sum in fixed
    units (quantity, cents, 1e-4 and 1e-6 dollars), displayed through
    one shared double division — closing two cross-engine hazards on
    the flagship: (a) a raw double sum's partial order varies with
    shuffle order (the round-8 rfm_segments flake class), and (b)
    neither engine round()/avg()/DECIMAL→DOUBLE path is bit-portable
    at half boundaries (observed: avg(DECIMAL) 38.37875 → .3788 Spark
    vs .3787 DuckDB; CAST(DECIMAL(30,10) AS DOUBLE) off by one ulp).
    BIGINT→double is the one conversion both engines round
    identically; integer sums are order-free."""
    li = t(spark, sf, "lineitem")
    # exact integer units per row (price cents-exact, discount/tax
    # hundredths-exact, quantity integral): cents, disc in 1e-4
    # dollars, charge in 1e-6 dollars — every sum is an exact integer
    # and every displayed value is ONE shared double division.  At
    # >~2^53-unit totals (full 100 TB), swap the long sums for
    # decimal(38,0) sums; the per-row units stay the same.
    cents = F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    d_h = F.expr("CAST(round(l_discount * 100) AS BIGINT)")
    t_h = F.expr("CAST(round(l_tax * 100) AS BIGINT)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg((F.sum(F.col("l_quantity").cast("bigint")).cast("double"))
               .alias("sum_qty"),
               (F.sum(cents).cast("double") / 100.0)
               .alias("sum_base_price"),
               (F.sum(cents * (100 - d_h)).cast("double") / 10000.0)
               .alias("sum_disc_price"),
               (F.sum(cents * (100 - d_h) * (100 + t_h)).cast("double")
                / 1000000.0).alias("sum_charge"),
               # means: exact BIGINT unit sums + shared double
               # divisions.  Engine avg() is unportable at half
               # boundaries (Spark keeps decimals exact, DuckDB routes
               # through double), and even CAST(DECIMAL(30,10) AS
               # DOUBLE) differs by one ulp between engines on large
               # scale-10 sums — BIGINT→double is the one conversion
               # both engines round identically.
               (F.sum(F.col("l_quantity").cast("bigint")).cast("double")
                / F.count(F.lit(1))).alias("avg_qty"),
               (F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
                .cast("double") / F.count(F.lit(1)) / 100.0)
               .alias("avg_price"),
               (F.sum(F.expr("CAST(round(l_discount * 100) AS BIGINT)"))
                .cast("double") / F.count(F.lit(1)) / 100.0)
               .alias("avg_disc"),
               F.count(F.lit(1)).alias("count_order"))
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 AS sum_base_price,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                * (100 + CAST(round(l_tax * 100) AS BIGINT)))
            AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
         / count(*) AS avg_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / count(*) / 100.0 AS avg_price,
       CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
         / count(*) / 100.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# --- Q3: shipping priority (3-way join + agg + deterministic top-k) -----

def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    cust = t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
          .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"),
                   "o_orderpriority")
          # revenue in exact 1e-4-dollar units (cents × discount
          # hundredths): BIGINT sum is order-free, one shared double
          # division — the q1 idiom (raw double group sums flake)
          .agg((F.sum(F.expr(
                    "CAST(round(l_extendedprice * 100) AS BIGINT)"
                    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"))
                .cast("double") / 10000.0).alias("revenue"))
          .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
          .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- Q5: local supplier volume (6-way join incl. region/nation dims) ----

def q5_local_supplier(spark: SparkSession, sf: str) -> DataFrame:
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf, "nation")
    cust = t(spark, sf, "customer")
    sup = t(spark, sf, "supplier")
    orders = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(cust, orders.o_custkey == cust.c_custkey)
          .join(sup, (li.l_suppkey == sup.s_suppkey)
                & (cust.c_nationkey == sup.s_nationkey))
          .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
          .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
          .groupBy("n_name")
          # exact 1e-4-dollar units, shared division (q1 idiom)
          .agg((F.sum(F.expr(
                    "CAST(round(l_extendedprice * 100) AS BIGINT)"
                    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"))
                .cast("double") / 10000.0).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --- joins: semi / anti ------------------------------------------------

def join_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    cust = t(spark, sf, "customer")
    orders = t(spark, sf, "orders")
    with_orders = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
                       .select("c_custkey").withColumn("tag", F.lit("has_orders")))
    without = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
                   .select("c_custkey").withColumn("tag", F.lit("no_orders")))
    return with_orders.unionByName(without)


SEMI_ANTI_SQL = """
SELECT c_custkey, 'has_orders' AS tag FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT c_custkey, 'no_orders' AS tag FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- outer join with null handling ------------------------------------

def join_outer(spark: SparkSession, sf: str) -> DataFrame:
    nation = t(spark, sf, "nation")
    cust = t(spark, sf, "customer")
    return (
        nation.join(cust, nation.n_nationkey == cust.c_nationkey, "left")
              .groupBy("n_nationkey", "n_name")
              .agg(F.count("c_custkey").alias("n_customers"),
                   # exact cents sum + shared division (q1 idiom)
                   (F.coalesce(
                       F.sum(F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")),
                       F.lit(0)).cast("double") / 100.0).alias("total_bal"))
    )


OUTER_SQL = """
SELECT n_nationkey, n_name,
       count(c_custkey) AS n_customers,
       CAST(coalesce(sum(CAST(round(c_acctbal * 100) AS BIGINT)), 0)
            AS DOUBLE) / 100.0 AS total_bal
FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
GROUP BY n_nationkey, n_name
"""


# --- rollup / cube / grouping sets ------------------------------------

def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    cust = t(spark, sf, "customer")
    nation = t(spark, sf, "nation")
    region = t(spark, sf, "region")
    joined = (cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
                  .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey))
    return (
        joined.rollup("r_name", "n_name")
              .agg(F.count(F.lit(1)).alias("n_customers"),
                   # exact cents sum + shared division (q1 idiom)
                   (F.sum(F.expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
                    .cast("double") / 100.0).alias("total_bal"))
    )


ROLLUP_SQL = """
SELECT r_name, n_name, count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
          .agg(F.count(F.lit(1)).alias("n_items"),
               F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --- window functions --------------------------------------------------

def window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    orders = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                                F.col("o_orderkey"))
    return (
        orders.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= 3)
              .select("o_custkey", "o_orderkey",
                      F.round("o_totalprice", 2).alias("o_totalprice"), "rk")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 3
"""


def window_running(spark: SparkSession, sf: str) -> DataFrame:
    orders = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
         .alias("running_total"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
        F.rank().over(w).alias("order_rank"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
       round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price,
       round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS next_price,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_rank
FROM orders
"""


# --- sort / limit (deterministic top-n) --------------------------------

def sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber",
                  F.round("l_extendedprice", 2).alias("l_extendedprice"))
          .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
          .limit(25)
    )


SORT_LIMIT_SQL = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 25
"""


# --- set operations ----------------------------------------------------

def set_ops(spark: SparkSession, sf: str) -> DataFrame:
    cust = t(spark, sf, "customer")
    big = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    u = big.union(building).distinct().withColumn("tag", F.lit("union"))
    i = big.intersect(building).withColumn("tag", F.lit("intersect"))
    e = big.exceptAll(building).withColumn("tag", F.lit("except"))
    return u.unionByName(i).unionByName(e)


SET_OPS_SQL = """
SELECT c_custkey, 'union' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  UNION SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT c_custkey, 'intersect' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  INTERSECT SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION ALL
SELECT c_custkey, 'except' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
  EXCEPT ALL SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""


# --- scalar function library ------------------------------------------

def scalar_functions(spark: SparkSession, sf: str) -> DataFrame:
    orders = t(spark, sf, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.upper("o_orderpriority").alias("pri_upper"),
        F.substring("o_orderpriority", 1, 1).alias("pri_code"),
        F.length("o_orderpriority").alias("pri_len"),
        F.round(F.col("o_totalprice"), 1).alias("price_r1"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.ceil("o_totalprice").cast("long").alias("price_ceil"),
        F.abs(F.col("o_totalprice") - 1000).cast("double").alias("price_dev"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_pri"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("key_padded"),
    )


SCALAR_SQL = """
SELECT o_orderkey,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       day(o_orderdate) AS o_day,
       upper(o_orderpriority) AS pri_upper,
       substring(o_orderpriority, 1, 1) AS pri_code,
       length(o_orderpriority) AS pri_len,
       round(o_totalprice, 1) AS price_r1,
       CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
       CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
       CAST(abs(o_totalprice - 1000) AS DOUBLE) AS price_dev,
       o_orderkey % 7 AS key_mod7,
       concat_ws('-', o_orderstatus, o_orderpriority) AS status_pri,
       lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded
FROM orders
"""


# --- JSON column access (the reference passes JSON through as string;
# --- we expose real extraction — F.get_json_object) ---------------------

def json_extract(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
        (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_mod10"),
    )


JSON_SQL = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10
FROM events
"""


# --- distinct aggregation / having ------------------------------------

def agg_distinct_having(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
          .agg(F.countDistinct("l_suppkey").alias("n_suppliers"),
               F.countDistinct("l_partkey").alias("n_parts"),
               F.count(F.lit(1)).alias("n_items"))
          .filter(F.col("n_items") > 100)
    )


DISTINCT_HAVING_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
HAVING count(*) > 100
"""


# --- conditional aggregation (pivot shape) -----------------------------

def conditional_agg(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    def cnt(et):
        return F.sum(F.when(F.col("event_type") == et, 1).otherwise(0)).alias(f"n_{et}")
    return (
        ev.groupBy("user_id")
          .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"),
               # sum as decimal: exact, order-independent accumulation so the
               # value-hash is stable across partition orders (double sums are not)
               F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))
                             .otherwise(0.0).cast("decimal(30,10)")), 2)
                .cast("double").alias("purchase_value"))
    )


CONDITIONAL_AGG_SQL = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(round(sum(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
                           AS DECIMAL(30,10))), 2) AS DOUBLE) AS purchase_value
FROM events GROUP BY user_id
"""


# --- IN-subquery -------------------------------------------------------

def in_subquery(spark: SparkSession, sf: str) -> DataFrame:
    spark.read.parquet(f"{sf}/orders.parquet").createOrReplaceTempView("_orders_v")
    spark.read.parquet(f"{sf}/customer.parquet").createOrReplaceTempView("_cust_v")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        FROM _orders_v
        WHERE o_custkey IN (SELECT c_custkey FROM _cust_v WHERE c_acctbal < 0)
    """)


IN_SUBQUERY_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
"""


# --- event-time tumbling window (batch form of the streaming agg) ------

def window_event_time(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
          .agg(F.count(F.lit(1)).alias("n_events"),
               # exact cents sum + shared division (q1 idiom)
               (F.sum(F.expr("CAST(round(value * 100) AS BIGINT)"))
                .cast("double") / 100.0).alias("sum_value"))
          .select(F.col("w.start").cast("long").alias("window_start"),
                  "event_type", "n_events", "sum_value")
    )


WINDOW_EVENT_TIME_SQL = """
SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', ts)) AS BIGINT) AS window_start,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS sum_value
FROM events
GROUP BY 1, 2
"""


# --- sliding (hopping) event-time window -------------------------------
# Spark aligns sliding windows to epoch multiples of the slide, so every
# event belongs to exactly duration/slide windows whose starts are
# bucket(ts, slide) - k*slide.  The oracle expands each event into those
# 4 rows explicitly — exact, no approximation.

def window_sliding(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"),
                   "event_type")
          .agg(F.count(F.lit(1)).alias("n_events"))
          .select(F.col("w.start").cast("long").alias("window_start"),
                  "event_type", "n_events")
    )


WINDOW_SLIDING_SQL = """
WITH expanded AS (
  SELECT CAST(epoch(time_bucket(INTERVAL '15 minutes', ts)) AS BIGINT)
           - k.k * 900 AS window_start,
         event_type
  FROM events, (SELECT unnest(range(0, 4)) AS k) k
)
SELECT window_start, event_type, count(*) AS n_events
FROM expanded GROUP BY 1, 2
"""


# --- sessionization (gaps-and-islands; batch form of session_window) ---

def sessionize(spark: SparkSession, sf: str) -> DataFrame:
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double"), 1).over(w)
    tagged = ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
    sess = tagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        sess.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("event_id").alias("first_event"),
                 F.max("event_id").alias("last_event"),
                 F.round(F.sum(F.col("value").cast("decimal(30,10)")), 2)
                  .cast("double").alias("session_value"))
    )


SESSIONIZE_SQL = """
WITH tagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              OR lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM tagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event,
       CAST(round(sum(CAST(value AS DECIMAL(30,10))), 2) AS DOUBLE) AS session_value
FROM sess GROUP BY user_id, session_id
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier": (q5_local_supplier, Q5_SQL),
    "join_semi_anti": (join_semi_anti, SEMI_ANTI_SQL),
    "join_outer": (join_outer, OUTER_SQL),
    "agg_rollup": (agg_rollup, ROLLUP_SQL),
    "agg_cube": (agg_cube, CUBE_SQL),
    "window_topk_per_group": (window_topk_per_group, WINDOW_TOPK_SQL),
    "window_running": (window_running, WINDOW_RUNNING_SQL),
    "sort_limit": (sort_limit, SORT_LIMIT_SQL),
    "set_ops": (set_ops, SET_OPS_SQL),
    "scalar_functions": (scalar_functions, SCALAR_SQL),
    "json_extract": (json_extract, JSON_SQL),
    "agg_distinct_having": (agg_distinct_having, DISTINCT_HAVING_SQL),
    "conditional_agg": (conditional_agg, CONDITIONAL_AGG_SQL),
    "in_subquery": (in_subquery, IN_SUBQUERY_SQL),
    "window_event_time": (window_event_time, WINDOW_EVENT_TIME_SQL),
    "window_sliding": (window_sliding, WINDOW_SLIDING_SQL),
    "sessionize": (sessionize, SESSIONIZE_SQL),
}
