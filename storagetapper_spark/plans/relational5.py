"""Relational layer, batch 5: more TPC-H-shaped multi-join analytics
(volume shipping, returned-item reporting, large-volume customers)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue flow between two nation pairs by ship year."""
    nation = t(spark, sf, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"),
                                   F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nk"),
                                   F.col("n_name").alias("cust_nation")))
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")
    sup = t(spark, sf, "supplier")
    pair = ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")) | \
           ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(cust, orders.o_custkey == cust.c_custkey)
          .join(sup, li.l_suppkey == sup.s_suppkey)
          .join(n1, sup.s_nationkey == F.col("s_nk"))
          .join(n2, cust.c_nationkey == F.col("c_nk"))
          .filter(pair)
          .groupBy("supp_nation", "cust_nation",
                   F.year("l_shipdate").alias("l_year"))
          # exact 1e-4-dollar units, shared division (q1 idiom)
          .agg((F.sum(F.expr(
                    "CAST(round(l_extendedprice * 100) AS BIGINT)"
                    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"))
                .cast("double") / 10000.0).alias("revenue"))
    )


Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """Top customers by revenue lost to returns (deterministic top-20)."""
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")
    nation = F.broadcast(t(spark, sf, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
          .join(cust, orders.o_custkey == cust.c_custkey)
          .join(nation, cust.c_nationkey == nation.n_nationkey)
          .groupBy("c_custkey", "c_name", "n_name",
                   F.round("c_acctbal", 2).alias("c_acctbal"))
          # exact 1e-4-dollar units, shared division (q1 idiom)
          .agg((F.sum(F.expr(
                    "CAST(round(l_extendedprice * 100) AS BIGINT)"
                    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"))
                .cast("double") / 10000.0).alias("revenue"))
          .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
          .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS c_acctbal,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, round(c_acctbal, 2)
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q18_large_volume(spark: SparkSession, sf: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold (HAVING-subquery
    join-back shape)."""
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")
    big = (li.groupBy("l_orderkey")
             .agg(F.sum("l_quantity").alias("_raw_qty"))
             .filter(F.col("_raw_qty") > 150)  # HAVING on the raw sum
             .select("l_orderkey", F.round("_raw_qty", 2).alias("total_qty")))
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
           .join(cust, orders.o_custkey == cust.c_custkey)
           .select("c_custkey", "c_name", "o_orderkey",
                   F.to_date("o_orderdate").alias("o_orderdate"),
                   F.round("o_totalprice", 2).alias("o_totalprice"),
                   "total_qty")
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


QUERIES = {
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "q18_large_volume": (q18_large_volume, Q18_SQL),
}
