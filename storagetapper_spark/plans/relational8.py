"""Query batch 8: the remaining TPC-H shapes (q2/q8/q9/q11/q12/q13/
q15/q16/q20/q21), adapted to the fixture schema (no partsupp table, no
shipmode/commitdate columns) while preserving each original's PLAN
SHAPE — that is what matters at 100 TB:

- q2: correlated MIN subquery → decorrelated per-key aggregate joined
  back (never a row-to-row self-join of the fact table).
- q8: 7-way star join with two independent nation lookups + conditional
  share aggregation by year.
- q9: widest join in the suite (6 tables) + group by (nation, year).
- q11: group + HAVING against a global scalar subquery (integer math so
  threshold membership is engine-deterministic).
- q12: join + conditional counts (CASE inside SUM).
- q13: LEFT OUTER join with a filtered join condition + two-level agg.
- q15: aggregate view + global-max scalar subquery (argmax join).
- q16: COUNT(DISTINCT) with an anti-joined exclusion list.
- q20: nested semi-joins gated by a correlated aggregate threshold.
- q21: semi + anti non-equi self-joins on the fact table.

All dimension joins are broadcast (dims are tiny vs the 100 TB fact);
fact-side shuffles are keyed on join/group keys only.  Integer-count
columns are cast to BIGINT in both engines (DuckDB sums surface as
HUGEINT→float64 through pandas otherwise — the round-2 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


# --- q2: minimum-cost supplier (correlated MIN subquery, decorrelated) ---

def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q2 shape.  Without partsupp, the part↔supplier offer list
    is derived from lineitem as the observed per-unit price.  For each
    SMALL/size-15 part, keep the EUROPE supplier(s) offering the
    minimum unit price.  The correlated MIN decorrelates to a per-part
    aggregate over the SAME restricted offer set, joined back on
    (partkey, exact min) — the offer set is computed once and reused,
    and the fact table is never self-joined row-to-row.

    Unit prices are EXACT integers in 1e-4 currency units
    (cents * 100 div quantity — price is cents-exact, quantity
    integral), so the per-part minimum, the tie set, and the displayed
    value cannot diverge across engines.  The round-8 sf0.1 sweep
    caught the previous round(double, 4) form differing by one ulp on
    a .xxxx5 boundary (60.2712 vs 60.2713) — the rounding-pitfall
    pattern from SCALE.md, fixed the house way (exact integers, then
    one shared double division for display)."""
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
    supp = t(spark, sf, "supplier")
    nation = t(spark, sf, "nation")
    region = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (supp.join(F.broadcast(nation),
                         supp.s_nationkey == nation.n_nationkey)
                   .join(F.broadcast(region),
                         nation.n_regionkey == region.r_regionkey)
                   .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    # observed offers: min unit price per (part, supplier), EU suppliers,
    # target parts only (both filters pushed below the aggregate)
    unit_e4 = F.expr("(CAST(round(l_extendedprice * 100) AS BIGINT) * 100)"
                     " div CAST(l_quantity AS BIGINT)")
    offers = (li.join(F.broadcast(part.select("p_partkey", "p_name")),
                      li.l_partkey == F.col("p_partkey"))
                .join(F.broadcast(eu_supp),
                      li.l_suppkey == F.col("s_suppkey"))
                .groupBy("p_partkey", "p_name", "s_suppkey", "s_name",
                         "s_acctbal", "n_name")
                .agg(F.min(unit_e4).alias("unit_e4")))
    min_offer = (offers.groupBy("p_partkey")
                       .agg(F.min("unit_e4").alias("min_e4")))
    return (offers.join(F.broadcast(min_offer), "p_partkey")
                  .filter(F.col("unit_e4") == F.col("min_e4"))
                  .select("p_partkey", "p_name", "s_name", "n_name",
                          F.round("s_acctbal", 2).alias("s_acctbal"),
                          (F.col("unit_e4") / F.lit(10000.0))
                          .alias("unit_price"))
                  .orderBy("p_partkey", "s_name"))


Q2_SQL = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), offers AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         min((CAST(round(l_extendedprice * 100) AS BIGINT) * 100)
             // CAST(l_quantity AS BIGINT)) AS unit_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
                JOIN eu_supp ON l_suppkey = s_suppkey
  WHERE p_size = 15 AND p_type = 'SMALL'
  GROUP BY ALL
)
SELECT p_partkey, p_name, s_name, n_name,
       round(s_acctbal, 2) AS s_acctbal,
       unit_e4 / 10000.0 AS unit_price
FROM offers o
WHERE unit_e4 = (SELECT min(unit_e4) FROM offers o2
                 WHERE o2.p_partkey = o.p_partkey)
ORDER BY p_partkey, s_name
"""


# --- q8: national market share ------------------------------------------

def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q8 shape: NATION_7 suppliers' share of ECONOMY-part revenue
    sold to AMERICA customers, by order year.  Two independent nation
    lookups (customer side restricts, supplier side classifies); every
    dimension is broadcast so the only wide shuffle is the
    lineitem↔orders key join."""
    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders")
    cust = t(spark, sf, "customer")
    part = t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    supp = t(spark, sf, "supplier")
    nation = t(spark, sf, "nation")
    region = t(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    am_cust = (cust.join(F.broadcast(nation.alias("cn")),
                         cust.c_nationkey == F.col("cn.n_nationkey"))
                   .join(F.broadcast(region),
                         F.col("cn.n_regionkey") == region.r_regionkey)
                   .select("c_custkey"))
    supp_nat = (supp.join(F.broadcast(nation.alias("sn")),
                          supp.s_nationkey == F.col("sn.n_nationkey"))
                    .select("s_suppkey", F.col("sn.n_name").alias("supp_nation")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(part.select("p_partkey")),
                    li.l_partkey == F.col("p_partkey"))
              .join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(am_cust),
                    orders.o_custkey == F.col("c_custkey"), "left_semi")
              .join(F.broadcast(supp_nat),
                    li.l_suppkey == F.col("s_suppkey"))
              .groupBy(F.year("o_orderdate").alias("o_year"))
              .agg(F.round(
                      F.sum(F.when(F.col("supp_nation") == "NATION_7", rev)
                             .otherwise(0.0)) / F.sum(rev), 4)
                    .alias("mkt_share"))
              .orderBy("o_year"))


Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_7'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'ECONOMY'
  AND EXISTS (SELECT 1 FROM customer
              JOIN nation n1 ON c_nationkey = n1.n_nationkey
              JOIN region ON n1.n_regionkey = r_regionkey
              WHERE c_custkey = o_custkey AND r_name = 'AMERICA')
GROUP BY o_year
ORDER BY o_year
"""


# --- q9: product-type profit by nation and year --------------------------

def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q9 shape: profit on 'red' parts by supplier nation × ship
    year.  Without ps_supplycost, cost is proxied as
    0.8 × p_retailprice × quantity (reference q9 is
    revenue − supplycost×qty — same expression shape).  Widest join in
    the suite; all dims broadcast, fact scanned once."""
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part").filter(F.col("p_name").contains("red"))
    supp = t(spark, sf, "supplier")
    nation = t(spark, sf, "nation")
    # profit in exact 1e-4-dollar units: revenue = cents × discount
    # hundredths; cost = 0.8 × retail × qty dollars = 80 × retail_cents
    # × qty units (retail cents-exact, qty integral).  BIGINT sum is
    # order-free; one shared double division (q1 idiom).
    profit_units = F.expr(
        "CAST(round(l_extendedprice * 100) AS BIGINT)"
        " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
        " - 80 * CAST(round(p_retailprice * 100) AS BIGINT)"
        " * CAST(l_quantity AS BIGINT)")
    return (li.join(F.broadcast(part.select("p_partkey", "p_retailprice")),
                    li.l_partkey == F.col("p_partkey"))
              .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
                    li.l_suppkey == F.col("s_suppkey"))
              .join(F.broadcast(nation),
                    F.col("s_nationkey") == nation.n_nationkey)
              .groupBy(F.col("n_name").alias("supp_nation"),
                       F.year("l_shipdate").alias("o_year"))
              .agg((F.sum(profit_units).cast("double") / 10000.0)
                   .alias("sum_profit"))
              .orderBy("supp_nation", F.desc("o_year")))


Q9_SQL = """
SELECT n_name AS supp_nation,
       year(l_shipdate) AS o_year,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - 80 * CAST(round(p_retailprice * 100) AS BIGINT)
                * CAST(l_quantity AS BIGINT))
            AS DOUBLE) / 10000.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY supp_nation, o_year
ORDER BY supp_nation, o_year DESC
"""


# --- q11: important part values (HAVING vs global scalar) ----------------

def q11_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q11 shape: parts whose shipped volume from NATION_3
    suppliers exceeds 1/2000 of that nation's total volume.  Volume is
    integral (BIGINT quantity sums) so the HAVING threshold
    (2000·part > total) is exact integer math — threshold membership
    cannot flip on float accumulation order.  The global total is a
    1-row broadcast, exactly like the reference's scalar subquery."""
    li = t(spark, sf, "lineitem")
    supp = t(spark, sf, "supplier")
    nation = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = (supp.join(F.broadcast(nation),
                          supp.s_nationkey == nation.n_nationkey)
                    .select("s_suppkey"))
    vols = (li.join(F.broadcast(nat_supp),
                    li.l_suppkey == F.col("s_suppkey"), "left_semi")
              .groupBy("l_partkey")
              .agg(F.sum(F.col("l_quantity").cast("long")).alias("volume")))
    total = vols.agg(F.sum("volume").alias("total_volume"))
    return (vols.crossJoin(F.broadcast(total))
                .filter(F.col("volume") * 2000 > F.col("total_volume"))
                .select("l_partkey", "volume")
                .orderBy(F.desc("volume"), "l_partkey"))


Q11_SQL = """
WITH vols AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS volume
  FROM lineitem
  WHERE EXISTS (SELECT 1 FROM supplier JOIN nation ON s_nationkey = n_nationkey
                WHERE s_suppkey = l_suppkey AND n_name = 'NATION_3')
  GROUP BY l_partkey
)
SELECT l_partkey, volume
FROM vols
WHERE volume * 2000 > (SELECT CAST(sum(volume) AS BIGINT) FROM vols)
ORDER BY volume DESC, l_partkey
"""


# --- q12: shipping priority classes by line status -----------------------

def q12_priority_by_status(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q12 shape (l_returnflag stands in for l_shipmode): for
    1997 shipments, count critical- vs normal-priority orders per
    flag.  Conditional counts fold into one aggregate pass; the only
    shuffle is the orders join (orders side broadcast-eligible after
    projection)."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    orders = t(spark, sf, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .groupBy("l_returnflag")
              .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                    .alias("high_line_count"),
                   F.sum(F.when(high, 0).otherwise(1)).cast("long")
                    .alias("low_line_count"))
              .orderBy("l_returnflag"))


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- q13: customer order-count distribution ------------------------------

def q13_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q13 shape: LEFT OUTER join with the filter INSIDE the join
    condition (customers with zero qualifying orders must survive with
    count 0), then a second aggregation over the first's result."""
    cust = t(spark, sf, "customer")
    orders = t(spark, sf, "orders").filter(F.col("o_orderstatus") != "P")
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                    .groupBy("c_custkey")
                    .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
                    .agg(F.count(F.lit(1)).alias("custdist"))
                    .orderBy(F.desc("custdist"), F.desc("c_count")))


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderstatus <> 'P'
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# --- q15: top supplier (aggregate view + global-max argmax join) ---------

def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q15 shape: quarterly revenue per supplier, then the
    supplier(s) achieving the global maximum.  The max is computed
    within the same engine that computes the per-supplier sums, so
    argmax selection is self-consistent even though cross-engine float
    sums can differ in the last ulp; only the displayed revenue is
    rounded."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    supp = t(spark, sf, "supplier")
    revenue = (li.groupBy("l_suppkey")
                 .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                       .alias("total_revenue")))
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (revenue.crossJoin(F.broadcast(max_rev))
                   .filter(F.col("total_revenue") == F.col("max_revenue"))
                   .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
                   .select(F.col("s_suppkey"), F.col("s_name"),
                           F.round("total_revenue", 2).alias("total_revenue"))
                   .orderBy("s_suppkey"))


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# --- q16: supplier counts per part class (distinct + anti-join) ----------

def q16_supplier_counts(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q16 shape: distinct suppliers per (brand, type, size) for
    qualifying parts, excluding a supplier blacklist (negative balance
    stands in for the complaints LIKE).  The part↔supplier link comes
    from lineitem, pre-deduplicated BEFORE the dimension join so the
    count-distinct shuffle carries (partkey, suppkey) pairs only."""
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    bad_supp = t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0.0) \
                                       .select("s_suppkey")
    links = li.select("l_partkey", "l_suppkey").distinct()
    return (links.join(F.broadcast(bad_supp),
                       links.l_suppkey == F.col("s_suppkey"), "left_anti")
                 .join(F.broadcast(part), links.l_partkey == part.p_partkey)
                 .groupBy("p_brand", "p_type", "p_size")
                 .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
                 .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) links
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- q20: dominant suppliers of promoted parts ---------------------------

def q20_dominant_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q20 shape: ASIA suppliers who shipped more than 30% of a
    'small' part's 1997 volume (availqty > ½·shipped in the original —
    same correlated-threshold-then-semi-join nesting).  The threshold
    compares integral BIGINT sums (10·qty > 3·total) so membership is
    exact; the qualifying (part, supplier) set semi-joins into
    supplier, shipping only keys."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    part = t(spark, sf, "part").filter(F.col("p_name").startswith("small")) \
                               .select("p_partkey")
    supp = t(spark, sf, "supplier")
    nation = t(spark, sf, "nation")
    region = t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    shipped = (li.join(F.broadcast(part), li.l_partkey == F.col("p_partkey"),
                       "left_semi")
                 .groupBy("l_partkey", "l_suppkey")
                 .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty")))
    totals = (shipped.groupBy("l_partkey")
                     .agg(F.sum("qty").alias("total_qty")))
    dominant = (shipped.join(F.broadcast(totals), "l_partkey")
                       .filter(F.col("qty") * 10 > F.col("total_qty") * 3)
                       .select("l_suppkey").distinct())
    return (supp.join(F.broadcast(nation),
                      supp.s_nationkey == nation.n_nationkey)
                .join(F.broadcast(region),
                      nation.n_regionkey == region.r_regionkey)
                .join(dominant, supp.s_suppkey == dominant.l_suppkey,
                      "left_semi")
                .select("s_suppkey", "s_name", "n_name")
                .orderBy("s_suppkey"))


Q20_SQL = """
WITH shipped AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
  GROUP BY l_partkey, l_suppkey
), totals AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty
  FROM shipped GROUP BY l_partkey
)
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (SELECT DISTINCT s.l_suppkey
                    FROM shipped s JOIN totals t ON s.l_partkey = t.l_partkey
                    WHERE s.qty * 10 > t.total_qty * 3)
ORDER BY s_suppkey
"""


# --- q21: suppliers who shipped last (semi + anti non-equi self-joins) ---

def q21_last_shippers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q21 shape: NATION_2 suppliers who were the SOLE latest
    shipper on a finished multi-supplier order (receipt>commit stands
    in as shipdate ordering).

    Single-fact-shuffle form (VERDICT r4 #6: the l1/l2/l3 triple
    self-join shuffled lineitem THREE times under sort-merge with no
    exchange reuse — column pruning made the l2/l3 subplans
    non-identical).  The EXISTS / NOT-EXISTS pair is order-local, so
    one repartition by l_orderkey carries everything: hash partitioning
    on (o) satisfies the clustering requirement of BOTH the
    (o, suppkey) aggregate and the per-order window, so Catalyst
    inserts no further Exchange on the fact side.  Per order:
      m1 = latest per-supplier max shipdate, a_min/a_max = the
      suppliers attaining it (a_min==a_max==s ⟺ s is the UNIQUE
      attainer), m2 = best other-supplier max.  A supplier's row l1
      "waits" ⟺ ≥2 suppliers on the order, s uniquely attains m1, and
      l1.shipdate > m2 — exactly ¬∃ other supplier shipping ≥ it.
    Row multiplicity is recovered from the per-(o,s) shipdate list
    (bounded by lineitems-per-order, ≤7 in TPC-H at any SF — safe to
    collect).  Orders-status semi-join moves one narrow row per
    winning (order, supplier), not per lineitem."""
    from pyspark.sql import Window

    li = t(spark, sf, "lineitem")
    orders = t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F") \
                                   .select("o_orderkey")
    supp = t(spark, sf, "supplier")
    nation = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_2")
    slim = (li.select("l_orderkey", "l_suppkey", "l_shipdate")
              .repartition("l_orderkey"))
    persup = (slim.groupBy("l_orderkey", "l_suppkey")
                  .agg(F.max("l_shipdate").alias("smax"),
                       F.collect_list("l_shipdate").alias("ships")))
    w = Window.partitionBy("l_orderkey")
    lvl = (persup
           .withColumn("m1", F.max("smax").over(w))
           .withColumn("n_supp", F.count(F.lit(1)).over(w)))
    attain = F.when(F.col("smax") == F.col("m1"), F.col("l_suppkey"))
    lvl = lvl.select(
        "*",
        F.min(attain).over(w).alias("a_min"),
        F.max(attain).over(w).alias("a_max"),
        F.max(F.when(F.col("smax") < F.col("m1"), F.col("smax")))
         .over(w).alias("m2"))
    winners = (lvl.filter((F.col("n_supp") >= 2)
                          & (F.col("a_min") == F.col("l_suppkey"))
                          & (F.col("a_max") == F.col("l_suppkey")))
                  .select("l_orderkey", "l_suppkey",
                          F.size(F.filter(
                              "ships",
                              lambda x: x > F.col("m2"))).alias("n_rows")))
    waiting = winners.join(orders,
                           winners.l_orderkey == orders.o_orderkey,
                           "left_semi")
    return (waiting.join(F.broadcast(
                             supp.join(F.broadcast(nation),
                                       supp.s_nationkey == nation.n_nationkey)
                                 .select("s_suppkey", "s_name")),
                         F.col("l_suppkey") == F.col("s_suppkey"))
                   .groupBy("s_name")
                   .agg(F.sum("n_rows").cast("long").alias("numwait"))
                   .orderBy(F.desc("numwait"), "s_name"))


Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND l1.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate >= l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


QUERIES = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_profit": (q9_product_profit, Q9_SQL),
    "q11_important_parts": (q11_important_parts, Q11_SQL),
    "q12_priority_by_status": (q12_priority_by_status, Q12_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_supplier_counts": (q16_supplier_counts, Q16_SQL),
    "q20_dominant_suppliers": (q20_dominant_suppliers, Q20_SQL),
    "q21_last_shippers": (q21_last_shippers, Q21_SQL),
}
