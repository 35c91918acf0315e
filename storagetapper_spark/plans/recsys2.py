"""Recommender batch 2: one exact ALS half-step — the alternating-
least-squares user update with fixed 2-dim item factors, solved in
closed form per user (2x2 Cramer over exact integer sufficient
statistics).  This is the building block a distributed ALS iterates:
item factors broadcast, each user's normal equations assembled
map-side from its own ratings, no cross-user communication (the
Koren/Bell/Volinsky alternating scheme; one half-step is exactly
solvable and therefore oracle-checkable, the full loop is this step
alternated).

Item factors derive deterministically from part keys via the
registry's md5 idiom (integer milli-units), ratings are per-
(customer, part) quantity sums — so every sufficient statistic is an
exact BIGINT and the per-user solve is one double expression shared
verbatim with the oracle.

Scale shape (100 TB): ratings shuffle ONCE on (cust, part) for the
rating rollup; the five per-user sums are a second keyed aggregate;
factors never materialize per rating row beyond the map side.  The
2x2 closed form generalizes to k² sums per user — still one aggregate
row per user for any small k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_LAMBDA = "1000000.0"  # ridge term in milli^2 units == 1.0 factor^2
_TOPN = 25


def recsys_als_user_step(spark: SparkSession, sf: str) -> DataFrame:
    """One exact ALS user half-step: for the 25 highest-volume
    customers, solve u = (F'F + λI)⁻¹ F'r over their rated parts'
    fixed 2-dim factors.  Outputs the solved user factors and the
    training-RMSE-proxy residual moment so successive half-steps can
    be compared."""
    li = t(spark, sf, "lineitem")
    # deterministic 2-dim item factors in milli-units [-1000, 1000]
    f = [(F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit(ax), F.col("l_partkey").cast("string"))), 1, 8),
        16, 10).cast("long") % 2001 - 1000).alias(ax)
        for ax in ("f1", "f2")]
    ratings = (li.select(F.col("l_orderkey"), F.col("l_partkey"),
                         F.col("l_quantity").cast("long").alias("q"))
               .join(t(spark, sf, "orders")
                     .select("o_orderkey", "o_custkey"),
                     F.col("l_orderkey") == F.col("o_orderkey"))
               .groupBy("o_custkey", "l_partkey")
               .agg(F.sum("q").alias("r"))
               .select("o_custkey", "l_partkey", "r", *f))
    sums = ratings.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("f1") * F.col("f1")).alias("a11"),
        F.sum(F.col("f1") * F.col("f2")).alias("a12"),
        F.sum(F.col("f2") * F.col("f2")).alias("a22"),
        F.sum(F.col("f1") * F.col("r")).alias("b1"),
        F.sum(F.col("f2") * F.col("r")).alias("b2"),
        F.sum(F.col("r") * F.col("r")).alias("rr"))
    lam = F.expr(_LAMBDA)
    a11 = F.col("a11").cast("double") + lam
    a22 = F.col("a22").cast("double") + lam
    a12 = F.col("a12").cast("double")
    det = a11 * a22 - a12 * a12
    # b is in milli·rating units; u comes out in rating/milli-factor
    # units — scale by 1000 to factor units
    u1 = (F.col("b1").cast("double") * a22
          - F.col("b2").cast("double") * a12) / det * 1000.0
    u2 = (F.col("b2").cast("double") * a11
          - F.col("b1").cast("double") * a12) / det * 1000.0
    return (sums.select(
        "o_custkey", "n_items",
        F.floor(u1 * 1000000.0).cast("long").alias("u1_micro"),
        F.floor(u2 * 1000000.0).cast("long").alias("u2_micro"),
        F.col("rr").alias("r_moment"))
        .orderBy(F.desc("n_items"), "o_custkey")
        .limit(_TOPN))


ALS_SQL = f"""
WITH ratings AS (
  SELECT o_custkey, l_partkey, CAST(sum(CAST(l_quantity AS BIGINT))
                                    AS BIGINT) AS r,
         CAST(('0x' || substring(md5('f1:' || CAST(l_partkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 2001 - 1000 AS f1,
         CAST(('0x' || substring(md5('f2:' || CAST(l_partkey AS VARCHAR)),
                                 1, 8)) AS BIGINT) % 2001 - 1000 AS f2
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey, l_partkey
),
sums AS (
  SELECT o_custkey, count(*) AS n_items,
         CAST(sum(f1 * f1) AS BIGINT) AS a11,
         CAST(sum(f1 * f2) AS BIGINT) AS a12,
         CAST(sum(f2 * f2) AS BIGINT) AS a22,
         CAST(sum(f1 * r) AS BIGINT) AS b1,
         CAST(sum(f2 * r) AS BIGINT) AS b2,
         CAST(sum(r * r) AS BIGINT) AS rr
  FROM ratings GROUP BY o_custkey
),
solved AS (
  SELECT o_custkey, n_items, rr,
         (CAST(b1 AS DOUBLE) * (CAST(a22 AS DOUBLE) + {_LAMBDA})
          - CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE))
         / ((CAST(a11 AS DOUBLE) + {_LAMBDA})
            * (CAST(a22 AS DOUBLE) + {_LAMBDA})
            - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) * 1000.0 AS u1,
         (CAST(b2 AS DOUBLE) * (CAST(a11 AS DOUBLE) + {_LAMBDA})
          - CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE))
         / ((CAST(a11 AS DOUBLE) + {_LAMBDA})
            * (CAST(a22 AS DOUBLE) + {_LAMBDA})
            - CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)) * 1000.0 AS u2
  FROM sums
)
SELECT o_custkey, n_items,
       CAST(floor(u1 * 1000000.0) AS BIGINT) AS u1_micro,
       CAST(floor(u2 * 1000000.0) AS BIGINT) AS u2_micro,
       rr AS r_moment
FROM solved
ORDER BY n_items DESC, o_custkey
LIMIT {_TOPN}
"""


QUERIES = {
    "recsys_als_user_step": (recsys_als_user_step, ALS_SQL),
}
