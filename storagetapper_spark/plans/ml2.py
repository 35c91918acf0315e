"""In-engine ML batch 3 — feature engineering and regularized
regression: closed-form ridge on standardized features (the
regularized sibling of plans/ml.ml_linreg_normal), leave-one-out
target encoding with prior smoothing, and weight-of-evidence /
information-value scoring — the three workhorse tabular-feature ops a
training-data pipeline runs before any model sees the data.

Exactness discipline (plans/stats.py): the corpus reduces to exact
BIGINT sufficient statistics in ONE map-side-combined aggregate per
query; every coefficient/encoding is a single double expression over
those integers, written with byte-identical literals in both engines
and micro-floored at the output.

Scale shapes (100 TB):
- Ridge ships the same nine BIGINT sums as OLS (32 partial rows cross
  the network), then solves in closed form — no iteration, no driver
  matrix.
- Target encoding and WoE/IV are one groupBy over the (small,
  dimension-bounded) category key; the LOO identity means encoded
  values depend only on (category, label), so the output is the
  category×label table — per-row encodings join back via broadcast
  when a pipeline materializes them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_DEC = "decimal(19,0)"

# ------------------------------------------------------ ridge --------

_ALPHA = "0.1"  # ridge penalty on the standardized (correlation) scale

# the closed-form standardized-ridge solve, shared VERBATIM between the
# Spark selectExpr and the oracle SQL (identical IEEE ops on identical
# exact-integer inputs).  Correlation-form normal equations with the
# penalty on slopes only:
#   (1+a)·a1 + r12·a2 = r1y ;  r12·a1 + (1+a)·a2 = r2y
_RIDGE_EXPRS = [
    "CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1 AS c11",
    "CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2 AS c22",
    "CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS cyy",
    "CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2 AS c12",
    "CAST(n AS DOUBLE) * s1y - CAST(s1 AS DOUBLE) * sy AS c1y",
    "CAST(n AS DOUBLE) * s2y - CAST(s2 AS DOUBLE) * sy AS c2y",
]
_RIDGE_SOLVE = [
    "c12 / sqrt(c11 * c22) AS r12",
    "c1y / sqrt(c11 * cyy) AS r1y",
    "c2y / sqrt(c22 * cyy) AS r2y",
]
_RIDGE_OUT = [
    f"((1.0 + {_ALPHA}) * r1y - r12 * r2y)"
    f" / ((1.0 + {_ALPHA}) * (1.0 + {_ALPHA}) - r12 * r12) AS a1",
    f"((1.0 + {_ALPHA}) * r2y - r12 * r1y)"
    f" / ((1.0 + {_ALPHA}) * (1.0 + {_ALPHA}) - r12 * r12) AS a2",
]
_RIDGE_FINAL = [
    "n",
    "CAST(floor(a1 * sqrt(cyy / c11) * 1000000.0) AS BIGINT) AS b1_micro",
    "CAST(floor(a2 * sqrt(cyy / c22) * 1000000.0) AS BIGINT) AS b2_micro",
    "CAST(floor((CAST(sy AS DOUBLE) / n"
    "            - a1 * sqrt(cyy / c11) * (CAST(s1 AS DOUBLE) / n)"
    "            - a2 * sqrt(cyy / c22) * (CAST(s2 AS DOUBLE) / n))"
    "           * 1000.0) AS BIGINT) AS intercept_milli",
    "CAST(floor(a1 * 1000000.0) AS BIGINT) AS a1_std_micro",
    "CAST(floor(a2 * 1000000.0) AS BIGINT) AS a2_std_micro",
]


def ml_ridge_normal(spark: SparkSession, sf: str) -> DataFrame:
    """Closed-form ridge regression (L2, penalty on slopes only) of
    price_dollars ~ quantity + discount_bps — the regularized sibling
    of ml_linreg_normal, solved on the STANDARDIZED scale (the only
    scale on which one λ means the same thing for both features) and
    mapped back to raw units.

    Same nine exact BIGINT sufficient statistics, same one-aggregate
    shuffle shape; the standardize → solve → unstandardize chain is a
    single double expression shared verbatim with the oracle.  With
    α = 0.1 the standardized slopes shrink strictly toward zero vs the
    OLS solution (tested)."""
    li = t(spark, sf, "lineitem").select(
        F.floor(F.col("l_quantity")).cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long")
        .alias("x2"),
        F.floor(F.col("l_extendedprice") + F.lit(0.5)).cast("long")
        .alias("y"))
    sums = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    return (sums.selectExpr("n", "s1", "s2", "sy", *_RIDGE_EXPRS)
            .selectExpr("n", "s1", "s2", "sy", "c11", "c22", "cyy",
                        *_RIDGE_SOLVE)
            .selectExpr("n", "s1", "s2", "sy", "c11", "c22", "cyy",
                        *_RIDGE_OUT)
            .selectExpr(*_RIDGE_FINAL))


RIDGE_SQL = f"""
WITH base AS (
  SELECT CAST(floor(l_quantity) AS BIGINT) AS x1,
         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS x2,
         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
  FROM lineitem
),
sums AS (
  SELECT count(*) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM base
),
cen AS (SELECT n, s1, s2, sy, {', '.join(_RIDGE_EXPRS)} FROM sums),
cor AS (SELECT n, s1, s2, sy, c11, c22, cyy, {', '.join(_RIDGE_SOLVE)}
        FROM cen),
sol AS (SELECT n, s1, s2, sy, c11, c22, cyy, {', '.join(_RIDGE_OUT)}
        FROM cor)
SELECT {', '.join(_RIDGE_FINAL)} FROM sol
"""


# -------------------------------------------- LOO target encoding ----

_TE_M = "100.0"  # smoothing pseudo-count toward the global prior


def ml_target_encoding_loo(spark: SparkSession, sf: str) -> DataFrame:
    """Leave-one-out target encoding of p_brand against the return
    label (l_returnflag = 'R'), smoothed toward the global prior with
    m = 100 pseudo-counts:  enc(row) = (s_g − y_i + m·prior)
    / (n_g − 1 + m).  LOO + smoothing is the leakage-safe form
    (Micci-Barreca 2001); plain mean encoding memorizes single-row
    categories.

    The LOO identity makes the encoding a function of (category,
    label) ONLY, so the registered output is the exact category×label
    encoding table (|brands|×2 rows) — a pipeline materializes per-row
    encodings by broadcast-joining this table back, shipping no
    per-row state.  Counts are exact integers; the encoding is one
    double expression, micro-floored."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select("p_partkey", "p_brand")
    base = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .select("p_brand",
                    (F.col("l_returnflag") == "R").cast("long").alias("y")))
    tot = base.agg(F.count(F.lit(1)).alias("n_all"),
                   F.sum("y").alias("s_all"))
    per_g = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("y").alias("s_g"))
    lab = per_g.select(
        "p_brand", "n_g", "s_g",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("y"))
    prior = F.col("s_all").cast("double") / F.col("n_all").cast("double")
    enc = ((F.col("s_g") - F.col("y")).cast("double")
           + F.expr(_TE_M) * prior) \
        / ((F.col("n_g") - 1).cast("double") + F.expr(_TE_M))
    return (lab.crossJoin(F.broadcast(tot))
            .filter(F.col("s_g") >= F.col("y"))  # label must occur
            .select("p_brand", "y", "n_g", "s_g",
                    F.floor(enc * 1000000.0).cast("long")
                    .alias("enc_micro"))
            .orderBy("p_brand", "y"))


TE_SQL = f"""
WITH base AS (
  SELECT p_brand, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
tot AS (SELECT count(*) AS n_all, CAST(sum(y) AS BIGINT) AS s_all
        FROM base),
per_g AS (SELECT p_brand, count(*) AS n_g, CAST(sum(y) AS BIGINT) AS s_g
          FROM base GROUP BY p_brand),
lab AS (
  SELECT p_brand, n_g, s_g, yy.y
  FROM per_g CROSS JOIN (SELECT 0 AS y UNION ALL SELECT 1) yy
)
SELECT p_brand, CAST(y AS BIGINT) AS y, CAST(n_g AS BIGINT) AS n_g, s_g,
       CAST(floor((CAST(s_g - y AS DOUBLE)
                   + {_TE_M} * (CAST(s_all AS DOUBLE)
                                / CAST(n_all AS DOUBLE)))
                  / (CAST(n_g - 1 AS DOUBLE) + {_TE_M})
                  * 1000000.0) AS BIGINT) AS enc_micro
FROM lab, tot
WHERE s_g >= y
ORDER BY p_brand, y
"""


# ------------------------------------------------------ WoE / IV -----


def ml_woe_iv(spark: SparkSession, sf: str) -> DataFrame:
    """Weight-of-evidence and information value of p_brand for the
    return label: WoE_c = ln((e_c/E)/(ne_c/NE)) with the standard
    0.5-count smoothing, IV contribution (e_c/E − ne_c/NE)·WoE_c —
    the credit-scoring feature screen (Siddiqi 2006).  One category
    groupBy; events/non-events are exact integers; ln runs over
    exact-integer-derived doubles (the BM25 precedent) and the output
    is micro-floored.  Consumers sum iv_contrib_micro for the
    feature's IV."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select("p_partkey", "p_brand")
    base = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .select("p_brand",
                    (F.col("l_returnflag") == "R").cast("long").alias("y")))
    per_g = base.groupBy("p_brand").agg(
        F.sum("y").alias("e"),
        (F.count(F.lit(1)) - F.sum("y")).alias("ne"))
    tot = per_g.agg(F.sum("e").alias("e_all"), F.sum("ne").alias("ne_all"))
    ed = (F.col("e").cast("double") + 0.5) \
        / (F.col("e_all").cast("double") + 0.5)
    ned = (F.col("ne").cast("double") + 0.5) \
        / (F.col("ne_all").cast("double") + 0.5)
    woe = F.log(ed / ned)
    return (per_g.crossJoin(F.broadcast(tot))
            .select("p_brand", "e", "ne",
                    F.floor(woe * 1000000.0).cast("long").alias("woe_micro"),
                    F.floor((ed - ned) * woe * 1e9).cast("long")
                    .alias("iv_contrib_nano"))
            .orderBy("p_brand"))


WOE_SQL = """
WITH base AS (
  SELECT p_brand, CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
per_g AS (
  SELECT p_brand, CAST(sum(y) AS BIGINT) AS e,
         CAST(count(*) - sum(y) AS BIGINT) AS ne
  FROM base GROUP BY p_brand
),
tot AS (SELECT CAST(sum(e) AS BIGINT) AS e_all,
               CAST(sum(ne) AS BIGINT) AS ne_all
        FROM per_g)
SELECT p_brand, e, ne,
       CAST(floor(ln(((CAST(e AS DOUBLE) + 0.5)
                      / (CAST(e_all AS DOUBLE) + 0.5))
                     / ((CAST(ne AS DOUBLE) + 0.5)
                        / (CAST(ne_all AS DOUBLE) + 0.5)))
                  * 1000000.0) AS BIGINT) AS woe_micro,
       CAST(floor(((CAST(e AS DOUBLE) + 0.5)
                   / (CAST(e_all AS DOUBLE) + 0.5)
                   - (CAST(ne AS DOUBLE) + 0.5)
                     / (CAST(ne_all AS DOUBLE) + 0.5))
                  * ln(((CAST(e AS DOUBLE) + 0.5)
                        / (CAST(e_all AS DOUBLE) + 0.5))
                       / ((CAST(ne AS DOUBLE) + 0.5)
                          / (CAST(ne_all AS DOUBLE) + 0.5)))
                  * 1e9) AS BIGINT) AS iv_contrib_nano
FROM per_g, tot
ORDER BY p_brand
"""


QUERIES = {
    "ml_ridge_normal": (ml_ridge_normal, RIDGE_SQL),
    "ml_target_encoding_loo": (ml_target_encoding_loo, TE_SQL),
    "ml_woe_iv": (ml_woe_iv, WOE_SQL),
}


# ------------------------------------------- MI feature screen -------


def ml_mutual_info_screen(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual-information feature screen: I(X;Y) in nats for three
    quantized lineitem features against the return label — the
    model-free relevance ranking next to ml_woe_iv (WoE/IV assumes a
    monotone direction; MI does not).  I(X;Y) = Σ_xy p(x,y)
    ln(n·n_xy/(n_x·n_y)), assembled from exact integer count grids
    (levels are data-type-bounded: 50 quantities, 11 discount bps
    steps, 12 ship months); the ln runs over exact-integer ratios
    (BM25 precedent) and each cell's term is nano-floored BEFORE the
    per-feature sum, so the reduction is order-independent integer
    addition in both engines.  Normalized by H(Y) (same construction)
    into a 0..1 relevance score."""
    li = t(spark, sf, "lineitem")
    base = li.select(
        (F.col("l_returnflag") == "R").cast("long").alias("y"),
        F.floor(F.col("l_quantity")).cast("long").alias("f_quantity"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
        .alias("f_discount_pct"),
        F.month("l_shipdate").cast("long").alias("f_ship_month"))
    feats = base.selectExpr(
        "y", "stack(3, 'f_quantity', f_quantity, "
        "'f_discount_pct', f_discount_pct, "
        "'f_ship_month', f_ship_month) as (feature, x)")
    cells = feats.groupBy("feature", "x", "y").agg(
        F.count(F.lit(1)).alias("n_xy"))
    margx = cells.groupBy("feature", "x").agg(F.sum("n_xy").alias("n_x"))
    margy = cells.groupBy("feature", "y").agg(F.sum("n_xy").alias("n_y"))
    tot = cells.groupBy("feature").agg(F.sum("n_xy").alias("n"))
    j = (cells.join(margx, ["feature", "x"])
         .join(F.broadcast(margy), ["feature", "y"])
         .join(F.broadcast(tot), ["feature"]))
    term = (F.col("n_xy").cast("double") / F.col("n").cast("double")
            * F.log(F.col("n").cast("double")
                    * F.col("n_xy").cast("double")
                    / (F.col("n_x").cast("double")
                       * F.col("n_y").cast("double"))))
    mi = (j.select("feature", F.floor(term * 1e9).cast("long").alias("t"),
                   "x")
          .groupBy("feature")
          .agg(F.sum("t").alias("mi_nano"),
               F.countDistinct("x").alias("n_levels")))
    hy_term = (F.col("n_y").cast("double") / F.col("n").cast("double")
               * F.log(F.col("n_y").cast("double")
                       / F.col("n").cast("double")))
    hy = (margy.join(F.broadcast(tot), "feature")
          .select("feature",
                  F.floor(-hy_term * 1e9).cast("long").alias("ht"))
          .groupBy("feature").agg(F.sum("ht").alias("hy_nano")))
    return (mi.join(hy, "feature")
            .select("feature", "n_levels", "mi_nano", "hy_nano",
                    F.floor(F.col("mi_nano").cast("double")
                            / F.col("hy_nano").cast("double") * 1000000.0)
                    .cast("long").alias("relevance_micro"))
            .orderBy("feature"))


MI_SQL = """
WITH base AS (
  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         CAST(floor(l_quantity) AS BIGINT) AS f_quantity,
         CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS f_discount_pct,
         CAST(month(l_shipdate) AS BIGINT) AS f_ship_month
  FROM lineitem
),
feats AS (
  SELECT y, 'f_quantity' AS feature, f_quantity AS x FROM base
  UNION ALL
  SELECT y, 'f_discount_pct', f_discount_pct FROM base
  UNION ALL
  SELECT y, 'f_ship_month', f_ship_month FROM base
),
cells AS (
  SELECT feature, x, y, count(*) AS n_xy FROM feats GROUP BY 1, 2, 3
),
margx AS (SELECT feature, x, CAST(sum(n_xy) AS BIGINT) AS n_x
          FROM cells GROUP BY 1, 2),
margy AS (SELECT feature, y, CAST(sum(n_xy) AS BIGINT) AS n_y
          FROM cells GROUP BY 1, 2),
tot AS (SELECT feature, CAST(sum(n_xy) AS BIGINT) AS n
        FROM cells GROUP BY 1),
mi AS (
  SELECT c.feature,
         CAST(sum(CAST(floor(CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE)
                    * ln(CAST(n AS DOUBLE) * CAST(n_xy AS DOUBLE)
                         / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))
                    * 1e9) AS BIGINT)) AS BIGINT) AS mi_nano,
         count(DISTINCT c.x) AS n_levels
  FROM cells c
  JOIN margx USING (feature, x)
  JOIN margy USING (feature, y)
  JOIN tot USING (feature)
  GROUP BY c.feature
),
hy AS (
  SELECT feature,
         CAST(sum(CAST(floor(-(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE)
                    * ln(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE)))
                    * 1e9) AS BIGINT)) AS BIGINT) AS hy_nano
  FROM margy JOIN tot USING (feature)
  GROUP BY feature
)
SELECT feature, n_levels, mi_nano, hy_nano,
       CAST(floor(CAST(mi_nano AS DOUBLE) / CAST(hy_nano AS DOUBLE)
                  * 1000000.0) AS BIGINT) AS relevance_micro
FROM mi JOIN hy USING (feature)
ORDER BY feature
"""


QUERIES["ml_mutual_info_screen"] = (ml_mutual_info_screen, MI_SQL)
