"""Model-evaluation batch 2: DeLong's nonparametric AUC confidence
interval — the number a model report should carry next to the point
AUC (plans/stats.ml_auc_roc), and the basis of the DeLong AUC
comparison test.

DeLong 1988's structural components collapse onto the same quantized
score grid the AUC rank identity uses: every positive at score s
shares V10 = (neg_below(s) + ties(s)/2)/n0 and every negative shares
V01 = (pos_above(s) + ties(s)/2)/n1, so the two component variances
are exact grid moments — integer (2·count) numerators, one double
expression, no per-row placement values ever materializing.
Var(AUC) = S10/n1 + S01/n0; the 95% CI uses the 1.959964 normal
quantile as a shared literal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_DEC = "decimal(19,0)"
_Z95 = "1.959964"


def ml_auc_delong_ci(spark: SparkSession, sf: str) -> DataFrame:
    """DeLong variance + 95% CI for the ml_auc_roc scorer (embedding
    dim 0 vs label=1).  One grid pass: per distinct quantized score,
    cumulative negative-below / positive-above counts give the doubled
    placement integers x10 = 2·nb + tn and x01 = 2·pa + tp; component
    moments are Σc·x and Σc·x² (exact), variances one double
    expression."""
    emb = t(spark, sf, "embeddings")
    base = emb.select(
        (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    per_v = (base.groupBy("v")
             .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("c_p"),
                  F.count(F.lit(1)).alias("cnt")))
    w_lo = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w_hi = Window.orderBy("v").rowsBetween(1, Window.unboundedFollowing)
    terms = per_v.select(
        "v", "c_p", (F.col("cnt") - F.col("c_p")).alias("c_n"),
        F.coalesce(F.sum(F.col("cnt") - F.col("c_p")).over(w_lo),
                   F.lit(0)).alias("neg_below"),
        F.coalesce(F.sum("c_p").over(w_hi), F.lit(0)).alias("pos_above"))
    x10 = (F.lit(2).cast(_DEC) * F.col("neg_below").cast(_DEC)
           + F.col("c_n").cast(_DEC))
    x01 = (F.lit(2).cast(_DEC) * F.col("pos_above").cast(_DEC)
           + F.col("c_p").cast(_DEC))
    agg = terms.agg(
        F.sum("c_p").alias("n1"), F.sum("c_n").alias("n0"),
        F.sum(F.col("c_p").cast(_DEC) * x10).alias("s10_1"),
        F.sum(F.col("c_p").cast(_DEC) * x10 * x10).alias("s10_2"),
        F.sum(F.col("c_n").cast(_DEC) * x01).alias("s01_1"),
        F.sum(F.col("c_n").cast(_DEC) * x01 * x01).alias("s01_2"))
    n1 = F.col("n1").cast("double")
    n0 = F.col("n0").cast("double")

    def comp_var(s1, s2, n_own, n_other):
        # x is the DOUBLED placement count; V = x / (2 n_other)
        m1 = F.col(s1).cast("double") / n_own
        m2 = F.col(s2).cast("double") / n_own
        var_x = (m2 - m1 * m1) * n_own / (n_own - 1.0)
        return var_x / (4.0 * n_other * n_other)

    s10 = comp_var("s10_1", "s10_2", n1, n0)
    s01 = comp_var("s01_1", "s01_2", n0, n1)
    auc = F.col("s10_1").cast("double") / n1 / (2.0 * n0)
    var_auc = s10 / n1 + s01 / n0
    half = F.expr(_Z95) * F.sqrt(var_auc)
    return agg.select(
        F.col("n1").alias("n_pos"), F.col("n0").alias("n_neg"),
        F.floor(auc * 1000000.0).cast("long").alias("auc_micro"),
        F.floor(var_auc * 1e9).cast("long").alias("var_nano"),
        F.floor((auc - half) * 1000000.0).cast("long")
        .alias("ci_lo_micro"),
        F.floor((auc + half) * 1000000.0).cast("long")
        .alias("ci_hi_micro"))


DELONG_SQL = f"""
WITH base AS (
  SELECT label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
per_v AS (
  SELECT v, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_p,
         count(*) - sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_n
  FROM base GROUP BY v
),
terms AS (
  SELECT v, c_p, c_n,
         coalesce(sum(c_n) OVER (ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) AS neg_below,
         coalesce(sum(c_p) OVER (ORDER BY v
                                 ROWS BETWEEN 1 FOLLOWING
                                 AND UNBOUNDED FOLLOWING), 0)
           AS pos_above
  FROM per_v
),
agg AS (
  SELECT CAST(sum(c_p) AS BIGINT) AS n1, CAST(sum(c_n) AS BIGINT) AS n0,
         sum(CAST(c_p AS HUGEINT) * (2 * neg_below + c_n)) AS s10_1,
         sum(CAST(c_p AS HUGEINT) * (2 * neg_below + c_n)
             * (2 * neg_below + c_n)) AS s10_2,
         sum(CAST(c_n AS HUGEINT) * (2 * pos_above + c_p)) AS s01_1,
         sum(CAST(c_n AS HUGEINT) * (2 * pos_above + c_p)
             * (2 * pos_above + c_p)) AS s01_2
  FROM terms
),
calc AS (
  SELECT n1, n0,
         CAST(s10_1 AS DOUBLE) / CAST(n1 AS DOUBLE) / (2.0 * n0)
           AS auc,
         ((CAST(s10_2 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - (CAST(s10_1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             * (CAST(s10_1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
          * CAST(n1 AS DOUBLE) / (CAST(n1 AS DOUBLE) - 1.0))
         / (4.0 * CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE))
         / CAST(n1 AS DOUBLE)
         + ((CAST(s01_2 AS DOUBLE) / CAST(n0 AS DOUBLE)
             - (CAST(s01_1 AS DOUBLE) / CAST(n0 AS DOUBLE))
               * (CAST(s01_1 AS DOUBLE) / CAST(n0 AS DOUBLE)))
            * CAST(n0 AS DOUBLE) / (CAST(n0 AS DOUBLE) - 1.0))
           / (4.0 * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
           / CAST(n0 AS DOUBLE) AS var_auc
  FROM agg
)
SELECT n1 AS n_pos, n0 AS n_neg,
       CAST(floor(auc * 1000000.0) AS BIGINT) AS auc_micro,
       CAST(floor(var_auc * 1e9) AS BIGINT) AS var_nano,
       CAST(floor((auc - {_Z95} * sqrt(var_auc)) * 1000000.0) AS BIGINT)
         AS ci_lo_micro,
       CAST(floor((auc + {_Z95} * sqrt(var_auc)) * 1000000.0) AS BIGINT)
         AS ci_hi_micro
FROM calc
"""


QUERIES = {
    "ml_auc_delong_ci": (ml_auc_delong_ci, DELONG_SQL),
}
