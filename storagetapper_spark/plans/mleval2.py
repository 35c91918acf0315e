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


_N_BINS = 10  # same reliability bins as ml_calibration_ece


def ml_brier_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the calibration
    scorer (min-max-normalized embedding dim 0, the ml_calibration_ece
    setup): BS = REL − RES + UNC + WBV, where reliability penalizes
    miscalibration, resolution rewards separating the classes,
    uncertainty is the irreducible ȳ(1−ȳ), WBV is the within-bin
    forecast variance, and COV the within-bin forecast-outcome
    covariance — the two terms the textbook 3-term decomposition
    silently drops for continuous forecasts (Stephenson et al. 2008);
    with them the identity BS = REL − RES + UNC + WBV − 2·COV is
    EXACT and tested.

    Everything reduces to per-bin exact integers: n_b, Σy_b, Σp_b,
    Σp_b² with p in micro-units, so the row-level Brier sum is an
    exact DECIMAL of (p − 1e6·y)² — no order-dependent double
    reduction anywhere; each component is one double over the 10-row
    bin table, nano-floored."""
    emb = t(spark, sf, "embeddings")
    base = emb.select(
        (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    mm = base.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    j = base.crossJoin(F.broadcast(mm))
    norm = ((F.col("v") - F.col("mn")).cast("double")
            / (F.col("mx") - F.col("mn")).cast("double"))
    binc = F.least(F.lit(_N_BINS - 1),
                   F.floor(norm * _N_BINS).cast("int"))
    nq = F.floor(norm * 1000000.0).cast("long")
    y6 = F.when(F.col("pos"), 1000000).otherwise(0).cast("long")
    rows = j.select(binc.alias("bin"), nq.alias("p"), y6.alias("y6"),
                    F.when(F.col("pos"), 1).otherwise(0).alias("y"))
    d = (F.col("p") - F.col("y6")).cast(_DEC)
    bins = rows.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum("p").alias("sp"),
        F.sum(F.col("p").cast(_DEC) * F.col("p").cast(_DEC)).alias("spp"),
        F.sum(F.col("p") * F.col("y")).alias("spy"),
        F.sum(d * d).alias("sd2"))
    tot = bins.agg(F.sum("n").alias("nn"), F.sum("sy").alias("sy_all"))
    bj = bins.crossJoin(F.broadcast(tot))
    nb = F.col("n").cast("double")
    nn = F.col("nn").cast("double")
    pbar = F.col("sp").cast("double") / nb / 1000000.0
    ybar_b = F.col("sy").cast("double") / nb
    ybar = F.col("sy_all").cast("double") / nn
    rel_t = nb * (pbar - ybar_b) * (pbar - ybar_b) / nn
    res_t = nb * (ybar_b - ybar) * (ybar_b - ybar) / nn
    wbv_t = ((F.col("spp").cast("double") / 1e12
              - F.col("sp").cast("double") * F.col("sp").cast("double")
              / nb / 1e12) / nn)
    # within-bin cov: (Σpy − p̄·Σy)/1e6 per bin, over N
    cov_t = ((F.col("spy").cast("double")
              - F.col("sp").cast("double") / nb
              * F.col("sy").cast("double")) / 1e6 / nn)
    bs_t = F.col("sd2").cast("double") / 1e12 / nn
    agg = bj.select(
        F.floor(rel_t * 1e9).cast("long").alias("rel_n"),
        F.floor(res_t * 1e9).cast("long").alias("res_n"),
        F.floor(wbv_t * 1e9).cast("long").alias("wbv_n"),
        F.floor(cov_t * 1e9).cast("long").alias("cov_n"),
        F.floor(bs_t * 1e9).cast("long").alias("bs_n"),
        (ybar * (1.0 - ybar)).alias("unc"), F.col("nn")).groupBy(
        "nn", "unc").agg(
        F.sum("rel_n").alias("reliability_nano"),
        F.sum("res_n").alias("resolution_nano"),
        F.sum("wbv_n").alias("within_bin_var_nano"),
        F.sum("cov_n").alias("within_bin_cov_nano"),
        F.sum("bs_n").alias("brier_nano"))
    return agg.select(
        F.col("nn").alias("n"),
        "brier_nano", "reliability_nano", "resolution_nano",
        "within_bin_var_nano", "within_bin_cov_nano",
        F.floor(F.col("unc") * 1e9).cast("long").alias("uncertainty_nano"))


BRIER_SQL = f"""
WITH base AS (
  SELECT label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
mm AS (SELECT min(v) AS mn, max(v) AS mx FROM base),
rows_ AS (
  SELECT least({_N_BINS - 1},
               CAST(floor(CAST(v - mn AS DOUBLE)
                          / CAST(mx - mn AS DOUBLE) * {_N_BINS})
                    AS INTEGER)) AS bin,
         CAST(floor(CAST(v - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS p,
         CASE WHEN pos THEN 1000000 ELSE 0 END AS y6,
         CASE WHEN pos THEN 1 ELSE 0 END AS y
  FROM base, mm
),
bins AS (
  SELECT bin, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(p) AS BIGINT) AS sp,
         sum(CAST(p AS HUGEINT) * p) AS spp,
         CAST(sum(p * y) AS BIGINT) AS spy,
         sum(CAST(p - y6 AS HUGEINT) * (p - y6)) AS sd2
  FROM rows_ GROUP BY bin
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
               CAST(sum(sy) AS BIGINT) AS sy_all FROM bins),
terms AS (
  SELECT CAST(floor(CAST(n AS DOUBLE)
                    * (CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                       - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0
                       - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                    / CAST(nn AS DOUBLE) * 1e9) AS BIGINT) AS rel_n,
         CAST(floor(CAST(n AS DOUBLE)
                    * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       - CAST(sy_all AS DOUBLE) / CAST(nn AS DOUBLE))
                    * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       - CAST(sy_all AS DOUBLE) / CAST(nn AS DOUBLE))
                    / CAST(nn AS DOUBLE) * 1e9) AS BIGINT) AS res_n,
         CAST(floor((CAST(spp AS DOUBLE) / 1e12
                     - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
                       / CAST(n AS DOUBLE) / 1e12)
                    / CAST(nn AS DOUBLE) * 1e9) AS BIGINT) AS wbv_n,
         CAST(floor((CAST(spy AS DOUBLE)
                     - CAST(sp AS DOUBLE) / CAST(n AS DOUBLE)
                       * CAST(sy AS DOUBLE)) / 1e6
                    / CAST(nn AS DOUBLE) * 1e9) AS BIGINT) AS cov_n,
         CAST(floor(CAST(sd2 AS DOUBLE) / 1e12 / CAST(nn AS DOUBLE)
                    * 1e9) AS BIGINT) AS bs_n,
         (CAST(sy_all AS DOUBLE) / CAST(nn AS DOUBLE))
           * (1.0 - CAST(sy_all AS DOUBLE) / CAST(nn AS DOUBLE)) AS unc,
         nn
  FROM bins, tot
)
SELECT nn AS n,
       CAST(sum(bs_n) AS BIGINT) AS brier_nano,
       CAST(sum(rel_n) AS BIGINT) AS reliability_nano,
       CAST(sum(res_n) AS BIGINT) AS resolution_nano,
       CAST(sum(wbv_n) AS BIGINT) AS within_bin_var_nano,
       CAST(sum(cov_n) AS BIGINT) AS within_bin_cov_nano,
       CAST(floor(unc * 1e9) AS BIGINT) AS uncertainty_nano
FROM terms
GROUP BY nn, unc
"""


QUERIES["ml_brier_decomposition"] = (ml_brier_decomposition, BRIER_SQL)


def kappa_raters(df: DataFrame) -> DataFrame:
    """The two literal 3-class labeling rules behind ml_cohen_kappa
    (shared with streaming/agreement.py so the streamed confusion fold
    inherits this query's oracle bit-exactly): rater A = price terciles
    (<170k / <340k / rest), rater B = priority urgency classes."""
    a = (F.when(F.col("o_totalprice") < 170000.0, "low")
         .when(F.col("o_totalprice") < 340000.0, "mid").otherwise("high"))
    b = (F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
         .when(F.col("o_orderpriority") == "3-MEDIUM", "mid")
         .otherwise("low"))
    return df.select(a.alias("ra"), b.alias("rb"))


def kappa_from_cells(cells: DataFrame) -> DataFrame:
    """Cohen's kappa summary row from a (ra, rb, c) confusion-cell
    table — the one double expression both the registered batch query
    and the streaming fold serve through."""
    s = cells.agg(
        F.sum("c").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("c"))
              .otherwise(0)).alias("agree"),
        *[F.sum(F.when(F.col("ra") == k, F.col("c")).otherwise(0))
          .alias(f"a_{k}") for k in ("low", "mid", "high")],
        *[F.sum(F.when(F.col("rb") == k, F.col("c")).otherwise(0))
          .alias(f"b_{k}") for k in ("low", "mid", "high")])
    d = "double"
    n = F.col("n").cast(d)
    po = F.col("agree").cast(d) / n
    pe = (F.col("a_low").cast(d) * F.col("b_low").cast(d)
          + F.col("a_mid").cast(d) * F.col("b_mid").cast(d)
          + F.col("a_high").cast(d) * F.col("b_high").cast(d)) / (n * n)
    kappa = (po - pe) / F.nullif(F.lit(1.0) - pe, F.lit(0.0))
    return s.select(
        "n", "agree",
        F.floor(po * 1000000.0).cast("long").alias("po_micro"),
        F.floor(pe * 1000000.0).cast("long").alias("pe_micro"),
        F.floor(kappa * 1000.0).cast("long").alias("kappa_milli"))


def ml_cohen_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's kappa between two independent 3-class labeling rules on
    orders (kappa_raters) — the chance-corrected agreement every
    labeling pipeline reports before trusting a cheap heuristic as a
    silver label.  kappa = (po - pe) / (1 - pe) with po the diagonal
    mass and pe the product of the marginals, all from exact integer
    confusion counts (kappa_from_cells, shared with the streaming
    agreement monitor).

    Scale: one groupBy over the 3x3 class grid (9 cells, map-side
    combined), then a 9-row reduce — nothing wider than the class
    domain ever shuffles."""
    cells = (kappa_raters(t(spark, sf, "orders"))
             .groupBy("ra", "rb").agg(F.count(F.lit(1)).alias("c")))
    return kappa_from_cells(cells)


KAPPA_SQL = """
WITH lab AS (
  SELECT CASE WHEN o_totalprice < 170000.0 THEN 'low'
              WHEN o_totalprice < 340000.0 THEN 'mid'
              ELSE 'high' END AS ra,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
              WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
              ELSE 'low' END AS rb
  FROM orders
),
cells AS (SELECT ra, rb, count(*) AS c FROM lab GROUP BY 1, 2),
s AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CASE WHEN ra = rb THEN c ELSE 0 END) AS BIGINT) AS agree,
         CAST(sum(CASE WHEN ra = 'low' THEN c ELSE 0 END) AS BIGINT) AS a_low,
         CAST(sum(CASE WHEN ra = 'mid' THEN c ELSE 0 END) AS BIGINT) AS a_mid,
         CAST(sum(CASE WHEN ra = 'high' THEN c ELSE 0 END) AS BIGINT)
           AS a_high,
         CAST(sum(CASE WHEN rb = 'low' THEN c ELSE 0 END) AS BIGINT) AS b_low,
         CAST(sum(CASE WHEN rb = 'mid' THEN c ELSE 0 END) AS BIGINT) AS b_mid,
         CAST(sum(CASE WHEN rb = 'high' THEN c ELSE 0 END) AS BIGINT)
           AS b_high
  FROM cells
)
SELECT n, agree,
       CAST(floor(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0)
            AS BIGINT) AS po_micro,
       CAST(floor((CAST(a_low AS DOUBLE) * CAST(b_low AS DOUBLE)
                   + CAST(a_mid AS DOUBLE) * CAST(b_mid AS DOUBLE)
                   + CAST(a_high AS DOUBLE) * CAST(b_high AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) * 1000000.0)
            AS BIGINT) AS pe_micro,
       CAST(floor(
         (CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
          - (CAST(a_low AS DOUBLE) * CAST(b_low AS DOUBLE)
             + CAST(a_mid AS DOUBLE) * CAST(b_mid AS DOUBLE)
             + CAST(a_high AS DOUBLE) * CAST(b_high AS DOUBLE))
            / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
         / nullif(1.0 - (CAST(a_low AS DOUBLE) * CAST(b_low AS DOUBLE)
                         + CAST(a_mid AS DOUBLE) * CAST(b_mid AS DOUBLE)
                         + CAST(a_high AS DOUBLE) * CAST(b_high AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 0.0)
         * 1000.0) AS BIGINT) AS kappa_milli
FROM s
"""


QUERIES["ml_cohen_kappa"] = (ml_cohen_kappa, KAPPA_SQL)


def ml_group_auc(spark: SparkSession, sf: str) -> DataFrame:
    """Per-cohort ROC-AUC fairness audit: the dim-0 scorer's AUC
    (ml_auc_roc's midrank identity) computed separately for four
    deterministic id-slices of the embedding corpus, with the overall
    AUC and each cohort's gap against it — the disaggregated
    evaluation that catches a scorer working for the average while
    failing a slice.

    Scale: score-grid windows PARTITIONED by cohort (never global);
    the overall row is a 1-row broadcast join; everything integer
    until the final divisions."""
    emb = t(spark, sf, "embeddings")
    base = emb.select(
        (F.col("vec_id") % 4).alias("cohort"),
        (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    per_v = (base.groupBy("cohort", "v")
             .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("c_p"),
                  F.count(F.lit(1)).alias("cnt")))
    w = (Window.partitionBy("cohort").orderBy("v")
         .rowsBetween(Window.unboundedPreceding, 0))
    terms = per_v.select(
        "cohort", "c_p", "cnt",
        (F.sum("cnt").over(w) - F.col("cnt")).alias("before"))
    _D = "decimal(38,0)"
    agg = (terms.groupBy("cohort")
           .agg(F.sum("c_p").alias("n_pos"),
                (F.sum("cnt") - F.sum("c_p")).alias("n_neg"),
                F.sum(F.col("c_p").cast(_D)
                      * (F.lit(2).cast(_D) * F.col("before").cast(_D)
                         + F.col("cnt").cast(_D) + F.lit(1).cast(_D)))
                .alias("r2")))
    auc = ((F.col("r2") - F.col("n_pos").cast(_D)
            * (F.col("n_pos").cast(_D) + F.lit(1).cast(_D)))
           .cast("double") / 2.0
           / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double")))
    per_c = agg.select("cohort", "n_pos", "n_neg",
                       F.floor(auc * 1000000.0).cast("long")
                       .alias("auc_micro"))
    overall = (per_c.agg(
        F.floor(F.sum(F.col("auc_micro")
                      * (F.col("n_pos") + F.col("n_neg")))
                / F.sum(F.col("n_pos") + F.col("n_neg")))
        .cast("long").alias("weighted_mean_auc_micro")))
    return (per_c.crossJoin(F.broadcast(overall))
            .select("cohort", "n_pos", "n_neg", "auc_micro",
                    "weighted_mean_auc_micro",
                    (F.col("auc_micro")
                     - F.col("weighted_mean_auc_micro"))
                    .alias("gap_micro"))
            .orderBy("cohort"))


GROUP_AUC_SQL = """
WITH base AS (
  SELECT vec_id % 4 AS cohort, label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
per_v AS (
  SELECT cohort, v, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_p,
         count(*) AS cnt
  FROM base GROUP BY 1, 2
),
terms AS (
  SELECT cohort, c_p, cnt,
         sum(cnt) OVER (PARTITION BY cohort ORDER BY v
                        ROWS UNBOUNDED PRECEDING) - cnt AS before
  FROM per_v
),
agg AS (
  SELECT cohort, CAST(sum(c_p) AS BIGINT) AS n_pos,
         CAST(sum(cnt) - sum(c_p) AS BIGINT) AS n_neg,
         sum(CAST(c_p AS HUGEINT)
             * (2 * CAST(before AS HUGEINT) + cnt + 1)) AS r2
  FROM terms GROUP BY cohort
),
per_c AS (
  SELECT cohort, n_pos, n_neg,
         CAST(floor(CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)
                         AS DOUBLE) / 2.0
                    / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
                    * 1000000.0) AS BIGINT) AS auc_micro
  FROM agg
),
overall AS (
  SELECT CAST(floor(sum(auc_micro * (n_pos + n_neg))
                    / sum(n_pos + n_neg)) AS BIGINT)
           AS weighted_mean_auc_micro
  FROM per_c
)
SELECT cohort, n_pos, n_neg, auc_micro, weighted_mean_auc_micro,
       auc_micro - weighted_mean_auc_micro AS gap_micro
FROM per_c CROSS JOIN overall
ORDER BY cohort
"""


QUERIES["ml_group_auc"] = (ml_group_auc, GROUP_AUC_SQL)


_PINBALL_QS = [100, 500, 900]  # milli-quantiles
_PINBALL_SPLIT = "1999-01-01"


def ml_pinball_loss(spark: SparkSession, sf: str) -> DataFrame:
    """Pinball (quantile) loss of three constant quantile forecasters:
    the q10/q50/q90 of TRAIN-period daily revenue (exact type-1 order
    statistics, k = ceil(q*n)), each evaluated on TEST days with
    loss_q(y,f) = max(q*(y-f), (q-1)*(y-f)) — the metric that scores a
    quantile forecast's calibration+sharpness jointly, in exact
    milli-q x cent integer units end to end.  The q50 row doubles as
    the MAE/2 of the train-median forecaster.

    Scale: the raw scan reduces to the daily calendar grid; the train
    quantiles come from one cumulative window on that grid
    (bounded-domain allowlist); the test evaluation is a 3x explode of
    the grid with integer arithmetic."""
    o = t(spark, sf, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    daily = (o.groupBy(F.to_date("o_orderdate").alias("day"))
             .agg(F.sum(cents).alias("y")))
    train = daily.filter(F.col("day") < _PINBALL_SPLIT)
    test = daily.filter(F.col("day") >= _PINBALL_SPLIT)
    w = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    ranked = (train.groupBy("y").agg(F.count(F.lit(1)).alias("c"))
              .withColumn("cum", F.sum("c").over(w)))
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    qs = (ranked.crossJoin(F.broadcast(n_train))
          .select("y", "cum", "n_train",
                  F.explode(F.array(*[F.lit(q) for q in _PINBALL_QS]))
                  .alias("q_milli"))
          .withColumn("k", F.ceil(F.col("q_milli") * F.col("n_train")
                                  / 1000.0).cast("long"))
          .filter(F.col("cum") >= F.col("k"))
          .groupBy("q_milli", "n_train")
          .agg(F.min("y").alias("f")))
    ev = test.crossJoin(F.broadcast(qs))
    diff = F.col("y") - F.col("f")
    loss = F.greatest(F.col("q_milli") * diff,
                      (F.col("q_milli") - 1000) * diff)
    per_q = (ev.groupBy("q_milli", "n_train", "f")
             .agg(F.count(F.lit(1)).alias("n_test"),
                  F.sum(loss).alias("loss_milliq_cents"),
                  F.sum(F.when(F.col("y") <= F.col("f"), 1).otherwise(0))
                  .alias("n_covered")))
    return (per_q.select(
        "q_milli", "n_train", "n_test",
        F.col("f").alias("forecast_cents"),
        F.expr("loss_milliq_cents div n_test").cast("long")
        .alias("mean_pinball_milliq_cents"),
        F.floor(F.col("n_covered") * 1000000 / F.col("n_test"))
        .cast("long").alias("test_coverage_micro"))
        .orderBy("q_milli"))


PINBALL_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS y
  FROM orders GROUP BY 1
),
train AS (SELECT y FROM daily WHERE day < DATE '{_PINBALL_SPLIT}'),
test AS (SELECT y FROM daily WHERE day >= DATE '{_PINBALL_SPLIT}'),
ranked AS (
  SELECT y, count(*) AS c,
         sum(count(*)) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) AS cum
  FROM train GROUP BY y
),
nt AS (SELECT count(*) AS n_train FROM train),
qs AS (
  SELECT t.q_milli, n.n_train, min(r.y) AS f
  FROM ranked r CROSS JOIN nt n
  CROSS JOIN (SELECT unnest([{", ".join(map(str, _PINBALL_QS))}])
              AS q_milli) t
  WHERE r.cum >= CAST(ceil(t.q_milli * n.n_train / 1000.0) AS BIGINT)
  GROUP BY 1, 2
),
ev AS (
  SELECT q.q_milli, q.n_train, q.f, t.y,
         greatest(q.q_milli * (t.y - q.f),
                  (q.q_milli - 1000) * (t.y - q.f)) AS loss
  FROM test t CROSS JOIN qs q
),
per_q AS (
  SELECT q_milli, n_train, f, count(*) AS n_test,
         CAST(sum(loss) AS BIGINT) AS loss_milliq_cents,
         CAST(sum(CASE WHEN y <= f THEN 1 ELSE 0 END) AS BIGINT)
           AS n_covered
  FROM ev GROUP BY 1, 2, 3
)
SELECT q_milli, n_train, n_test, f AS forecast_cents,
       CAST(loss_milliq_cents // n_test AS BIGINT)
         AS mean_pinball_milliq_cents,
       CAST(floor(n_covered * 1000000 / n_test) AS BIGINT)
         AS test_coverage_micro
FROM per_q
ORDER BY q_milli
"""


QUERIES["ml_pinball_loss"] = (ml_pinball_loss, PINBALL_SQL)


def ml_mcnemar_model_comparison(spark: SparkSession, sf: str) -> DataFrame:
    """McNemar's test for COMPARING two classifiers on the same rows —
    the correct paired test for "is model B actually better than A?"
    (two independent accuracy CIs overlap ≠ no difference).  Model A:
    the literal price stump "PROMO iff cents <= 1,500,000"; model B:
    "PROMO iff the part size is small (p_size <= 25)";
    ground truth: the PROMO type prefix.  Only the discordant rows
    inform the test: chi2_cc = max(|b - c| - 1, 0)^2/(b + c), with b =
    A right/B wrong and c = A wrong/B right (Edwards correction
    clamped at zero so b == c gives chi2 = 0 — round-8 ADVICE fix,
    mirrored in the oracle).

    Scale: one broadcast dim join and a 4-integer reduce."""
    li = t(spark, sf, "lineitem")
    p = t(spark, sf, "part").select(
        "p_partkey", "p_size",
        F.col("p_type").startswith("PROMO").alias("truth"))
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    pred_a = cents <= 1500000
    pred_b = F.col("p_size") <= 25
    a_ok = (pred_a == F.col("truth")).cast("int")
    b_ok = (pred_b == F.col("truth")).cast("int")
    s = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(a_ok).alias("a_correct"),
        F.sum(b_ok).alias("b_correct"),
        F.sum(a_ok * (1 - b_ok)).alias("b_cell"),
        F.sum((1 - a_ok) * b_ok).alias("c_cell"))
    d = "double"
    b, c = F.col("b_cell").cast(d), F.col("c_cell").cast(d)
    cc = F.greatest(F.abs(b - c) - 1.0, F.lit(0.0))
    chi2 = cc * cc / F.nullif(b + c, F.lit(0.0))
    return s.select(
        "n", "a_correct", "b_correct", "b_cell", "c_cell",
        F.floor(chi2 * 1000.0).cast("long").alias("chi2_cc_milli"),
        (F.floor(chi2 * 1000.0) > 3841).alias("significant_05"))


MCNEMAR_MODELS_SQL = """
WITH j AS (
  SELECT CASE WHEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
              <= 1500000 THEN 1 ELSE 0 END AS pred_a,
         CASE WHEN p.p_size <= 25 THEN 1 ELSE 0 END AS pred_b,
         CASE WHEN starts_with(p.p_type, 'PROMO') THEN 1 ELSE 0 END
           AS truth
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
flags AS (
  SELECT CASE WHEN pred_a = truth THEN 1 ELSE 0 END AS a_ok,
         CASE WHEN pred_b = truth THEN 1 ELSE 0 END AS b_ok
  FROM j
),
s AS (
  SELECT count(*) AS n,
         CAST(sum(a_ok) AS BIGINT) AS a_correct,
         CAST(sum(b_ok) AS BIGINT) AS b_correct,
         CAST(sum(a_ok * (1 - b_ok)) AS BIGINT) AS b_cell,
         CAST(sum((1 - a_ok) * b_ok) AS BIGINT) AS c_cell
  FROM flags
)
SELECT n, a_correct, b_correct, b_cell, c_cell,
       CAST(floor(
         greatest(abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0, 0.0)
         * greatest(abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0, 0.0)
         / nullif(CAST(b_cell AS DOUBLE) + CAST(c_cell AS DOUBLE), 0.0)
         * 1000.0) AS BIGINT) AS chi2_cc_milli,
       CAST(floor(
         greatest(abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0, 0.0)
         * greatest(abs(CAST(b_cell AS DOUBLE) - CAST(c_cell AS DOUBLE)) - 1.0, 0.0)
         / nullif(CAST(b_cell AS DOUBLE) + CAST(c_cell AS DOUBLE), 0.0)
         * 1000.0) AS BIGINT) > 3841 AS significant_05
FROM s
"""


QUERIES["ml_mcnemar_model_comparison"] = (ml_mcnemar_model_comparison,
                                          MCNEMAR_MODELS_SQL)


_COST_FN = 5  # missing a positive costs 5x a false alarm
_COST_FP = 1


def ml_threshold_cost_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Cost-sensitive operating point: over the same quantized score
    grid as ml_threshold_sweep_f1 (embedding dim 0 scoring label=1,
    predict positive iff score >= threshold), the expected-cost-
    minimizing threshold under the literal asymmetric cost matrix
    FN=5, FP=1 — the decision layer that turns a scorer into a policy
    when errors are not symmetric.  cost(t) = 5*FN(t) + 1*FP(t) from
    cumulative grid counts; argmin with ties to the LOWEST threshold;
    the curve's 5 quintile probes are emitted alongside the argmin so
    the report shows shape, not just the winner.

    Scale: one grid agg + one cumulative window (score-grid bounded
    domain, the ml_threshold_sweep_f1 allowlist shape)."""
    emb = t(spark, sf, "embeddings")
    base = emb.select(
        (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    per_v = (base.groupBy("v")
             .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("c_p"),
                  F.count(F.lit(1)).alias("cnt")))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    tot = per_v.agg(F.sum("c_p").alias("tp_all"),
                    (F.sum("cnt") - F.sum("c_p")).alias("tn_all"))
    cum = (per_v.select(
        "v",
        F.coalesce(F.sum("c_p").over(w), F.lit(0)).alias("pos_below"),
        F.coalesce(F.sum(F.col("cnt") - F.col("c_p")).over(w), F.lit(0))
        .alias("neg_below"))
        .crossJoin(F.broadcast(tot)))
    # predict positive iff score >= v: FN = pos below v, FP = neg >= v
    fn = F.col("pos_below")
    fp = F.col("tn_all") - F.col("neg_below")
    cost = _COST_FN * fn + _COST_FP * fp
    scored = cum.select("v", fn.alias("fn"), fp.alias("fp"),
                        cost.alias("cost"))
    best = (scored.orderBy("cost", "v").limit(1)
            .select(F.lit("argmin").alias("probe"), "v", "fn", "fp",
                    "cost"))
    w_r = Window.orderBy("v")
    n_grid = scored.count()
    quint = (scored.withColumn("rn", F.row_number().over(w_r))
             .filter(F.col("rn").isin(
                 *[max(1, round(q * n_grid / 5)) for q in range(1, 6)]))
             .select(F.concat(F.lit("q"),
                              F.ceil(F.col("rn") * 5 / n_grid)
                              .cast("int").cast("string")).alias("probe"),
                     "v", "fn", "fp", "cost"))
    return best.unionByName(quint).orderBy("probe", "v")


COST_CURVE_SQL = f"""
WITH base AS (
  SELECT label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
per_v AS (
  SELECT v, sum(CASE WHEN pos THEN 1 ELSE 0 END) AS c_p,
         count(*) AS cnt
  FROM base GROUP BY v
),
tot AS (
  SELECT CAST(sum(c_p) AS BIGINT) AS tp_all,
         CAST(sum(cnt) - sum(c_p) AS BIGINT) AS tn_all
  FROM per_v
),
cum AS (
  SELECT v,
         CAST(coalesce(sum(c_p) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS pos_below,
         CAST(coalesce(sum(cnt - c_p) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS neg_below
  FROM per_v
),
scored AS (
  SELECT c.v, c.pos_below AS fn, t.tn_all - c.neg_below AS fp,
         {_COST_FN} * c.pos_below + {_COST_FP} * (t.tn_all - c.neg_below)
           AS cost
  FROM cum c CROSS JOIN tot t
),
n_grid AS (SELECT count(*) AS ng FROM scored),
best AS (
  SELECT 'argmin' AS probe, v, fn, fp, cost
  FROM scored ORDER BY cost, v LIMIT 1
),
quint AS (
  SELECT 'q' || CAST(CAST(ceil(rn * 5.0 / ng) AS INT) AS VARCHAR)
           AS probe, v, fn, fp, cost
  FROM (SELECT s.*, row_number() OVER (ORDER BY v) AS rn, g.ng
        FROM scored s CROSS JOIN n_grid g)
  WHERE rn IN (SELECT greatest(1, CAST(round(q * ng / 5.0) AS BIGINT))
               FROM (SELECT unnest([1, 2, 3, 4, 5]) AS q)
               CROSS JOIN n_grid)
)
SELECT probe, v, fn, fp, cost FROM best
UNION ALL
SELECT probe, v, fn, fp, cost FROM quint
ORDER BY probe, v
"""


QUERIES["ml_threshold_cost_curve"] = (ml_threshold_cost_curve,
                                      COST_CURVE_SQL)


def ml_reliability_slope(spark: SparkSession, sf: str) -> DataFrame:
    """Calibration slope & intercept — the weighted least-squares line
    through the reliability diagram's (forecast, outcome-rate) bins
    (the ml_calibration_ece setup: min-max-normalized dim-0 scores,
    10 equal-width bins): slope 1 / intercept 0 is perfect
    calibration, slope < 1 is the classic overconfidence signature.
    Weighted by bin count, from exact per-bin integer moments
    (n_b, sum p_micro, sum p_micro^2, sum y, sum p_micro*y) — two
    double expressions at the end, no per-row floats ever summed.

    Scale: one scan to bin, one 10-row moment agg, a 1-row solve."""
    emb = t(spark, sf, "embeddings")
    base = emb.select(
        (F.col("label") == 1).cast("long").alias("y"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    mm = base.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    j = base.crossJoin(F.broadcast(mm))
    p_micro = F.expr("(v - mn) * 1000000 div (mx - mn)").cast("long")
    binned = j.select(
        "y", p_micro.alias("p"),
        F.least(F.lit(9), F.expr(
            "(v - mn) * 10 div (mx - mn)")).cast("long").alias("b"))
    _D = "decimal(38,0)"
    per_b = (binned.groupBy("b")
             .agg(F.count(F.lit(1)).alias("nb"),
                  F.sum("p").alias("sp"),
                  F.sum(F.col("p").cast(_D) * F.col("p").cast(_D))
                  .alias("spp"),
                  F.sum("y").alias("sy"),
                  F.sum(F.col("p").cast(_D) * F.col("y").cast(_D))
                  .alias("spy")))
    s = per_b.agg(F.sum("nb").alias("n"), F.sum("sp").alias("sp"),
                  F.sum("spp").alias("spp"), F.sum("sy").alias("sy"),
                  F.sum("spy").alias("spy"),
                  F.count(F.lit(1)).alias("n_bins"))
    d = "double"
    n = F.col("n").cast(d)
    # weighted (by row) regression of y on p/1e6 over ALL rows, which
    # the bin moments carry exactly
    sp = F.col("sp").cast(d) / 1e6
    spp = F.col("spp").cast(d) / 1e12
    sy = F.col("sy").cast(d)
    spy = F.col("spy").cast(d) / 1e6
    slope = (n * spy - sp * sy) / (n * spp - sp * sp)
    intercept = (sy - slope * sp) / n
    return s.select(
        "n", "n_bins",
        F.floor(slope * 1000000.0).cast("long").alias("slope_micro"),
        F.floor(intercept * 1000000.0).cast("long")
        .alias("intercept_micro"))


RELIABILITY_SLOPE_SQL = """
WITH base AS (
  SELECT CASE WHEN label = 1 THEN 1 ELSE 0 END AS y,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
mm AS (SELECT min(v) AS mn, max(v) AS mx FROM base),
binned AS (
  SELECT y, CAST((v - mn) * 1000000 // (mx - mn) AS BIGINT) AS p,
         least(9, (v - mn) * 10 // (mx - mn)) AS b
  FROM base CROSS JOIN mm
),
per_b AS (
  SELECT b, count(*) AS nb, CAST(sum(p) AS BIGINT) AS sp,
         sum(CAST(p AS HUGEINT) * p) AS spp,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(p AS HUGEINT) * y) AS spy
  FROM binned GROUP BY b
),
s AS (
  SELECT CAST(sum(nb) AS BIGINT) AS n, sum(sp) AS sp, sum(spp) AS spp,
         sum(sy) AS sy, sum(spy) AS spy, count(*) AS n_bins
  FROM per_b
)
SELECT n, n_bins,
       CAST(floor(
         (CAST(n AS DOUBLE) * (CAST(spy AS DOUBLE) / 1e6)
          - (CAST(sp AS DOUBLE) / 1e6) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * (CAST(spp AS DOUBLE) / 1e12)
            - (CAST(sp AS DOUBLE) / 1e6) * (CAST(sp AS DOUBLE) / 1e6))
         * 1000000.0) AS BIGINT) AS slope_micro,
       CAST(floor(
         (CAST(sy AS DOUBLE)
          - (CAST(n AS DOUBLE) * (CAST(spy AS DOUBLE) / 1e6)
             - (CAST(sp AS DOUBLE) / 1e6) * CAST(sy AS DOUBLE))
            / (CAST(n AS DOUBLE) * (CAST(spp AS DOUBLE) / 1e12)
               - (CAST(sp AS DOUBLE) / 1e6)
                 * (CAST(sp AS DOUBLE) / 1e6))
            * (CAST(sp AS DOUBLE) / 1e6))
         / CAST(n AS DOUBLE) * 1000000.0) AS BIGINT) AS intercept_micro
FROM s
"""


QUERIES["ml_reliability_slope"] = (ml_reliability_slope,
                                   RELIABILITY_SLOPE_SQL)
