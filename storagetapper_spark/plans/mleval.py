"""Model-evaluation batch: calibration (reliability bins + ECE),
threshold confusion metrics, and group-integrity k-fold assignment —
the evaluation layer next to ml_auc_roc's ranking metric.

Exactness: scores quantize to micro-ints at the scan; per-bin
confidences are exact integer sums; every cross-engine float is either
a per-bin term floored BEFORE the final integer sum (ECE — the
price_anova pattern) or one double expression over exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_N_BINS = 10
_KFOLDS = 5


def _scored(spark: SparkSession, sf: str) -> DataFrame:
    emb = t(spark, sf, "embeddings")
    return emb.select(
        (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))


def ml_calibration_ece(spark: SparkSession, sf: str) -> DataFrame:
    """Reliability diagram + expected calibration error for the
    min-max-normalized dim-0 scorer: 10 equi-width bins, per bin the
    mean predicted confidence vs the observed positive rate, and
    ECE = Σ_b (n_b/N)·|acc_b − conf_b| with per-bin terms floored to
    integer micros before the (10-row) exact sum."""
    base = _scored(spark, sf)
    mm = base.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    j = base.crossJoin(F.broadcast(mm))
    norm = ((F.col("v") - F.col("mn")).cast("double")
            / (F.col("mx") - F.col("mn")).cast("double"))
    binc = F.least(F.lit(_N_BINS - 1),
                   F.floor(norm * _N_BINS).cast("int"))
    nq = F.floor(norm * 1000000.0).cast("long")
    bins = (j.select(binc.alias("bin"), nq.alias("nq"), "pos")
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.when(F.col("pos"), 1).otherwise(0))
                 .alias("n_pos"),
                 F.sum("nq").alias("sum_nq")))
    tot = bins.agg(F.sum("n").alias("nn"))
    conf = F.col("sum_nq").cast("double") / F.col("n").cast("double")
    acc = (F.col("n_pos").cast("double") * 1000000.0
           / F.col("n").cast("double"))
    term = F.floor(F.col("n").cast("double")
                   / F.col("nn").cast("double")
                   * F.abs(acc - conf)).cast("long")
    withe = (bins.crossJoin(F.broadcast(tot))
             .select("bin", "n", "n_pos",
                     F.floor(conf).cast("long").alias("conf_micro"),
                     F.floor(acc).cast("long").alias("acc_micro"),
                     term.alias("ece_term_micro")))
    ece = withe.agg(F.sum("ece_term_micro").alias("ece_micro"))
    return (withe.crossJoin(F.broadcast(ece))
            .select("bin", "n", "n_pos", "conf_micro", "acc_micro",
                    "ece_micro")
            .orderBy("bin"))


CALIBRATION_SQL = f"""
WITH base AS (
  SELECT label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
mm AS (SELECT min(v) AS mn, max(v) AS mx FROM base),
j AS (
  SELECT least({_N_BINS - 1},
               CAST(floor(CAST(v - mn AS DOUBLE)
                          / CAST(mx - mn AS DOUBLE) * {_N_BINS})
                    AS INTEGER)) AS bin,
         CAST(floor(CAST(v - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS nq,
         pos
  FROM base CROSS JOIN mm
),
bins AS (
  SELECT bin, count(*) AS n,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
         CAST(sum(nq) AS BIGINT) AS sum_nq
  FROM j GROUP BY bin
),
tot AS (SELECT sum(n) AS nn FROM bins),
withe AS (
  SELECT bin, n, n_pos,
         CAST(floor(CAST(sum_nq AS DOUBLE) / CAST(n AS DOUBLE))
              AS BIGINT) AS conf_micro,
         CAST(floor(CAST(n_pos AS DOUBLE) * 1000000.0
                    / CAST(n AS DOUBLE)) AS BIGINT) AS acc_micro,
         CAST(floor(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE)
                    * abs(CAST(n_pos AS DOUBLE) * 1000000.0
                          / CAST(n AS DOUBLE)
                          - CAST(sum_nq AS DOUBLE) / CAST(n AS DOUBLE)))
              AS BIGINT) AS ece_term_micro
  FROM bins CROSS JOIN tot
),
ece AS (SELECT CAST(sum(ece_term_micro) AS BIGINT) AS ece_micro
        FROM withe)
SELECT CAST(bin AS INTEGER) AS bin, CAST(n AS BIGINT) AS n,
       CAST(n_pos AS BIGINT) AS n_pos, conf_micro, acc_micro,
       e.ece_micro
FROM withe CROSS JOIN ece e
ORDER BY bin
"""


def ml_classification_metrics(spark: SparkSession, sf: str) -> DataFrame:
    """Confusion matrix and precision/recall/F1 for the dim-0 scorer at
    threshold 0 — four exact counts from one scan, three floored-micro
    ratios (F1 computed as 2·tp/(2·tp+fp+fn), integer-composed)."""
    base = _scored(spark, sf)
    pred = F.col("v") >= 0
    agg = base.agg(
        F.sum(F.when(pred & F.col("pos"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pred & ~F.col("pos"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred & F.col("pos"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~pred & ~F.col("pos"), 1).otherwise(0)).alias("tn"))
    prec = (F.col("tp").cast("double") * 1000000.0
            / (F.col("tp") + F.col("fp")).cast("double"))
    rec = (F.col("tp").cast("double") * 1000000.0
           / (F.col("tp") + F.col("fn")).cast("double"))
    f1 = (2.0 * F.col("tp").cast("double") * 1000000.0
          / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"))
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.floor(prec).cast("long").alias("precision_micro"),
        F.floor(rec).cast("long").alias("recall_micro"),
        F.floor(f1).cast("long").alias("f1_micro"))


CLS_METRICS_SQL = """
WITH base AS (
  SELECT label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
agg AS (
  SELECT sum(CASE WHEN v >= 0 AND pos THEN 1 ELSE 0 END) AS tp,
         sum(CASE WHEN v >= 0 AND NOT pos THEN 1 ELSE 0 END) AS fp,
         sum(CASE WHEN v < 0 AND pos THEN 1 ELSE 0 END) AS fn,
         sum(CASE WHEN v < 0 AND NOT pos THEN 1 ELSE 0 END) AS tn
  FROM base
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CAST(floor(CAST(tp AS DOUBLE) * 1000000.0
                  / CAST(tp + fp AS DOUBLE)) AS BIGINT)
         AS precision_micro,
       CAST(floor(CAST(tp AS DOUBLE) * 1000000.0
                  / CAST(tp + fn AS DOUBLE)) AS BIGINT)
         AS recall_micro,
       CAST(floor(2.0 * CAST(tp AS DOUBLE) * 1000000.0
                  / CAST(2 * tp + fp + fn AS DOUBLE)) AS BIGINT)
         AS f1_micro
FROM agg
"""


def sample_kfold_group_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Group-integrity k-fold assignment for cross-validation: every
    document's fold is md5(source-group) % k, so a GROUP never
    straddles folds (the leakage rule of GroupKFold — same discipline
    as sample_split_leakage_safe, keyed by source here).  Reports fold
    sizes, group counts, and the positive-length share per fold."""
    docs = t(spark, sf, "documents")
    fold = (F.conv(F.substring(F.md5(F.col("source")), 1, 15), 16, 10)
            .cast("decimal(19,0)") % _KFOLDS).cast("long")
    per = (docs.select(fold.alias("fold"), "source", "n_chars")
           .groupBy("fold")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("source").alias("n_groups"),
                F.sum("n_chars").alias("n_chars")))
    tot = per.agg(F.sum("n_docs").alias("nn"))
    return (per.crossJoin(F.broadcast(tot))
            .select("fold", "n_docs", "n_groups", "n_chars",
                    F.floor(F.col("n_docs") * 1000000 / F.col("nn"))
                    .cast("long").alias("share_micro"))
            .orderBy("fold"))


KFOLD_SQL = f"""
WITH per AS (
  SELECT CAST(CAST(('0x' || substring(md5(source), 1, 15)) AS BIGINT)
              % {_KFOLDS} AS BIGINT) AS fold,
         count(*) AS n_docs, count(DISTINCT source) AS n_groups,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY 1
),
tot AS (SELECT sum(n_docs) AS nn FROM per)
SELECT fold, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_groups AS BIGINT) AS n_groups, n_chars,
       CAST(floor(n_docs * 1000000 / nn) AS BIGINT) AS share_micro
FROM per CROSS JOIN tot
ORDER BY fold
"""


_NDCG_K = 100


def ml_ndcg_at_k(spark: SparkSession, sf: str) -> DataFrame:
    """NDCG@100 of the dim-0 scorer with binary relevance (label=1):
    DCG = Σ_{i≤k} rel_i/log₂(i+1) over the score-descending ranking
    (ties broken by vec_id), IDCG the same sum over the ideal prefix.

    Scale shape: the global sort materializes only k rows
    (TakeOrderedAndProject), then rank positions and both discount
    sums live on a 100-row frame; per-position discount terms are
    floored to micros before the exact integer sum so the (tiny) sum
    is still order-independent.  log₂ is evaluated identically on
    equal integer inputs by both engines (one IEEE expression)."""
    emb = t(spark, sf, "embeddings")
    base = emb.select(
        "vec_id", (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    from pyspark.sql import Window

    # global top-k materializes k rows (TakeOrderedAndProject); the
    # rank window then runs on the 100-row frame only
    ranked = (base.orderBy(F.desc("v"), "vec_id").limit(_NDCG_K)
              .withColumn("rk", F.row_number().over(
                  Window.orderBy(F.desc("v"), "vec_id"))))
    disc = 1000000.0 / F.log2(F.col("rk").cast("double") + 1.0)
    dcg = (ranked.agg(
        F.sum(F.when(F.col("pos"), F.floor(disc).cast("long"))
              .otherwise(0)).alias("dcg_micro"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("k_pos")))
    n_pos = base.agg(
        F.least(F.sum(F.when(F.col("pos"), 1).otherwise(0)),
                F.lit(_NDCG_K)).alias("ideal_n"))
    ideal = (spark.range(1, _NDCG_K + 1).toDF("rk")
             .crossJoin(F.broadcast(n_pos))
             .filter(F.col("rk") <= F.col("ideal_n"))
             .agg(F.sum(F.floor(
                 1000000.0 / F.log2(F.col("rk").cast("double") + 1.0))
                 .cast("long")).alias("idcg_micro")))
    ndcg = (F.col("dcg_micro").cast("double") * 1000000.0
            / F.col("idcg_micro").cast("double"))
    return (dcg.crossJoin(F.broadcast(ideal))
            .select("k_pos", "dcg_micro", "idcg_micro",
                    F.floor(ndcg).cast("long").alias("ndcg_micro")))


NDCG_SQL = f"""
WITH base AS (
  SELECT vec_id, label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
ranked AS (
  SELECT pos, row_number() OVER (ORDER BY v DESC, vec_id) AS rk
  FROM base ORDER BY v DESC, vec_id LIMIT {_NDCG_K}
),
dcg AS (
  SELECT CAST(sum(CASE WHEN pos THEN CAST(floor(
             1000000.0 / log2(CAST(rk AS DOUBLE) + 1.0)) AS BIGINT)
             ELSE 0 END) AS BIGINT) AS dcg_micro,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS k_pos
  FROM ranked
),
np AS (
  SELECT least(sum(CASE WHEN pos THEN 1 ELSE 0 END), {_NDCG_K})
           AS ideal_n
  FROM base
),
ideal AS (
  SELECT CAST(sum(CAST(floor(1000000.0
             / log2(CAST(r.range + 1 AS DOUBLE) + 1.0)) AS BIGINT))
           AS BIGINT) AS idcg_micro
  FROM range({_NDCG_K}) r CROSS JOIN np
  WHERE r.range + 1 <= np.ideal_n
)
SELECT CAST(d.k_pos AS BIGINT) AS k_pos, d.dcg_micro, i.idcg_micro,
       CAST(floor(CAST(d.dcg_micro AS DOUBLE) * 1000000.0
                  / CAST(i.idcg_micro AS DOUBLE)) AS BIGINT)
         AS ndcg_micro
FROM dcg d CROSS JOIN ideal i
"""


QUERIES = {
    "ml_calibration_ece": (ml_calibration_ece, CALIBRATION_SQL),
    "ml_classification_metrics": (ml_classification_metrics,
                                  CLS_METRICS_SQL),
    "sample_kfold_group_assign": (sample_kfold_group_assign, KFOLD_SQL),
    "ml_ndcg_at_k": (ml_ndcg_at_k, NDCG_SQL),
}


def ml_mcc(spark: SparkSession, sf: str) -> DataFrame:
    """Matthews correlation coefficient for the threshold-0 dim-0
    classifier: MCC = (tp·tn − fp·fn)/√((tp+fp)(tp+fn)(tn+fp)(tn+fn))
    — the class-imbalance-robust single-number summary next to
    ml_classification_metrics' P/R/F1, from the same four exact
    counts (numerator in DECIMAL, one double division)."""
    base = _scored(spark, sf)
    pred = F.col("v") >= 0
    agg = base.agg(
        F.sum(F.when(pred & F.col("pos"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pred & ~F.col("pos"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred & F.col("pos"), 1).otherwise(0)).alias("fn"),
        F.sum(F.when(~pred & ~F.col("pos"), 1).otherwise(0)).alias("tn"))
    d = "decimal(19,0)"
    num = (F.col("tp").cast(d) * F.col("tn").cast(d)
           - F.col("fp").cast(d) * F.col("fn").cast(d))
    den = F.sqrt((F.col("tp") + F.col("fp")).cast("double")
                 * (F.col("tp") + F.col("fn")).cast("double")
                 * (F.col("tn") + F.col("fp")).cast("double")
                 * (F.col("tn") + F.col("fn")).cast("double"))
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.floor(num.cast("double") / den * 1000000.0).cast("long")
        .alias("mcc_micro"))


MCC_SQL = """
WITH base AS (
  SELECT label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
agg AS (
  SELECT sum(CASE WHEN v >= 0 AND pos THEN 1 ELSE 0 END) AS tp,
         sum(CASE WHEN v >= 0 AND NOT pos THEN 1 ELSE 0 END) AS fp,
         sum(CASE WHEN v < 0 AND pos THEN 1 ELSE 0 END) AS fn,
         sum(CASE WHEN v < 0 AND NOT pos THEN 1 ELSE 0 END) AS tn
  FROM base
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       CAST(floor(CAST(CAST(tp AS HUGEINT) * tn
                       - CAST(fp AS HUGEINT) * fn AS DOUBLE)
                  / sqrt(CAST(tp + fp AS DOUBLE)
                         * CAST(tp + fn AS DOUBLE)
                         * CAST(tn + fp AS DOUBLE)
                         * CAST(tn + fn AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS mcc_micro
FROM agg
"""


QUERIES["ml_mcc"] = (ml_mcc, MCC_SQL)


def ml_conformal_split(spark: SparkSession, sf: str) -> DataFrame:
    """Split-conformal prediction for the positive class at alpha=0.1:
    even vec_ids are the calibration fold, odd the test fold.
    Nonconformity is -score (lower score = less conforming to "pos");
    the threshold tau is the ceil((n_cal+1)*0.9)-th smallest
    calibration nonconformity — an EXACT order statistic, computed
    with the two-pass rank (operators/ranks.py) instead of a
    corpus-wide window, then broadcast to the test fold.  Reports the
    finite-sample coverage (>= 90% guaranteed by exchangeability) and
    the prediction-set efficiency (fraction of test rows whose set
    includes "pos")."""
    from storagetapper_spark.operators.ranks import two_pass_rank

    emb = t(spark, sf, "embeddings")
    base = emb.select(
        "vec_id", (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    calib = (base.filter((F.col("vec_id") % 2 == 0) & F.col("pos"))
             .select((-F.col("v")).alias("alpha"), "vec_id"))
    ranked = two_pass_rank(
        calib, order=[F.col("alpha"), F.col("vec_id")],
        bucket=F.floor(F.col("alpha") / 100000).cast("long"))
    tau = (ranked
           .filter(F.col("_rank") == F.expr("(9 * (_n + 1) + 9) div 10"))
           .select(F.col("alpha").alias("tau"),
                   F.col("_n").alias("n_cal"),
                   F.col("_rank").alias("k")))
    test = base.filter(F.col("vec_id") % 2 == 1)
    agg = (test.crossJoin(F.broadcast(tau))
           .agg(F.first("n_cal").alias("n_cal"),
                F.first("k").alias("k"),
                F.first("tau").alias("tau"),
                F.count(F.lit(1)).alias("n_test"),
                F.sum(F.when(F.col("pos"), 1).otherwise(0))
                .alias("n_test_pos"),
                F.sum(F.when(F.col("pos") & (-F.col("v") <= F.col("tau")),
                             1).otherwise(0)).alias("covered_pos"),
                F.sum(F.when(-F.col("v") <= F.col("tau"), 1).otherwise(0))
                .alias("pred_pos")))
    return agg.select(
        "n_cal", "k", "tau", "n_test", "n_test_pos", "covered_pos",
        F.floor(F.col("covered_pos").cast("double") * 1000000.0
                / F.col("n_test_pos").cast("double")).cast("long")
        .alias("coverage_micro"),
        F.floor(F.col("pred_pos").cast("double") * 1000000.0
                / F.col("n_test").cast("double")).cast("long")
        .alias("pred_pos_micro"))


CONFORMAL_SQL = """
WITH base AS (
  SELECT vec_id, label = 1 AS pos,
         CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT)
           AS v
  FROM embeddings
),
calib AS (
  SELECT -v AS alpha, vec_id FROM base WHERE vec_id % 2 = 0 AND pos
),
ranked AS (
  SELECT alpha, row_number() OVER (ORDER BY alpha, vec_id) AS rn,
         count(*) OVER () AS n
  FROM calib
),
thr AS (
  SELECT alpha AS tau, n AS n_cal, rn AS k
  FROM ranked WHERE rn = (9 * (n + 1) + 9) // 10
),
agg AS (
  SELECT any_value(n_cal) AS n_cal, any_value(k) AS k,
         any_value(tau) AS tau,
         count(*) AS n_test,
         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_test_pos,
         sum(CASE WHEN pos AND -v <= tau THEN 1 ELSE 0 END)
           AS covered_pos,
         sum(CASE WHEN -v <= tau THEN 1 ELSE 0 END) AS pred_pos
  FROM base, thr WHERE vec_id % 2 = 1
)
SELECT CAST(n_cal AS BIGINT) AS n_cal, CAST(k AS BIGINT) AS k, tau,
       n_test, CAST(n_test_pos AS BIGINT) AS n_test_pos,
       CAST(covered_pos AS BIGINT) AS covered_pos,
       CAST(floor(CAST(covered_pos AS DOUBLE) * 1000000.0
                  / CAST(n_test_pos AS DOUBLE)) AS BIGINT)
         AS coverage_micro,
       CAST(floor(CAST(pred_pos AS DOUBLE) * 1000000.0
                  / CAST(n_test AS DOUBLE)) AS BIGINT)
         AS pred_pos_micro
FROM agg
"""


QUERIES["ml_conformal_split"] = (ml_conformal_split, CONFORMAL_SQL)


def ml_pr_auc(spark: SparkSession, sf: str) -> DataFrame:
    """Precision-recall AUC (trapezoidal over distinct score
    thresholds, descending) for the dim-0 scorer: at each distinct
    quantized score v the operating point is (R, P) = (cum_pos/n_pos,
    cum_pos/cum_n) over rows scoring >= v; the area term between
    consecutive thresholds is floored to integer micros BEFORE the
    final exact sum (the ECE discipline), and the previous point needs
    NO lag — it is (cum_pos - c_p, cum_n - cnt) by construction.
    P_0 = 1 by convention at the first threshold.  Same score-grid
    window shape as ml_auc_roc (bounded-domain allowlist)."""
    emb = t(spark, sf, "embeddings")
    base = emb.select(
        (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    per_v = (base.groupBy("v")
             .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0))
                  .alias("c_p"),
                  F.count(F.lit(1)).alias("cnt")))
    from pyspark.sql import Window
    w = (Window.orderBy(F.desc("v"))
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = per_v.select(
        "c_p", "cnt",
        F.sum("c_p").over(w).alias("cum_p"),
        F.sum("cnt").over(w).alias("cum_n"))
    tot = per_v.agg(F.sum("c_p").alias("n_pos"),
                    (F.sum("cnt") - F.sum("c_p")).alias("n_neg"))
    j = cum.crossJoin(F.broadcast(tot))
    p_cur = F.col("cum_p").cast("double") / F.col("cum_n").cast("double")
    p_prev = F.when(
        F.col("cum_n") - F.col("cnt") == 0, F.lit(1.0)).otherwise(
        (F.col("cum_p") - F.col("c_p")).cast("double")
        / (F.col("cum_n") - F.col("cnt")).cast("double"))
    # n_pos = 0 guard (ADVICE r6): without it the term is NaN, which
    # Spark's non-ANSI long cast nulls while DuckDB raises — emit an
    # explicit 0 in BOTH engines on that degenerate input.
    term = F.when(F.col("n_pos") > 0,
                  F.floor(F.col("c_p").cast("double")
                          / F.col("n_pos").cast("double")
                          * (p_cur + p_prev) / 2.0 * 1000000.0)
                  ).otherwise(F.lit(0)).cast("long")
    return (j.select("n_pos", "n_neg", term.alias("t"))
            .groupBy("n_pos", "n_neg")
            .agg(F.sum("t").alias("pr_auc_micro")))


PR_AUC_SQL = """
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
cum AS (
  SELECT c_p, cnt,
         CAST(sum(c_p) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_p,
         CAST(sum(cnt) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_n
  FROM per_v
),
tot AS (
  SELECT CAST(sum(c_p) AS BIGINT) AS n_pos,
         CAST(sum(cnt) - sum(c_p) AS BIGINT) AS n_neg
  FROM per_v
)
SELECT n_pos, n_neg,
       CAST(sum(CASE WHEN n_pos > 0 THEN CAST(floor(
         CAST(c_p AS DOUBLE) / CAST(n_pos AS DOUBLE)
         * (CAST(cum_p AS DOUBLE) / CAST(cum_n AS DOUBLE)
            + CASE WHEN cum_n - cnt = 0 THEN 1.0
                   ELSE CAST(cum_p - c_p AS DOUBLE)
                        / CAST(cum_n - cnt AS DOUBLE) END)
         / 2.0 * 1000000.0) AS BIGINT) ELSE 0 END) AS BIGINT)
         AS pr_auc_micro
FROM cum, tot
GROUP BY n_pos, n_neg
"""


QUERIES["ml_pr_auc"] = (ml_pr_auc, PR_AUC_SQL)


def ml_lift_gains(spark: SparkSession, sf: str) -> DataFrame:
    """Cumulative gains / lift table at score deciles: for k = 1..10
    the smallest descending-score prefix covering >= k/10 of the
    population (first grid row with cum_n·10 >= k·N — exact integer
    comparison, ties kept whole, so the 'decile' is the standard
    tie-respecting one), with precision, recall and lift at that
    operating point.  Same score-grid cumsum as ml_auc_roc/ml_pr_auc;
    the decile probe is a 10-row broadcast."""
    emb = t(spark, sf, "embeddings")
    base = emb.select(
        (F.col("label") == 1).alias("pos"),
        F.floor(F.element_at("embedding", 1).cast("double") * 1000000)
        .cast("long").alias("v"))
    per_v = (base.groupBy("v")
             .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0))
                  .alias("c_p"),
                  F.count(F.lit(1)).alias("cnt")))
    from pyspark.sql import Window
    w = (Window.orderBy(F.desc("v"))
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = per_v.select(
        F.sum("c_p").over(w).alias("cum_p"),
        F.sum("cnt").over(w).alias("cum_n"))
    tot = per_v.agg(F.sum("cnt").alias("nn"),
                    F.sum("c_p").alias("n_pos"))
    deciles = spark.range(1, 11).select(F.col("id").alias("k"))
    picks = (cum.crossJoin(F.broadcast(tot))
             .crossJoin(F.broadcast(deciles))
             .filter(F.col("cum_n") * 10 >= F.col("k") * F.col("nn"))
             .groupBy("k", "nn", "n_pos")
             .agg(F.min("cum_n").alias("cum_n")))
    out = picks.join(cum, "cum_n")
    prec = F.col("cum_p").cast("double") / F.col("cum_n").cast("double")
    rec = F.col("cum_p").cast("double") / F.col("n_pos").cast("double")
    base_rate = F.col("n_pos").cast("double") / F.col("nn").cast("double")
    return (out.select(
        F.col("k").alias("decile"), "cum_n", "cum_p",
        F.floor(prec * 1000000.0).cast("long").alias("precision_micro"),
        F.floor(rec * 1000000.0).cast("long").alias("recall_micro"),
        F.floor(prec / base_rate * 1000000.0).cast("long")
        .alias("lift_micro"))
        .orderBy("decile"))


LIFT_GAINS_SQL = """
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
cum AS (
  SELECT CAST(sum(c_p) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_p,
         CAST(sum(cnt) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_n
  FROM per_v
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS nn,
         CAST(sum(c_p) AS BIGINT) AS n_pos
  FROM per_v
),
deciles AS (SELECT CAST(range AS BIGINT) AS k FROM range(1, 11)),
picks AS (
  SELECT k, nn, n_pos, min(cum_n) AS cum_n
  FROM cum, tot, deciles
  WHERE cum_n * 10 >= k * nn
  GROUP BY k, nn, n_pos
)
SELECT k AS decile, cum_n, cum_p,
       CAST(floor(CAST(cum_p AS DOUBLE) / CAST(cum_n AS DOUBLE)
                  * 1000000.0) AS BIGINT) AS precision_micro,
       CAST(floor(CAST(cum_p AS DOUBLE) / CAST(n_pos AS DOUBLE)
                  * 1000000.0) AS BIGINT) AS recall_micro,
       CAST(floor(CAST(cum_p AS DOUBLE) / CAST(cum_n AS DOUBLE)
                  / (CAST(n_pos AS DOUBLE) / CAST(nn AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS lift_micro
FROM picks JOIN cum USING (cum_n)
ORDER BY decile
"""


QUERIES["ml_lift_gains"] = (ml_lift_gains, LIFT_GAINS_SQL)


def ml_threshold_sweep_f1(spark: SparkSession, sf: str) -> DataFrame:
    """Best-F1 operating point: every distinct quantized score is a
    candidate threshold (predict positive when score >= v); TP/FP/FN
    come from the same descending-grid cumsums as ml_pr_auc, F1 is one
    double expression over them, and the argmax is a grid-bounded
    TakeOrdered with deterministic ties (higher threshold wins).
    Returns the chosen threshold with its confusion row and
    P/R/F1 micros — the deployment-threshold picker next to the
    threshold-free AUC metrics."""
    base = _scored(spark, sf)
    per_v = (base.groupBy("v")
             .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0))
                  .alias("c_p"),
                  F.count(F.lit(1)).alias("cnt")))
    from pyspark.sql import Window
    w = (Window.orderBy(F.desc("v"))
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = per_v.select(
        "v",
        F.sum("c_p").over(w).alias("tp"),
        (F.sum("cnt").over(w) - F.sum("c_p").over(w)).alias("fp"))
    tot = per_v.agg(F.sum("c_p").alias("n_pos"))
    j = cum.crossJoin(F.broadcast(tot))
    fn = F.col("n_pos") - F.col("tp")
    # F1 = 2TP / (2TP + FP + FN), exact integers in one double expr
    f1 = (F.lit(2.0) * F.col("tp").cast("double")
          / (2 * F.col("tp") + F.col("fp") + fn).cast("double"))
    scored = j.select(
        "v", "tp", "fp", fn.alias("fn"), "n_pos",
        F.floor(f1 * 1000000.0).cast("long").alias("f1_micro"))
    best = scored.orderBy(F.desc("f1_micro"), F.desc("v")).limit(1)
    return best.select(
        F.col("v").alias("threshold"), "tp", "fp", "fn",
        F.floor(F.col("tp").cast("double") * 1000000.0
                / (F.col("tp") + F.col("fp")).cast("double"))
        .cast("long").alias("precision_micro"),
        F.floor(F.col("tp").cast("double") * 1000000.0
                / F.col("n_pos").cast("double")).cast("long")
        .alias("recall_micro"),
        "f1_micro")


F1_SWEEP_SQL = """
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
cum AS (
  SELECT v,
         CAST(sum(c_p) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS tp,
         CAST(sum(cnt) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
              - sum(c_p) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS fp
  FROM per_v
),
tot AS (SELECT CAST(sum(c_p) AS BIGINT) AS n_pos FROM per_v),
scored AS (
  SELECT v, tp, fp, n_pos - tp AS fn, n_pos,
         CAST(floor(2.0 * CAST(tp AS DOUBLE)
                    / CAST(2 * tp + fp + (n_pos - tp) AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS f1_micro
  FROM cum, tot
)
SELECT v AS threshold, tp, fp, fn,
       CAST(floor(CAST(tp AS DOUBLE) * 1000000.0
                  / CAST(tp + fp AS DOUBLE)) AS BIGINT)
         AS precision_micro,
       CAST(floor(CAST(tp AS DOUBLE) * 1000000.0
                  / CAST(n_pos AS DOUBLE)) AS BIGINT) AS recall_micro,
       f1_micro
FROM scored
ORDER BY f1_micro DESC, v DESC
LIMIT 1
"""


QUERIES["ml_threshold_sweep_f1"] = (ml_threshold_sweep_f1, F1_SWEEP_SQL)
