"""Embedding-quality diagnostics batch: per-dimension distribution
stats and Mahalanobis-style (diagonal) outlier scoring — the checks a
feature store runs before trusting a new embedding version (complements
embedding_stats/drift_cells/class_separation).

Determinism discipline: raw float dims are quantized to micro-ints at
the scan (floor(x·10⁶) — identical in both engines because the
float32→double widening is exact), so every sufficient statistic is an
exact BIGINT and per-vector score sums are integer sums — no float
accumulation order anywhere (stricter than the rounding approach in
embedding_class_separation; see SCALE.md).

Scale shape: both queries are long-form (vector, dim) → one map-side
combinable agg keyed by dim (64 groups), one broadcast of the 64-row
stats table back onto the long form, and a bounded top-k.  Nothing
vector-scaled shuffles except the final k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_TOPK_DIMS = 10
_TOPK_OUT = 10


def _long_q(spark: SparkSession, sf: str) -> DataFrame:
    """(vec_id, label, pos, xq) with xq = floor(dim_value · 10⁶)."""
    emb = t(spark, sf, "embeddings")
    return (emb.select(
        "vec_id", "label",
        F.posexplode(F.col("embedding").cast("array<double>"))
        .alias("pos", "v"))
        .select("vec_id", "label", "pos",
                F.floor(F.col("v") * 1000000).cast("long").alias("xq")))


_LONG_SQL = """
longq AS (
  SELECT vec_id, label, i - 1 AS pos,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
           AS xq
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
)
"""


def embedding_dim_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 embedding dimensions by variance, with mean/min/max —
    the PCA-lite readout that flags dead dims (≈0 variance) and
    dominant dims (quantization risk for int8 serving,
    cf. ann_quantized_recall)."""
    lng = _long_q(spark, sf)
    s = (lng.groupBy("pos")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("xq").alias("sx"),
              F.sum(F.col("xq") * F.col("xq")).alias("sx2"),
              F.min("xq").alias("min_micro"),
              F.max("xq").alias("max_micro")))
    mean = F.floor(F.col("sx").cast("double") / F.col("n")).cast("long")
    var = ((F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx"))
           .cast("double")
           / (F.col("n").cast("double") * F.col("n").cast("double")))
    return (s.select(F.col("pos").alias("dim"), "n",
                     mean.alias("mean_micro"),
                     F.floor(var).cast("long").alias("var_micro2"),
                     "min_micro", "max_micro")
            .orderBy(F.desc("var_micro2"), "dim")
            .limit(_TOPK_DIMS))


DIM_STATS_SQL = f"""
WITH {_LONG_SQL}
SELECT pos AS dim, count(*) AS n,
       CAST(floor(CAST(CAST(sum(xq) AS BIGINT) AS DOUBLE) / count(*))
            AS BIGINT) AS mean_micro,
       CAST(floor(CAST(count(*) * CAST(sum(xq * xq) AS BIGINT)
                       - CAST(sum(xq) AS BIGINT) * CAST(sum(xq) AS BIGINT)
                       AS DOUBLE)
                  / (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE)))
            AS BIGINT) AS var_micro2,
       min(xq) AS min_micro, max(xq) AS max_micro
FROM longq
GROUP BY pos
ORDER BY var_micro2 DESC, dim
LIMIT {_TOPK_DIMS}
"""


QUERIES = {
    "embedding_dim_stats": (embedding_dim_stats, DIM_STATS_SQL),
}


def embedding_outlier_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Top-10 outlier vectors by diagonal Mahalanobis distance:
    score = Σ_d ((x_d − μ_d)/σ_d)², each dimension term micro-floored
    before the per-vector INTEGER sum (deterministic under any
    aggregation order).  The per-dim stats table is 64 rows,
    broadcast."""
    lng = _long_q(spark, sf)
    s = (lng.groupBy("pos")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("xq").alias("sx"),
              F.sum(F.col("xq") * F.col("xq")).alias("sx2")))
    mu = F.col("sx").cast("double") / F.col("n").cast("double")
    var = ((F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx"))
           .cast("double")
           / (F.col("n").cast("double") * F.col("n").cast("double")))
    stats = s.select("pos", mu.alias("mu"),
                     F.sqrt(var).alias("sd")).filter(F.col("sd") > 0)
    z = (F.col("xq").cast("double") - F.col("mu")) / F.col("sd")
    z2 = z * z  # explicit multiply: pow(x, 2) is not bit-identical across libms
    scored = (lng.join(F.broadcast(stats), "pos")
              .select("vec_id", "label",
                      F.floor(z2 * 1000000).cast("long").alias("t")))
    return (scored.groupBy("vec_id", "label")
            .agg(F.sum("t").alias("maha2_micro"))
            .orderBy(F.desc("maha2_micro"), "vec_id")
            .limit(_TOPK_OUT))


OUTLIER_SQL = f"""
WITH {_LONG_SQL},
s AS (
  SELECT pos, count(*) AS n, CAST(sum(xq) AS BIGINT) AS sx,
         CAST(sum(xq * xq) AS BIGINT) AS sx2
  FROM longq GROUP BY pos
),
stats AS (
  SELECT pos, CAST(sx AS DOUBLE) / n AS mu,
         sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS sd
  FROM s
  WHERE CAST(n * sx2 - sx * sx AS DOUBLE) > 0
),
scored AS (
  SELECT l.vec_id, l.label,
         CAST(floor(((CAST(l.xq AS DOUBLE) - st.mu) / st.sd)
                    * ((CAST(l.xq AS DOUBLE) - st.mu) / st.sd)
                    * 1000000) AS BIGINT) AS tmic
  FROM longq l JOIN stats st ON st.pos = l.pos
)
SELECT vec_id, label, CAST(sum(tmic) AS BIGINT) AS maha2_micro
FROM scored
GROUP BY vec_id, label
ORDER BY maha2_micro DESC, vec_id
LIMIT {_TOPK_OUT}
"""


QUERIES["embedding_outlier_zscore"] = (embedding_outlier_zscore,
                                       OUTLIER_SQL)


def embedding_quantization_error(spark: SparkSession, sf: str) -> DataFrame:
    """Per-dimension int8 calibration audit — the reconstruction-error
    side of the compression story ann_quantized_recall tells from the
    retrieval side: symmetric per-DIM max-abs scales (the layout a
    columnar vector store actually calibrates), round-half-up
    quantization, and the worst / mean absolute dequantization error
    per dimension in micro units plus the worst relative error in ppm
    of the dim's scale.  Dims whose max_rel_err_ppm spikes are the ones
    that need per-block scales.

    Exactness: dim values land on the floor(x*1e6) integer grid
    (_long_q); quantize/dequantize are single double expressions over
    those integers (identical trees both engines), errors floored back
    to micro ints so the per-dim sums are exact integer aggregates.

    Scale: one exploded pass (n x 64 rows) with a map-side-combined
    per-dim max, a 64-row broadcast back, then one more per-dim agg —
    no shuffle keyed by anything wider than the 64-dim domain."""
    lng = _long_q(spark, sf)
    amax = (lng.groupBy("pos")
            .agg(F.max(F.abs(F.col("xq"))).alias("amax")))
    d = "double"
    j = lng.join(F.broadcast(amax), "pos")
    q = F.floor(F.col("xq").cast(d) * 127.0 / F.col("amax").cast(d) + 0.5)
    err = F.abs(q * F.col("amax").cast(d) / 127.0 - F.col("xq").cast(d))
    per = (j.select("pos", "amax",
                    F.floor(err).cast("long").alias("err_u"))
           .groupBy("pos", "amax")
           .agg(F.count(F.lit(1)).alias("n"),
                F.max("err_u").alias("max_err"),
                F.sum("err_u").alias("sum_err")))
    return (per.select(
        F.col("pos").alias("dim"), "n",
        F.col("amax").alias("amax_micro"),
        F.col("max_err").alias("max_abs_err_micro"),
        F.floor(F.col("sum_err").cast(d) / F.col("n").cast(d))
        .cast("long").alias("mean_abs_err_micro"),
        F.floor(F.col("max_err").cast(d) * 1000000.0
                / F.col("amax").cast(d)).cast("long")
        .alias("max_rel_err_ppm"))
        .orderBy("dim"))


QUANT_ERR_SQL = f"""
WITH {_LONG_SQL},
amax AS (
  SELECT pos, max(abs(xq)) AS amax FROM longq GROUP BY pos
),
errs AS (
  SELECT l.pos, a.amax,
         CAST(floor(abs(
           floor(CAST(l.xq AS DOUBLE) * 127.0 / CAST(a.amax AS DOUBLE) + 0.5)
           * CAST(a.amax AS DOUBLE) / 127.0
           - CAST(l.xq AS DOUBLE))) AS BIGINT) AS err_u
  FROM longq l JOIN amax a ON l.pos = a.pos
)
SELECT pos AS dim, count(*) AS n, amax AS amax_micro,
       max(err_u) AS max_abs_err_micro,
       CAST(floor(CAST(CAST(sum(err_u) AS BIGINT) AS DOUBLE)
                  / CAST(count(*) AS DOUBLE)) AS BIGINT)
         AS mean_abs_err_micro,
       CAST(floor(CAST(max(err_u) AS DOUBLE) * 1000000.0
                  / CAST(amax AS DOUBLE)) AS BIGINT) AS max_rel_err_ppm
FROM errs
GROUP BY pos, amax
ORDER BY dim
"""


QUERIES["embedding_quantization_error"] = (
    embedding_quantization_error, QUANT_ERR_SQL)


def ann_mips_vs_cosine(spark: SparkSession, sf: str) -> DataFrame:
    """Maximum-inner-product retrieval vs cosine retrieval — the audit
    that shows why a recommender serving raw dot products cannot reuse
    a cosine ANN index unchanged: per query, the exact MIPS top-5 and
    cosine top-5 over the integer embedding grid, their overlap, and
    both top-1 ids.  (The classical fix is the norm-augmentation
    transform [x, sqrt(M^2-|x|^2)], which makes every item norm equal
    sqrt(M^2) so cosine order == inner-product order; the overlap
    deficit reported here is exactly what that transform repairs.)

    Exactness: scores are exact integer dot products on the
    floor(x*1e6) grid (_long_q); cosine ranking compares ip^2 * sign
    against norm products in INTEGERS (cross-multiplied, no sqrt), so
    both rankings are engine-portable with vec_id tiebreaks.

    Scale: queries (5 x 64 long rows) broadcast onto the corpus long
    form; per-(query, item) map-side dot-product agg; the corpus never
    shuffles; top-k via per-query WindowGroupLimit."""
    lng = _long_q(spark, sf)
    corp = lng.filter(F.col("vec_id") >= 5)
    qs = (lng.filter(F.col("vec_id") < 5)
          .select(F.col("vec_id").alias("query_id"), "pos",
                  F.col("xq").alias("qq")))
    ip = (corp.join(F.broadcast(qs), "pos")
          .groupBy("query_id", "vec_id")
          .agg(F.sum(F.col("xq") * F.col("qq")).alias("ip"),
               F.sum(F.col("xq") * F.col("xq")).alias("n2")))
    # cosine order: ip / sqrt(n2) per query (query norm is constant
    # within a partition) — compare via sign(ip) * ip^2 / n2 in exact
    # cross-multiplied integers: rank by (sign, ip*ip <cross> n2)
    d = "double"
    cos_key = (F.signum(F.col("ip").cast(d))
               * F.col("ip").cast(d) * F.col("ip").cast(d)
               / F.col("n2").cast(d))
    w_ip = Window.partitionBy("query_id").orderBy(
        F.desc("ip"), "vec_id")
    w_cos = Window.partitionBy("query_id").orderBy(
        F.desc(cos_key), "vec_id")
    ranked = (ip.withColumn("r_ip", F.row_number().over(w_ip))
              .withColumn("r_cos", F.row_number().over(w_cos))
              .filter((F.col("r_ip") <= 5) | (F.col("r_cos") <= 5)))
    per_q = ranked.groupBy("query_id").agg(
        F.sum(F.when((F.col("r_ip") <= 5) & (F.col("r_cos") <= 5), 1)
              .otherwise(0)).alias("overlap_at_5"),
        F.max(F.when(F.col("r_ip") == 1, F.col("vec_id")))
        .alias("mips_top1"),
        F.max(F.when(F.col("r_cos") == 1, F.col("vec_id")))
        .alias("cosine_top1"),
        F.max(F.when(F.col("r_ip") == 1, F.col("ip"))).alias("mips_top1_ip"))
    return per_q.orderBy("query_id")


MIPS_SQL = f"""
WITH {_LONG_SQL},
corp AS (SELECT vec_id, pos, xq FROM longq WHERE vec_id >= 5),
qs AS (SELECT vec_id AS query_id, pos, xq AS qq FROM longq
       WHERE vec_id < 5),
ip AS (
  SELECT q.query_id, c.vec_id,
         CAST(sum(c.xq * q.qq) AS BIGINT) AS ip,
         CAST(sum(c.xq * c.xq) AS BIGINT) AS n2
  FROM corp c JOIN qs q ON c.pos = q.pos
  GROUP BY 1, 2
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY ip DESC, vec_id) AS r_ip,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sign(CAST(ip AS DOUBLE))
                                  * CAST(ip AS DOUBLE) * CAST(ip AS DOUBLE)
                                  / CAST(n2 AS DOUBLE) DESC, vec_id)
           AS r_cos
  FROM ip
)
SELECT query_id,
       CAST(sum(CASE WHEN r_ip <= 5 AND r_cos <= 5 THEN 1 ELSE 0 END)
            AS BIGINT) AS overlap_at_5,
       max(CASE WHEN r_ip = 1 THEN vec_id END) AS mips_top1,
       max(CASE WHEN r_cos = 1 THEN vec_id END) AS cosine_top1,
       max(CASE WHEN r_ip = 1 THEN ip END) AS mips_top1_ip
FROM ranked
WHERE r_ip <= 5 OR r_cos <= 5
GROUP BY query_id
ORDER BY query_id
"""


QUERIES["ann_mips_vs_cosine"] = (ann_mips_vs_cosine, MIPS_SQL)


_FS_K = 5
_FS_LABEL = 1


def ann_filtered_search(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered vector search, pre- vs post-filter — THE operational
    question of metadata-constrained ANN: per query, (a) the true
    top-5 among label=1 corpus vectors (pre-filter: exact over the
    restricted corpus) vs (b) post-filtering an UNfiltered top-20 down
    to label=1 — reporting how many of the true top-5 the post-filter
    path recovers and whether it even fills 5 slots.  Recall loss here
    is the reason serious vector stores push predicates INTO the index
    rather than filtering afterwards.

    Exactness: integer-grid dot products (the ann_mips_vs_cosine
    machinery), cosine rank keys cross-multiplied — no sqrt; vec_id
    tiebreaks everywhere.

    Scale: same broadcast-queries / corpus-never-shuffles shape as
    ann_brute_force; both rankings come from one scored table with
    per-query WindowGroupLimits."""
    lng = _long_q(spark, sf)
    corp = lng.filter(F.col("vec_id") >= 5)
    qs = (lng.filter(F.col("vec_id") < 5)
          .select(F.col("vec_id").alias("query_id"), "pos",
                  F.col("xq").alias("qq")))
    labels = (t(spark, sf, "embeddings")
              .filter(F.col("vec_id") >= 5).select("vec_id", "label"))
    ip = (corp.join(F.broadcast(qs), "pos")
          .groupBy("query_id", "vec_id")
          .agg(F.sum(F.col("xq") * F.col("qq")).alias("ip"),
               F.sum(F.col("xq") * F.col("xq")).alias("n2"))
          .join(labels, "vec_id"))
    d = "double"
    cos_key = (F.signum(F.col("ip").cast(d))
               * F.col("ip").cast(d) * F.col("ip").cast(d)
               / F.col("n2").cast(d))
    w_pre = Window.partitionBy("query_id").orderBy(
        F.desc(cos_key), "vec_id")
    w_all = Window.partitionBy("query_id").orderBy(
        F.desc(cos_key), "vec_id")
    pre = (ip.filter(F.col("label") == _FS_LABEL)
           .withColumn("r", F.row_number().over(w_pre))
           .filter(F.col("r") <= _FS_K)
           .select("query_id", "vec_id", F.lit(1).alias("in_pre")))
    post = (ip.withColumn("r_all", F.row_number().over(w_all))
            .filter(F.col("r_all") <= 4 * _FS_K)
            .filter(F.col("label") == _FS_LABEL)
            .select("query_id", "vec_id", F.lit(1).alias("in_post")))
    j = pre.join(post, ["query_id", "vec_id"], "full")
    per_q = (j.groupBy("query_id")
             .agg(F.sum(F.coalesce("in_pre", F.lit(0))).alias("n_true"),
                  F.sum(F.coalesce("in_post", F.lit(0))).alias("n_post"),
                  F.sum(F.when(F.col("in_pre").isNotNull()
                               & F.col("in_post").isNotNull(), 1)
                        .otherwise(0)).alias("recovered")))
    return (per_q.select(
        "query_id", "n_true", "n_post", "recovered",
        F.floor(F.col("recovered") * 1000000 / F.col("n_true"))
        .cast("long").alias("postfilter_recall_micro"),
        (F.col("n_post") < _FS_K).alias("underfilled"))
        .orderBy("query_id"))


FILTERED_SQL = f"""
WITH {_LONG_SQL},
corp AS (SELECT vec_id, pos, xq FROM longq WHERE vec_id >= 5),
qs AS (SELECT vec_id AS query_id, pos, xq AS qq FROM longq
       WHERE vec_id < 5),
ip AS (
  SELECT q.query_id, c.vec_id,
         CAST(sum(c.xq * q.qq) AS BIGINT) AS ip,
         CAST(sum(c.xq * c.xq) AS BIGINT) AS n2
  FROM corp c JOIN qs q ON c.pos = q.pos
  GROUP BY 1, 2
),
lab AS (
  SELECT i.*, e.label
  FROM ip i JOIN embeddings e ON e.vec_id = i.vec_id
),
scored AS (
  SELECT *, sign(CAST(ip AS DOUBLE)) * CAST(ip AS DOUBLE)
            * CAST(ip AS DOUBLE) / CAST(n2 AS DOUBLE) AS ck
  FROM lab
),
pre AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ck DESC, vec_id) AS r
    FROM scored WHERE label = {_FS_LABEL}
  ) WHERE r <= {_FS_K}
),
post AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id, label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY ck DESC, vec_id) AS r_all
    FROM scored
  ) WHERE r_all <= {4 * _FS_K} AND label = {_FS_LABEL}
),
j AS (
  SELECT COALESCE(a.query_id, b.query_id) AS query_id,
         CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END AS in_pre,
         CASE WHEN b.vec_id IS NOT NULL THEN 1 ELSE 0 END AS in_post
  FROM pre a FULL OUTER JOIN post b
    ON a.query_id = b.query_id AND a.vec_id = b.vec_id
)
SELECT query_id, CAST(sum(in_pre) AS BIGINT) AS n_true,
       CAST(sum(in_post) AS BIGINT) AS n_post,
       CAST(sum(in_pre * in_post) AS BIGINT) AS recovered,
       CAST(floor(sum(in_pre * in_post) * 1000000 / sum(in_pre))
            AS BIGINT) AS postfilter_recall_micro,
       sum(in_post) < {_FS_K} AS underfilled
FROM j
GROUP BY query_id
ORDER BY query_id
"""


QUERIES["ann_filtered_search"] = (ann_filtered_search, FILTERED_SQL)
