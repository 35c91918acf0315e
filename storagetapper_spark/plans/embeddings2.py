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

from pyspark.sql import DataFrame, SparkSession
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
