"""Multimodal planning batch 2: frame-sampling plans and the storage
report — the JVM-side planning layer that feeds the mapInPandas decode
stage (operators/multimodal.py; codecs env-gated behind MEDIA_CODECS).

Follows datapipe3.multimodal_manifest's fixture convention: document
text stands in for payload bytes, modality is the deterministic
doc_id%3 hash, and synthetic container metadata derives from byte
size — so every plan column is exact integer arithmetic the oracle
replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_FPS = 30
_N_SAMPLE = 8


def multimodal_frame_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Uniform frame-sampling plan per video item: synthetic duration
    (1 ms per payload byte), 30 fps, 8 uniformly-spaced frame indices
    computed as a pure array expression — the deterministic plan the
    decode UDF consumes (each executor seeks exactly these frames, so
    the decode stage reads k frames per item, never the whole stream).
    All integer math; the index list is exact in both engines."""
    docs = t(spark, sf, "documents")
    vids = (docs.filter(F.col("doc_id") % 3 == 2)
            .select("doc_id",
                    F.octet_length("text").cast("long").alias("bytes")))
    dur_ms = F.col("bytes")  # 1 ms per byte, synthetic container meta
    n_frames = F.floor(dur_ms * _FPS / 1000).cast("long")
    idxs = F.transform(
        F.sequence(F.lit(0), F.lit(_N_SAMPLE - 1)),
        lambda i: F.floor(i * F.col("n_frames") / _N_SAMPLE)
        .cast("long"))
    return (vids.select("doc_id", dur_ms.alias("duration_ms"),
                        n_frames.alias("n_frames"))
            .filter(F.col("n_frames") >= _N_SAMPLE)
            .select("doc_id", "duration_ms", "n_frames",
                    idxs.alias("frame_indices"))
            .orderBy("doc_id"))


FRAME_PLAN_SQL = f"""
WITH vids AS (
  SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS bytes
  FROM documents WHERE doc_id % 3 = 2
),
meta AS (
  SELECT doc_id, bytes AS duration_ms,
         CAST(floor(bytes * {_FPS} / 1000) AS BIGINT) AS n_frames
  FROM vids
)
SELECT doc_id, duration_ms, n_frames,
       list_transform(range(0, {_N_SAMPLE}),
                      i -> CAST(floor(i * n_frames / {_N_SAMPLE})
                                AS BIGINT)) AS frame_indices
FROM meta WHERE n_frames >= {_N_SAMPLE}
ORDER BY doc_id
"""


QUERIES = {
    "multimodal_frame_plan": (multimodal_frame_plan, FRAME_PLAN_SQL),
}


def multimodal_storage_report(spark: SparkSession, sf: str) -> DataFrame:
    """Per-modality storage report: item count, total/avg bytes, exact
    median byte size, and the exact-dedup saving potential (1 −
    distinct payload hashes / items) — the capacity-planning readout
    before a media ingest.  One scan, one map-side-combined agg per
    modality (distinct hashes via a per-(modality, hash) pre-agg)."""
    docs = t(spark, sf, "documents")
    modality = (F.when(F.col("doc_id") % 3 == 0, "image")
                .when(F.col("doc_id") % 3 == 1, "audio")
                .otherwise("video"))
    base = docs.select(
        modality.alias("modality"),
        F.octet_length("text").cast("long").alias("bytes"),
        F.sha2(F.col("text"), 256).alias("h"))
    per_mod = (base.groupBy("modality")
               .agg(F.count(F.lit(1)).alias("n_items"),
                    F.sum("bytes").alias("total_bytes"),
                    F.floor(F.percentile("bytes", F.lit(0.5)))
                    .cast("long").alias("p50_bytes"),
                    F.countDistinct("h").alias("n_distinct")))
    dup_save = ((F.col("n_items") - F.col("n_distinct")) * 1000000
                / F.col("n_items"))
    return (per_mod.select(
        "modality", "n_items", "total_bytes", "p50_bytes",
        F.floor(F.col("total_bytes") / F.col("n_items")).cast("long")
        .alias("avg_bytes"),
        F.floor(dup_save).cast("long").alias("dup_saving_micro"))
        .orderBy("modality"))


STORAGE_REPORT_SQL = """
WITH base AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS modality,
         CAST(octet_length(encode(text)) AS BIGINT) AS bytes,
         sha256(text) AS h
  FROM documents
)
SELECT modality, count(*) AS n_items,
       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       CAST(floor(quantile_cont(bytes, 0.5)) AS BIGINT) AS p50_bytes,
       CAST(floor(CAST(sum(bytes) AS BIGINT) / count(*)) AS BIGINT)
         AS avg_bytes,
       CAST(floor((count(*) - count(DISTINCT h)) * 1000000 / count(*))
            AS BIGINT) AS dup_saving_micro
FROM base
GROUP BY modality
ORDER BY modality
"""


QUERIES["multimodal_storage_report"] = (multimodal_storage_report,
                                        STORAGE_REPORT_SQL)
