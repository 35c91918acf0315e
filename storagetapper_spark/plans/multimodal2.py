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
    All integer math; the index list is exact in both engines.  The
    list is emitted as a comma-joined string (`frame_csv`) so every
    output column is scalar — downstream consumers that need the array
    split on ','; hash canonicalizers sort scalars directly."""
    docs = t(spark, sf, "documents")
    vids = (docs.filter(F.col("doc_id") % 3 == 2)
            .select("doc_id",
                    F.octet_length("text").cast("long").alias("bytes")))
    dur_ms = F.col("bytes")  # 1 ms per byte, synthetic container meta
    n_frames = F.floor(dur_ms * _FPS / 1000).cast("long")
    idxs = F.transform(
        F.sequence(F.lit(0), F.lit(_N_SAMPLE - 1)),
        lambda i: F.floor(i * F.col("n_frames") / _N_SAMPLE)
        .cast("long").cast("string"))
    return (vids.select("doc_id", dur_ms.alias("duration_ms"),
                        n_frames.alias("n_frames"))
            .filter(F.col("n_frames") >= _N_SAMPLE)
            .select("doc_id", "duration_ms", "n_frames",
                    F.array_join(idxs, ",").alias("frame_csv"))
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
       array_to_string(
         list_transform(range(0, {_N_SAMPLE}),
                        i -> CAST(CAST(floor(i * n_frames / {_N_SAMPLE})
                                       AS BIGINT) AS VARCHAR)),
         ',') AS frame_csv
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


_AH_HAM_MAX = 8


def multimodal_ahash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection for the image modality
    (doc_id % 3 == 0): an 8x8 average-hash (aHash) per payload, LSH
    banding on 16-bit hash quarters for candidate generation, and
    bit_count-Hamming verification — the image twin of the SimHash
    text dedup (operators/dedup.py:422).

    The 64 "pixels" are a deterministic decode-and-downsample stand-in
    (first md5 byte of the i-th length/64 window of the normalized
    payload — the MEDIA_CODECS fake-codec convention), so the whole
    pipeline is JVM-side expression work the oracle replays
    bit-for-bit; a real deployment swaps the pixel stage for the
    Pillow decode + 8x8 downsample in operators/multimodal.py and
    keeps the banding + verification stages unchanged.  The windowed
    pixels ARE locality-preserving: at sf0.1 the 23 matched pairs all
    sit at Hamming <= 4 while the nearest non-duplicate pair is > 12.

    Scale: pixels explode to 64 rows/doc (single-reference projection
    — nesting the pixel array through chained lambdas re-inlines the
    64-way transform under CollapseProject, measured 19.6s -> 2s);
    the mean is a doc_id-partitioned 64-row window; candidates come
    from the band equi-join (never all pairs).  A band bucket only
    exceeds ~cluster size for identical-quarter clusters, the same
    exposure (and the same star-capping remedy) as
    dedup_minhash_lsh_star.  4 bands guarantee recall only for
    Hamming <= 3 (pigeonhole); the oracle replays the banding, so the
    recall trade is explicit, not silent."""
    from pyspark.sql import Window

    from storagetapper_spark.operators.text import normalize_text

    docs = t(spark, sf, "documents").filter(F.col("doc_id") % 3 == 0)
    sized = docs.select(
        "doc_id", normalize_text(F.col("text")).alias("norm"),
    ).select(
        "doc_id", "norm",
        F.greatest(F.lit(1), F.expr("length(norm) div 64"))
        .cast("int").alias("w"))
    px = sized.select(
        "doc_id",
        F.posexplode(F.expr(
            "transform(sequence(0, 63), i -> cast(conv(substring("
            "md5(substring(norm, i * w + 1, w)), 1, 2), 16, 10) "
            "as bigint))")).alias("i", "p"))
    win = Window.partitionBy("doc_id")
    hashed = (px.withColumn("s", F.sum("p").over(win))
              .groupBy("doc_id")
              .agg(F.sum(F.when((F.col("p") * 64 > F.col("s"))
                                & (F.col("i") < 32),
                                F.expr("shiftleft(1L, i)"))
                         .otherwise(F.lit(0))).alias("h1"),
                   F.sum(F.when((F.col("p") * 64 > F.col("s"))
                                & (F.col("i") >= 32),
                                F.expr("shiftleft(1L, i - 32)"))
                         .otherwise(F.lit(0))).alias("h2")))
    bands = hashed.selectExpr(
        "doc_id", "h1", "h2",
        "stack(4, 0, h1 & 65535, 1, shiftright(h1, 16) & 65535, "
        "2, h2 & 65535, 3, shiftright(h2, 16) & 65535) "
        "as (band_idx, band_val)")
    a, b = bands.alias("a"), bands.alias("b")
    cand = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
    ham = (F.bit_count(F.expr("a.h1 ^ b.h1"))
           + F.bit_count(F.expr("a.h2 ^ b.h2")))
    return (cand.select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"),
                        ham.cast("int").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= _AH_HAM_MAX)
            .orderBy("doc_a", "doc_b"))


AHASH_NEARDUP_SQL = f"""
WITH sized AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
  FROM documents WHERE doc_id % 3 = 0
),
wdocs AS (
  SELECT doc_id, norm, greatest(1, length(norm) // 64) AS w FROM sized
),
pixed AS (
  SELECT doc_id,
         list_transform(range(0, 64),
           i -> CAST(('0x' || substring(md5(substring(norm, i * w + 1, w)),
                                        1, 2)) AS BIGINT)) AS pix
  FROM wdocs
),
summed AS (
  SELECT doc_id, pix, CAST(list_sum(pix) AS BIGINT) AS s FROM pixed
),
hashed AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32),
           i -> CASE WHEN pix[i + 1] * 64 > s
                     THEN CAST(1 AS BIGINT) << i ELSE 0 END))
           AS BIGINT) AS h1,
         CAST(list_sum(list_transform(range(32, 64),
           i -> CASE WHEN pix[i + 1] * 64 > s
                     THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END))
           AS BIGINT) AS h2
  FROM summed
),
bands AS (
  SELECT doc_id, h1, h2, v.band_idx,
         CASE v.band_idx WHEN 0 THEN h1 & 65535
                         WHEN 1 THEN (h1 >> 16) & 65535
                         WHEN 2 THEN h2 & 65535
                         ELSE (h2 >> 16) & 65535 END AS band_val
  FROM hashed, (VALUES (0), (1), (2), (3)) AS v(band_idx)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.h1, b.h1))
              + bit_count(xor(a.h2, b.h2)) AS INTEGER) AS hamming
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM cand
WHERE hamming <= {_AH_HAM_MAX}
ORDER BY doc_a, doc_b
"""


QUERIES["multimodal_ahash_neardup"] = (multimodal_ahash_neardup,
                                       AHASH_NEARDUP_SQL)


# ---------------------------------------------------- pHash (DCT) ----

_PH_HAM_MAX = 10

# alpha(u)·cos((2x+1)·u·pi/16) flattened by x*8+u — the SAME literal
# table drives both separable DCT stages in both engines (doubles
# parsed from identical decimal literals are bit-identical; every
# stage quantizes to integer micro-units BEFORE its sum, so no
# cross-engine float-order hazard survives).
import math as _math

_DCT_W = [
    (_math.sqrt(1 / 8) if u == 0 else 0.5)
    * _math.cos((2 * x + 1) * u * _math.pi / 16)
    for x in range(8) for u in range(8)]
_DCT_W_LIT = ", ".join(repr(w) for w in _DCT_W)


def multimodal_phash_dct(spark: SparkSession, sf: str) -> DataFrame:
    """DCT perceptual hash (pHash) near-duplicate detection for the
    image modality — the frequency-domain sibling of
    multimodal_ahash_neardup: an 8x8 type-II DCT over the same
    fake-decode pixel grid, each of the 63 AC coefficients thresholded
    against their per-image MEDIAN → 63-bit hash → 16-bit band LSH →
    bit_count-Hamming verify.  pHash survives brightness/contrast
    shifts that flip aHash bits because the median-of-AC threshold is
    invariant to affine pixel rescaling (both DCT and median are
    affine-equivariant).

    The DCT is SEPARABLE: stage 1 transforms rows (8-way fan-out,
    micro-floored terms, integer sums), stage 2 transforms columns —
    2x8 explode instead of the naive 64-way outer product.  The
    median is an exact within-image order statistic (row_number over
    63 rows per image, rank 32, deterministic (value, k) tie-break).
    Banding/verification reuse the aHash tail: candidates from the
    band equi-join, never all pairs."""
    from pyspark.sql import Window

    from storagetapper_spark.operators.text import normalize_text

    docs = t(spark, sf, "documents").filter(F.col("doc_id") % 3 == 0)
    sized = docs.select(
        "doc_id", normalize_text(F.col("text")).alias("norm"),
    ).select(
        "doc_id", "norm",
        F.greatest(F.lit(1), F.expr("length(norm) div 64"))
        .cast("int").alias("w"))
    px = sized.select(
        "doc_id",
        F.posexplode(F.expr(
            "transform(sequence(0, 63), i -> cast(conv(substring("
            "md5(substring(norm, i * w + 1, w)), 1, 2), 16, 10) "
            "as bigint))")).alias("i", "p"))
    cw = f"array({_DCT_W_LIT})"
    # stage 1: DCT along x for each pixel column y
    s1 = (px.select(
        "doc_id", (F.col("i") % 8).alias("y"),
        F.col("p"), (F.col("i") / 8).cast("int").alias("x"),
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("u"))
        .select("doc_id", "y", "u",
                F.floor(F.col("p")
                        * F.expr(f"element_at({cw}, x * 8 + u + 1)")
                        * 1000000.0).cast("long").alias("t"))
        .groupBy("doc_id", "u", "y")
        .agg(F.sum("t").alias("t_micro")))
    # stage 2: DCT along y
    s2 = (s1.select(
        "doc_id", "u", "t_micro", "y",
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("v"))
        .select("doc_id", "u", "v",
                F.floor(F.col("t_micro")
                        * F.expr(f"element_at({cw}, y * 8 + v + 1)"))
                .cast("long").alias("c"))
        .groupBy("doc_id", "u", "v")
        .agg(F.sum("c").alias("c_micro")))
    ac = (s2.select("doc_id",
                    (F.col("u") * 8 + F.col("v")).alias("k"), "c_micro")
          .filter(F.col("k") >= 1))
    wrank = Window.partitionBy("doc_id").orderBy("c_micro", "k")
    wdoc = Window.partitionBy("doc_id")
    med = (ac.withColumn("rn", F.row_number().over(wrank))
           .withColumn("med", F.max(F.when(F.col("rn") == 32,
                                           F.col("c_micro"))).over(wdoc)))
    hashed = (med.groupBy("doc_id")
              .agg(F.sum(F.when((F.col("c_micro") > F.col("med"))
                                & (F.col("k") < 32),
                                F.expr("shiftleft(1L, k)"))
                         .otherwise(F.lit(0))).alias("h1"),
                   F.sum(F.when((F.col("c_micro") > F.col("med"))
                                & (F.col("k") >= 32),
                                F.expr("shiftleft(1L, k - 32)"))
                         .otherwise(F.lit(0))).alias("h2")))
    bands = hashed.selectExpr(
        "doc_id", "h1", "h2",
        "stack(4, 0, h1 & 65535, 1, shiftright(h1, 16) & 65535, "
        "2, h2 & 65535, 3, shiftright(h2, 16) & 65535) "
        "as (band_idx, band_val)")
    a, b = bands.alias("a"), bands.alias("b")
    cand = a.join(
        b,
        (F.col("a.band_idx") == F.col("b.band_idx"))
        & (F.col("a.band_val") == F.col("b.band_val"))
        & (F.col("a.doc_id") < F.col("b.doc_id")))
    ham = (F.bit_count(F.expr("a.h1 ^ b.h1"))
           + F.bit_count(F.expr("a.h2 ^ b.h2")))
    return (cand.select(F.col("a.doc_id").alias("doc_a"),
                        F.col("b.doc_id").alias("doc_b"),
                        ham.cast("int").alias("hamming"))
            .distinct()
            .filter(F.col("hamming") <= _PH_HAM_MAX)
            .orderBy("doc_a", "doc_b"))


PHASH_SQL = f"""
WITH sized AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
  FROM documents WHERE doc_id % 3 = 0
),
wdocs AS (
  SELECT doc_id, norm, greatest(1, length(norm) // 64) AS w FROM sized
),
px AS (
  SELECT doc_id, i.range AS i,
         CAST(('0x' || substring(md5(substring(norm,
                CAST(i.range AS INTEGER) * w + 1, w)), 1, 2))
              AS BIGINT) AS p
  FROM wdocs CROSS JOIN range(64) i
),
s1 AS (
  SELECT doc_id, u.range AS u, i % 8 AS y,
         CAST(sum(CAST(floor(p * ([{_DCT_W_LIT}])
                             [(i // 8) * 8 + u.range + 1]
                             * 1000000.0) AS BIGINT)) AS BIGINT)
           AS t_micro
  FROM px CROSS JOIN range(8) u
  GROUP BY doc_id, u.range, i % 8
),
s2 AS (
  SELECT doc_id, u, v.range AS v,
         CAST(sum(CAST(floor(t_micro * ([{_DCT_W_LIT}])
                             [y * 8 + v.range + 1]) AS BIGINT))
              AS BIGINT) AS c_micro
  FROM s1 CROSS JOIN range(8) v
  GROUP BY doc_id, u, v.range
),
ac AS (
  SELECT doc_id, u * 8 + v AS k, c_micro FROM s2 WHERE u * 8 + v >= 1
),
med AS (
  SELECT doc_id, k, c_micro,
         max(CASE WHEN rn = 32 THEN c_micro END)
           OVER (PARTITION BY doc_id) AS med
  FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c_micro, k) AS rn
        FROM ac)
),
hashed AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN c_micro > med AND k < 32
                       THEN (CAST(1 AS BIGINT) << k) ELSE 0 END)
              AS BIGINT) AS h1,
         CAST(sum(CASE WHEN c_micro > med AND k >= 32
                       THEN (CAST(1 AS BIGINT) << (k - 32)) ELSE 0 END)
              AS BIGINT) AS h2
  FROM med GROUP BY doc_id
),
bands AS (
  SELECT doc_id, h1, h2, b.range AS band_idx,
         CASE b.range
           WHEN 0 THEN h1 & 65535
           WHEN 1 THEN (h1 >> 16) & 65535
           WHEN 2 THEN h2 & 65535
           ELSE (h2 >> 16) & 65535 END AS band_val
  FROM hashed CROSS JOIN range(4) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.h1, b.h1)) + bit_count(xor(a.h2, b.h2))
           AS hamming
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(hamming AS INTEGER) AS hamming
FROM cand WHERE hamming <= {_PH_HAM_MAX}
ORDER BY doc_a, doc_b
"""


QUERIES["multimodal_phash_dct"] = (multimodal_phash_dct, PHASH_SQL)


_AC_WIN_MS = 30000
_AC_STRIDE_MS = 25000


def multimodal_audio_chunk_plan(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping audio-chunk schedule per audio item (the
    Whisper-style 30s window / 25s stride plan): synthetic duration
    (1 ms per payload byte, the multimodal_frame_plan convention),
    chunk i covers [i*stride, min(i*stride + window, dur)); the last
    chunk's padding and the total overlap are accounted exactly — the
    numbers a transcription pipeline needs to budget decode compute
    BEFORE running any codec (the decode UDF itself stays behind
    MEDIA_CODECS).

    All integer math via a sequence() generator per item; per-item
    aggregates (chunk count, padded ms, overlap ms) — nothing
    row-scaled beyond n_items x n_chunks."""
    docs = t(spark, sf, "documents")
    auds = (docs.filter(F.col("doc_id") % 3 == 1)
            .select("doc_id",
                    F.octet_length("text").cast("long").alias("dur_ms")))
    n_chunks = F.when(
        F.col("dur_ms") <= _AC_WIN_MS, F.lit(1)).otherwise(
        1 + F.ceil((F.col("dur_ms") - _AC_WIN_MS)
                   / F.lit(float(_AC_STRIDE_MS))).cast("long"))
    items = auds.withColumn("n_chunks", n_chunks.cast("long"))
    chunks = (items.select(
        "doc_id", "dur_ms", "n_chunks",
        F.explode(F.sequence(F.lit(0),
                             F.col("n_chunks") - 1)).alias("i"))
        .withColumn("start_ms", F.col("i") * _AC_STRIDE_MS)
        .withColumn("end_ms", F.least(F.col("start_ms") + _AC_WIN_MS,
                                      F.col("dur_ms"))))
    per_item = (chunks.groupBy("doc_id", "dur_ms", "n_chunks")
                .agg(F.sum(F.col("end_ms") - F.col("start_ms"))
                     .alias("covered_ms"),
                     F.sum(F.lit(_AC_WIN_MS)
                           - (F.col("end_ms") - F.col("start_ms")))
                     .alias("padded_ms")))
    return (per_item.select(
        "doc_id", "dur_ms", "n_chunks", "padded_ms",
        (F.col("covered_ms") - F.col("dur_ms")).alias("overlap_ms"),
        F.floor((F.col("n_chunks") * _AC_WIN_MS) * 1000000
                / F.col("dur_ms")).cast("long")
        .alias("decode_cost_ppm_of_dur"))
        .orderBy("doc_id"))


AUDIO_CHUNK_SQL = f"""
WITH auds AS (
  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS dur_ms
  FROM documents WHERE doc_id % 3 = 1
),
items AS (
  SELECT *, CASE WHEN dur_ms <= {_AC_WIN_MS} THEN 1
                 ELSE 1 + CAST(ceil((dur_ms - {_AC_WIN_MS})
                               / CAST({_AC_STRIDE_MS} AS DOUBLE))
                          AS BIGINT) END AS n_chunks
  FROM auds
),
chunks AS (
  SELECT doc_id, dur_ms, n_chunks, t.i * {_AC_STRIDE_MS} AS start_ms,
         least(t.i * {_AC_STRIDE_MS} + {_AC_WIN_MS}, dur_ms) AS end_ms
  FROM items, unnest(range(0, n_chunks)) AS t(i)
),
per_item AS (
  SELECT doc_id, dur_ms, n_chunks,
         CAST(sum(end_ms - start_ms) AS BIGINT) AS covered_ms,
         CAST(sum({_AC_WIN_MS} - (end_ms - start_ms)) AS BIGINT)
           AS padded_ms
  FROM chunks GROUP BY 1, 2, 3
)
SELECT doc_id, dur_ms, n_chunks, padded_ms,
       covered_ms - dur_ms AS overlap_ms,
       CAST(floor((n_chunks * {_AC_WIN_MS}) * 1000000 / dur_ms)
            AS BIGINT) AS decode_cost_ppm_of_dur
FROM per_item
ORDER BY doc_id
"""


QUERIES["multimodal_audio_chunk_plan"] = (multimodal_audio_chunk_plan,
                                          AUDIO_CHUNK_SQL)
