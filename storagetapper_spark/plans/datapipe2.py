"""Query batch: training-data hygiene round 4 — benchmark-contamination
detection/removal and the composite quality gate.

The benchmark set fixture is the deterministic slice
``doc_id % 37 == 0`` of the documents table (both engines compute it
identically), standing in for a held-out eval set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.operators import contamination as C
from storagetapper_spark.operators import text as X
from storagetapper_spark.plans.common import t

_SHINGLE_N = 3

# DuckDB mirror of the lookahead-regex shingling (same normalization and
# short-doc branch as datapipe._mh_sql)
_SHINGLES_CTE = f"""
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT doc_id, string_split(nt, ' ') AS w FROM norm
), sh AS (
  SELECT doc_id,
         CASE WHEN len(w) < {_SHINGLE_N} THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(range(1, len(w) - {_SHINGLE_N - 1} + 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS shingles
  FROM toks
), ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
)"""


def contamination_check(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    return C.contamination_check(docs, bench, shingle_n=_SHINGLE_N,
                                 threshold_num=1, threshold_den=5)


CONTAMINATION_SQL = f"""
WITH {_SHINGLES_CTE},
bench_sh AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % 37 = 0
),
totals AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM ex GROUP BY doc_id
),
shared AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
  FROM ex WHERE s IN (SELECT s FROM bench_sh)
  GROUP BY doc_id
)
SELECT t.doc_id, t.n_shingles,
       CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
       round(coalesce(sh.n_shared, 0) / t.n_shingles, 4) AS contam_ratio,
       coalesce(sh.n_shared, 0) * 5 >= t.n_shingles AS contaminated
FROM totals t LEFT JOIN shared sh ON t.doc_id = sh.doc_id
"""


def decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """The action form: corpus minus contaminated docs (anti-join).
    Text column dropped from the output so the result ships metadata
    only — the kept-id set is what downstream stages consume."""
    docs = t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    return (C.decontaminate(docs, bench, shingle_n=_SHINGLE_N,
                            threshold_num=1, threshold_den=5)
            .select("doc_id", "lang", "source", "n_chars"))


DECONTAMINATE_SQL = f"""
WITH {_SHINGLES_CTE},
bench_sh AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % 37 = 0
),
totals AS (
  SELECT doc_id, count(*) AS n_shingles FROM ex GROUP BY doc_id
),
shared AS (
  SELECT doc_id, count(*) AS n_shared
  FROM ex WHERE s IN (SELECT s FROM bench_sh)
  GROUP BY doc_id
),
flagged AS (
  SELECT t.doc_id
  FROM totals t LEFT JOIN shared sh ON t.doc_id = sh.doc_id
  WHERE coalesce(sh.n_shared, 0) * 5 >= t.n_shingles
)
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
"""


# --- composite quality gate (keep/drop + reasons) ------------------------

def quality_gate(spark: SparkSession, sf: str) -> DataFrame:
    """The C4/Gopher-style keep/drop decision: combine the quality
    features into a boolean gate plus a machine-readable reason list.
    Pure column expressions over one scan — the filter every corpus
    build runs before tokenization.  Thresholds compare ratios computed
    identically in both engines (rounded before comparison so the gate
    is engine-deterministic)."""
    docs = t(spark, sf, "documents").select("doc_id", "text")
    q = X.quality_features(docs).drop("text")
    too_short = F.col("n_words") < 10
    too_digity = F.col("digit_ratio") > 0.3
    low_quality = F.col("quality_score") < 0.3
    reasons = F.concat_ws(
        ",",
        F.when(too_short, F.lit("too_short")),
        F.when(too_digity, F.lit("too_many_digits")),
        F.when(low_quality, F.lit("low_quality")))
    return q.select(
        "doc_id", "n_words", "digit_ratio", "quality_score",
        (~(too_short | too_digity | low_quality)).alias("keep"),
        reasons.alias("drop_reasons"))


QUALITY_GATE_SQL = """
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars_calc,
         CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0 THEN 0
              ELSE length(trim(regexp_replace(text, '\\s+', ' ', 'g')))
                   - length(replace(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ', '')) + 1
         END AS n_words,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' the ', ''))) / 5 AS BIGINT)
         + CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' and ', ''))) / 5 AS BIGINT)
         + CAST((length(' ' || lower(text) || ' ') - length(replace(' ' || lower(text) || ' ', ' of ', ''))) / 4 AS BIGINT)
         AS stop_hits
  FROM documents
), feats AS (
  SELECT doc_id, n_words,
         round(n_digit / greatest(n_chars_calc, 1), 4) AS digit_ratio,
         round(least(1.0, n_words / 100.0) * 0.4
               + least(1.0, round(stop_hits / greatest(n_words, 1), 4) * 5) * 0.4
               + (1.0 - least(1.0, round(n_digit / greatest(n_chars_calc, 1), 4) * 5)) * 0.2,
               4) AS quality_score
  FROM base
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, digit_ratio, quality_score,
       NOT (n_words < 10 OR digit_ratio > 0.3 OR quality_score < 0.3) AS keep,
       concat_ws(',',
                 CASE WHEN n_words < 10 THEN 'too_short' END,
                 CASE WHEN digit_ratio > 0.3 THEN 'too_many_digits' END,
                 CASE WHEN quality_score < 0.3 THEN 'low_quality' END)
         AS drop_reasons
FROM feats
"""


# --- SRP-LSH approximate nearest neighbours ------------------------------

def ann_srp(spark: SparkSession, sf: str) -> DataFrame:
    """SRP-bucketed ANN (the 100 TB scale path: at ingest the bucket is
    a stored column and the corpus is partitioned by it, so serving is
    a co-located per-bucket scan).  The hyperplanes come from a seeded
    LCG — plain double literals folded into the plan on BOTH engines,
    and the dot-product fold order is identical (sequential
    left-to-right), so bucket bits are bit-exact reproducible and the
    whole pipeline has an exact DuckDB oracle."""
    from storagetapper_spark.operators import similarity as S
    emb = t(spark, sf, "embeddings")
    queries = (emb.filter(F.col("vec_id") < 5)
                  .select(F.col("vec_id").alias("query_id"), "embedding"))
    corpus = emb.filter(F.col("vec_id") >= 5)
    return S.lsh_topk(corpus, queries, k=5, n_planes=6, dim=64, seed=42)


def _srp_sql() -> str:
    from storagetapper_spark.operators.similarity import make_planes
    planes = make_planes(64, 6, 42)
    def bucket_expr(v: str) -> str:
        bits = []
        for i, p in enumerate(planes):
            lit = "[" + ", ".join(repr(x) for x in p) + "]"
            bits.append(f"(CASE WHEN list_dot_product({v}, {lit}) >= 0 "
                        f"THEN {1 << i} ELSE 0 END)")
        return " + ".join(bits)
    cos = ("round(list_dot_product(c.v, q.qv) / "
           "(sqrt(list_dot_product(c.v, c.v)) * "
           "sqrt(list_dot_product(q.qv, q.qv))), 6)")
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
                  {bucket_expr('CAST(embedding AS DOUBLE[])')} AS bucket
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             {bucket_expr('CAST(embedding AS DOUBLE[])')} AS bucket
      FROM embeddings WHERE vec_id >= 5),
scored AS (
  SELECT q.query_id, c.vec_id, {cos} AS cosine_sim
  FROM c JOIN q USING (bucket)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
            ORDER BY cosine_sim DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, vec_id, cosine_sim, rank FROM ranked WHERE rank <= 5
"""


# --- SRP-blocked embedding near-dup pairs --------------------------------

def dedup_embedding_srp(spark: SparkSession, sf: str) -> DataFrame:
    """SRP-bucket-blocked near-dup pairs — the scale path of
    ``dedup_embedding_cosine`` (label blocking needs labels; SRP blocks
    any corpus).  Per-block GEMM via applyInPandas; candidate pairs cut
    ~2^planes.  Threshold kept away from fixture cosine values so the
    round-6 comparison is engine-stable."""
    from storagetapper_spark.operators import similarity as S
    emb = t(spark, sf, "embeddings")
    return (S.embedding_near_dup(emb, threshold=0.4, n_planes=8, dim=64,
                                 seed=7)
             .select("id_a", "id_b", "cosine_sim"))


def _srp_near_dup_sql() -> str:
    from storagetapper_spark.operators.similarity import make_planes
    planes = make_planes(64, 8, 7)
    bits = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        bits.append(f"(CASE WHEN list_dot_product(v, {lit}) >= 0 "
                    f"THEN {1 << i} ELSE 0 END)")
    bucket = " + ".join(bits)
    cos = ("round(list_dot_product(a.v, b.v) / "
           "(sqrt(list_dot_product(a.v, a.v)) * "
           "sqrt(list_dot_product(b.v, b.v))), 6)")
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
buck AS (SELECT vec_id, v, {bucket} AS bucket FROM c)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine_sim
FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= 0.4
"""


# --- one-pass column profiling -------------------------------------------

def profile_documents(spark: SparkSession, sf: str) -> DataFrame:
    """ANALYZE-style stats for every documents column in one scan."""
    from storagetapper_spark.operators.profile import profile
    return profile(t(spark, sf, "documents"),
                   ["doc_id", "lang", "source", "n_chars"]) \
        .orderBy("column_name")


def _profile_sql() -> str:
    parts = []
    for c in ["doc_id", "lang", "source", "n_chars"]:
        parts.append(f"""
SELECT '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       min(CAST({c} AS VARCHAR)) AS min_val,
       max(CAST({c} AS VARCHAR)) AS max_val,
       round(avg(length(CAST({c} AS VARCHAR))), 4) AS avg_len
FROM documents""")
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


QUERIES = {
    "profile_documents": (profile_documents, _profile_sql()),
    "contamination_check": (contamination_check, CONTAMINATION_SQL),
    "decontaminate": (decontaminate, DECONTAMINATE_SQL),
    "quality_gate": (quality_gate, QUALITY_GATE_SQL),
    "ann_srp": (ann_srp, _srp_sql()),
    "dedup_embedding_srp": (dedup_embedding_srp, _srp_near_dup_sql()),
}


# ------------------------------- hash-sampled contamination screen ---

# keep a shingle iff its 60-bit md5 hash < 2^60 / 8 (p = 1/8): the
# benchmark's broadcast set and the per-doc counting work both shrink
# 8x, and shared_sampled/own_sampled stays an unbiased containment
# estimator (every shingle is kept independently of which side it is
# on, so the sample is consistent across corpus and benchmark).
_SCREEN_DIV = 8
_SCREEN_THETA = (1 << 60) // _SCREEN_DIV


def contamination_screen_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Audit of the hash-sampled contamination SCREEN against the exact
    check at the same 1/5 threshold: the screen estimates each doc's
    benchmark containment on the 1/8 hash-sampled shingle subspace
    (broadcast set and join work 8x smaller — the 100 TB remedy for
    contamination_check's full-benchmark broadcast), and this query
    reports the confusion counts (screen vs exact) plus recall.  The
    screen threshold is HALVED (1/10 vs the exact 1/5) and docs with
    fewer than 8 sampled shingles pass through (binomial noise at that
    size can mask true contamination) — the standard safety margin: a
    screen's false positives just re-run the exact check, its false
    negatives are silent leaks, so the margin buys recall with fp —
    the ann_truncation_recall / sketch_bloom_fp_audit pattern: the
    approximation ships WITH its measured error, never silently.

    One regex pass feeds both paths; sampled-ness is a property of the
    shingle's own hash, so the screen needs no second benchmark set —
    a doc shingle is a sampled-hit iff (benchmark-hit AND hash < θ)."""
    docs = t(spark, sf, "documents")
    ex = C.shingle_set(docs, shingle_n=_SHINGLE_N)
    bench_sh = (ex.filter(F.col("doc_id") % 37 == 0)
                .select("sh").distinct()
                .withColumn("hit", F.lit(1)))
    h60 = F.conv(F.substring(F.md5(F.col("sh")), 1, 15), 16, 10) \
        .cast("long")
    marked = (ex.join(F.broadcast(bench_sh), "sh", "left")
              .select("doc_id",
                      F.coalesce("hit", F.lit(0)).alias("hit"),
                      (h60 < F.lit(_SCREEN_THETA)).cast("int")
                      .alias("samp")))
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.sum("hit").alias("n_shared"),
        F.sum("samp").alias("n_samp"),
        F.sum(F.col("hit") * F.col("samp")).alias("n_shared_samp"))
    flagged = per_doc.select(
        (F.col("n_shared") * 5 >= F.col("n_sh")).cast("int")
        .alias("exact"),
        ((F.col("n_samp") < 8)
         | (F.col("n_shared_samp") * 10 >= F.col("n_samp"))).cast("int")
        .alias("screen"))
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("exact").alias("n_flagged_exact"),
        F.sum("screen").alias("n_flagged_screen"),
        F.sum(F.col("exact") * F.col("screen")).alias("tp"),
        F.sum(F.col("exact") * (1 - F.col("screen"))).alias("fn"),
        F.sum((1 - F.col("exact")) * F.col("screen")).alias("fp"))
    return agg.select(
        "n_docs", "n_flagged_exact", "n_flagged_screen", "tp", "fn", "fp",
        F.when(F.col("n_flagged_exact") > 0,
               F.floor(F.col("tp") * 1000000 / F.col("n_flagged_exact")))
        .otherwise(F.lit(1000000)).cast("long").alias("recall_micro"))


SCREEN_AUDIT_SQL = f"""
WITH {_SHINGLES_CTE},
bench_sh AS (
  SELECT DISTINCT s FROM ex WHERE doc_id % 37 = 0
),
marked AS (
  SELECT ex.doc_id,
         CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END AS hit,
         CASE WHEN CAST(('0x' || substring(md5(ex.s), 1, 15)) AS BIGINT)
                   < {_SCREEN_THETA} THEN 1 ELSE 0 END AS samp
  FROM ex LEFT JOIN bench_sh b ON ex.s = b.s
),
per_doc AS (
  SELECT doc_id, count(*) AS n_sh,
         CAST(sum(hit) AS BIGINT) AS n_shared,
         CAST(sum(samp) AS BIGINT) AS n_samp,
         CAST(sum(hit * samp) AS BIGINT) AS n_shared_samp
  FROM marked GROUP BY doc_id
),
flagged AS (
  SELECT CASE WHEN n_shared * 5 >= n_sh THEN 1 ELSE 0 END AS exact,
         CASE WHEN n_samp < 8 OR n_shared_samp * 10 >= n_samp
              THEN 1 ELSE 0 END AS screen
  FROM per_doc
)
SELECT count(*) AS n_docs,
       CAST(sum(exact) AS BIGINT) AS n_flagged_exact,
       CAST(sum(screen) AS BIGINT) AS n_flagged_screen,
       CAST(sum(exact * screen) AS BIGINT) AS tp,
       CAST(sum(exact * (1 - screen)) AS BIGINT) AS fn,
       CAST(sum((1 - exact) * screen) AS BIGINT) AS fp,
       CAST(CASE WHEN sum(exact) > 0
                 THEN floor(sum(exact * screen) * 1000000 / sum(exact))
                 ELSE 1000000 END AS BIGINT) AS recall_micro
FROM flagged
"""


QUERIES["contamination_screen_audit"] = (contamination_screen_audit,
                                         SCREEN_AUDIT_SQL)
