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
