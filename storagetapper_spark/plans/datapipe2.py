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


QUERIES = {
    "contamination_check": (contamination_check, CONTAMINATION_SQL),
    "decontaminate": (decontaminate, DECONTAMINATE_SQL),
    "quality_gate": (quality_gate, QUALITY_GATE_SQL),
}
