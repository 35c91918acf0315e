"""Query batch: corpus-analysis operators for LLM training-data
pipelines, round 5 — cross-document repeated-passage detection (the
exact-substring dedup signal of Lee et al. 2022), tokenizer-training
prep (BPE first-round pair counts, Sennrich et al. 2016), IDF /
stopword discovery, and temperature-scaled source mixing (the
multi-domain sampling rule popularized by multilingual LM training).

All plans are narrow generators plus map-side-combinable keyed aggs —
no all-pairs, no windows over unbounded partitions, no Python.
Reference parity: these generalize storagetapper's row-key dedup and
partition-routing primitives to passage/token granularity for corpus
curation (see SURVEY.md §2.7 training-data addendum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.operators import text as X
from storagetapper_spark.plans.common import t

_K = 8            # passage window length (tokens)
_ALPHA = 0.3      # mixing temperature exponent
_BUDGET = 100000  # target corpus size (docs) for quota computation
_STOP_DF = 0.4    # document-frequency fraction above which a token is
                  # a discovered stopword


def text_repeated_passages(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document coverage of verbatim cross-duplicated k-token
    passages.  One tokenize pass, one gram-keyed agg, one gram-keyed
    left join, one doc-keyed agg (operators/text.repeated_passages)."""
    docs = t(spark, sf, "documents").select("doc_id", "text")
    return X.repeated_passages(docs, k=_K).orderBy("doc_id")


REPEATED_PASSAGES_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(w) >= {_K}
              THEN list_distinct([array_to_string(w[s:s + {_K - 1}], ' ')
                                  for s in generate_series(1, len(w) - {_K - 1})])
              ELSE CAST([] AS VARCHAR[]) END AS g
  FROM toks
),
ex AS (SELECT doc_id, unnest(g) AS gram FROM grams),
gd AS (
  SELECT gram, count(*) AS n_docs
  FROM ex GROUP BY gram HAVING count(*) >= 2
),
pd AS (
  SELECT e.doc_id,
         count(*) AS n_windows,
         count(gd.n_docs) AS n_dup_windows,
         max(gd.n_docs) AS max_spread
  FROM ex e LEFT JOIN gd USING (gram)
  GROUP BY e.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(pd.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(pd.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(pd.max_spread, 0) AS BIGINT) AS max_spread,
       CASE WHEN coalesce(pd.n_windows, 0) > 0
            THEN round(coalesce(pd.n_dup_windows, 0) / pd.n_windows, 6)
            ELSE 0.0 END AS dup_fraction
FROM documents d LEFT JOIN pd USING (doc_id)
ORDER BY d.doc_id
"""


def tokenizer_pair_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Top adjacent-token pairs corpus-wide — the candidate table for
    the first BPE merge.  Single map-side-combined count shuffle;
    deterministic tie-break by pair text."""
    docs = t(spark, sf, "documents").select("text")
    return (X.adjacent_pair_counts(docs)
            .orderBy(F.desc("n"), "pair")
            .limit(40))


TOKENIZER_PAIRS_SQL = """
WITH toks AS (
  SELECT string_split(text, ' ') AS w FROM documents
),
pairs AS (
  SELECT unnest([array_to_string(w[s:s + 1], ' ')
                 for s in generate_series(1, len(w) - 1)]) AS pair
  FROM toks WHERE len(w) >= 2
)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair
LIMIT 40
"""


def text_idf_stopwords(spark: SparkSession, sf: str) -> DataFrame:
    """Document-frequency table with IDF and threshold-discovered
    stopwords.  Per-doc array_distinct BEFORE the explode keeps the
    token agg a plain count (contamination_check's lesson); the corpus
    size joins in as a broadcast scalar."""
    docs = t(spark, sf, "documents").select("doc_id", "text")
    toks = F.array_distinct(F.split(F.col("text"), " "))
    ex = docs.select(F.explode(toks).alias("token"))
    df_tab = ex.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (df_tab.crossJoin(F.broadcast(total))
            .select("token",
                    F.col("df").cast("long").alias("df"),
                    F.round(F.log(F.col("n_docs") / F.col("df")), 6)
                     .alias("idf"),
                    (F.col("df") >= _STOP_DF * F.col("n_docs"))
                     .alias("is_stopword"))
            .orderBy(F.desc("df"), "token"))


IDF_STOPWORDS_SQL = f"""
WITH ex AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT token,
       CAST(count(*) AS BIGINT) AS df,
       round(ln(n.n_docs / count(*)), 6) AS idf,
       count(*) >= {_STOP_DF} * n.n_docs AS is_stopword
FROM ex, n
GROUP BY token, n.n_docs
ORDER BY df DESC, token
"""


def sample_temperature_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled multi-source mixing: sampling weight
    p_i^alpha / sum_j p_j^alpha per source plus the doc quota for a
    fixed training budget.  Upweights small sources / downweights
    dominant ones (alpha < 1).  Two broadcast-sized aggs — the corpus
    scan is one map-side-combined count by source."""
    docs = t(spark, sf, "documents").select("source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("total"),
                     F.sum(F.pow(F.col("n_docs"), F.lit(_ALPHA)))
                      .alias("z"))
    return (counts.crossJoin(F.broadcast(tot))
            .select("source",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.round(F.col("n_docs") / F.col("total"), 6)
                     .alias("p_raw"),
                    F.round(F.pow(F.col("n_docs"), F.lit(_ALPHA))
                            / F.col("z"), 6).alias("weight"),
                    # round, NOT floor: the quota expression can land
                    # exactly on an integer, where floor flips by the
                    # ulp-level summation-order of z across partitions
                    F.round(F.lit(_BUDGET)
                            * F.pow(F.col("n_docs"), F.lit(_ALPHA))
                            / F.col("z"), 0).cast("long").alias("quota"))
            .orderBy("source"))


TEMPERATURE_MIX_SQL = f"""
WITH counts AS (
  SELECT source, count(*) AS n_docs FROM documents GROUP BY source
),
tot AS (
  SELECT sum(n_docs) AS total, sum(pow(n_docs, {_ALPHA})) AS z FROM counts
)
SELECT c.source,
       CAST(c.n_docs AS BIGINT) AS n_docs,
       round(c.n_docs / t.total, 6) AS p_raw,
       round(pow(c.n_docs, {_ALPHA}) / t.z, 6) AS weight,
       CAST(round({_BUDGET} * pow(c.n_docs, {_ALPHA}) / t.z, 0) AS BIGINT)
         AS quota
FROM counts c, tot t
ORDER BY c.source
"""


def dedup_lsh_verified(spark: SparkSession, sf: str) -> DataFrame:
    """Two-stage near-dup pipeline endpoint: LSH candidates re-scored
    with EXACT shingle-set Jaccard, flagged at 0.5
    (operators/dedup.lsh_verified_pairs — sketch recall, exact
    precision; the re-score is candidate-bounded, never O(n^2))."""
    from storagetapper_spark.operators.dedup import lsh_verified_pairs
    from storagetapper_spark.plans.datapipe import _MH_HASHES, _SHINGLE_N

    return (lsh_verified_pairs(t(spark, sf, "documents"),
                               num_hashes=_MH_HASHES, bands=4,
                               shingle_n=_SHINGLE_N, threshold=0.5)
            .orderBy("id_a", "id_b"))


def _lsh_verified_sql() -> str:
    from storagetapper_spark.plans.datapipe import _SHINGLE_N, _lsh_sql

    n = _SHINGLE_N
    return f"""
WITH cand AS ({_lsh_sql()}),
norm AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT doc_id, string_split(nt, ' ') AS w FROM norm
), sh AS (
  SELECT doc_id,
         CASE WHEN len(w) < {n} THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(range(1, len(w) - {n - 1} + 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         END AS shingles
  FROM toks
), sized AS (
  SELECT doc_id, shingles, len(shingles) AS sz FROM sh
)
SELECT c.id_a, c.id_b, c.jaccard_est,
       round(len(list_intersect(a.shingles, b.shingles))
             / (a.sz + b.sz - len(list_intersect(a.shingles, b.shingles))),
             4) AS jaccard_exact,
       len(list_intersect(a.shingles, b.shingles))
         / (a.sz + b.sz - len(list_intersect(a.shingles, b.shingles)))
         >= 0.5 AS verified
FROM cand c
JOIN sized a ON a.doc_id = c.id_a
JOIN sized b ON b.doc_id = c.id_b
ORDER BY c.id_a, c.id_b
"""


_CUT_BUDGET = 10000


def corpus_budget_cut(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-ranked corpus trim: keep the best-scored docs (score =
    n_chars, ties by doc_id) until a global 10k-token budget is spent.
    Scale-safe two-phase histogram cut (operators/sampling.budget_cut)
    — the exact running-sum window runs only over the output-bounded
    candidate set, never the corpus."""
    from storagetapper_spark.operators.sampling import budget_cut

    docs = t(spark, sf, "documents").select(
        "doc_id", F.col("n_chars"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"))
    return budget_cut(docs, score_col="n_chars", weight_col="n_tokens",
                      budget=_CUT_BUDGET).orderBy(F.desc("n_chars"),
                                                  "doc_id")


CORPUS_BUDGET_CUT_SQL = f"""
WITH scored AS (
  SELECT doc_id, n_chars, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
ordered AS (
  SELECT doc_id, n_chars, n_tokens,
         sum(n_tokens) OVER (ORDER BY n_chars DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum_weight
  FROM scored
)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_weight AS BIGINT) AS cum_weight
FROM ordered WHERE cum_weight <= {_CUT_BUDGET}
ORDER BY n_chars DESC, doc_id
"""


QUERIES = {
    "text_repeated_passages": (text_repeated_passages,
                               REPEATED_PASSAGES_SQL),
    "tokenizer_pair_counts": (tokenizer_pair_counts, TOKENIZER_PAIRS_SQL),
    "text_idf_stopwords": (text_idf_stopwords, IDF_STOPWORDS_SQL),
    "sample_temperature_mix": (sample_temperature_mix,
                               TEMPERATURE_MIX_SQL),
    "dedup_lsh_verified": (dedup_lsh_verified, _lsh_verified_sql()),
    "corpus_budget_cut": (corpus_budget_cut, CORPUS_BUDGET_CUT_SQL),
}
