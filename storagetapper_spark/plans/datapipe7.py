"""Corpus-statistics batch: n-gram novelty per source, Heaps-law
vocabulary growth, pairwise Jensen-Shannon divergence between sources,
and lexical diversity (Simpson / type-token ratio).  The
distribution-level diagnostics a training-mix owner reads before
weighting sources (complements the per-document text_* family and the
source-level corpus_source_report).

Exactness discipline (SCALE.md): everything is counts until the final
expression; where a metric is a SUM of per-term float contributions
(JSD), each term is quantized to micro-ints BEFORE summing so the
result is independent of Spark's partial-aggregation order.

Tokenization is the shared normalize-lower-split pipeline used by
vocab_coverage / the minhash family (relational10.py, datapipe.py), so
the whole corpus surface agrees on what a token is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_NORM_SQL = """
norm AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')), ' ') AS w
  FROM documents
)
"""


def _norm(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents")
    return docs.select(
        "doc_id", "source",
        F.split(F.trim(F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "),
            " +", " ")), " ").alias("w"))


_NG = 3


def text_ngram_novelty(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source 3-gram novelty: of the distinct shingles a source
    contains, what fraction was INTRODUCED by that source (its doc has
    the corpus-wide lowest doc_id for the shingle)?  Low novelty ⇒ the
    source mostly restates text that exists elsewhere — a
    deduplication-priority signal.

    Scale shape: shingles are deduped per-document BEFORE the explode
    (the contamination_check lesson — per-doc distinct needs no
    shuffle), so the wide stages see each (doc, shingle) once; the
    reduction per shingle is min_by, a map-side-combinable agg."""
    norm = _norm(spark, sf)
    idx = F.sequence(F.lit(0), F.size("w") - _NG)
    sh = F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", *[
            F.element_at(F.col("w"), (i + j + 1).cast("int"))
            for j in range(_NG)])))
    grams = (norm.filter(F.size("w") >= _NG)
             .select("doc_id", "source", F.explode(sh).alias("g")))
    # r10: a shared (g, source, min doc_id) pre-aggregate was tried for
    # the two readouts below and REVERTED — interleaved A/B at sf0.1
    # measured 2.1s (this form) vs 3.1s (shared, no persist) vs 8.8s
    # (shared + persist): the pre-aggregate is near-gram-grained, so
    # its extra full-size shuffle (or cache) costs more than the second
    # map-side-combined pass it saves.
    first = (grams.groupBy("g")
             .agg(F.min_by("source", "doc_id").alias("first_source")))
    present = (grams.select("source", "g").distinct()
               .groupBy("source")
               .agg(F.count(F.lit(1)).alias("n_present")))
    introduced = (first.groupBy(F.col("first_source").alias("source"))
                  .agg(F.count(F.lit(1)).alias("n_introduced")))
    nov = (F.col("n_introduced").cast("double") * 1000000
           / F.col("n_present").cast("double"))
    return (present.join(introduced, "source", "left")
            .select("source", "n_present",
                    F.coalesce("n_introduced", F.lit(0))
                    .alias("n_introduced"),
                    F.floor(F.coalesce(nov, F.lit(0.0))).cast("long")
                    .alias("novelty_micro"))
            .orderBy("source"))


NGRAM_NOVELTY_SQL = f"""
WITH {_NORM_SQL},
sh AS (
  SELECT doc_id, source,
         list_distinct(list_transform(
             range(1, len(w) - {_NG - 1} + 1),
             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS gs
  FROM norm WHERE len(w) >= {_NG}
),
grams AS (SELECT doc_id, source, unnest(gs) AS g FROM sh),
first AS (
  SELECT g, arg_min(source, doc_id) AS first_source FROM grams GROUP BY g
),
present AS (
  SELECT source, count(*) AS n_present
  FROM (SELECT DISTINCT source, g FROM grams) GROUP BY source
),
introduced AS (
  SELECT first_source AS source, count(*) AS n_introduced
  FROM first GROUP BY 1
)
SELECT p.source, p.n_present,
       COALESCE(i.n_introduced, 0) AS n_introduced,
       CAST(floor(COALESCE(CAST(i.n_introduced AS DOUBLE) * 1000000
                           / CAST(p.n_present AS DOUBLE), 0.0))
            AS BIGINT) AS novelty_micro
FROM present p LEFT JOIN introduced i ON i.source = p.source
ORDER BY p.source
"""


QUERIES = {
    "text_ngram_novelty": (text_ngram_novelty, NGRAM_NOVELTY_SQL),
}


_HEAPS_FRACS = [10, 25, 50, 75, 100]  # percent of docs (by doc_id order)


def corpus_growth_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Heaps-law vocabulary growth: distinct token types seen after
    ingesting the first 10/25/50/75/100 % of documents (doc_id order).
    Sub-linear growth is what makes exact-dedup vocabularies viable at
    100 TB; a near-linear curve flags synthetic or ID-heavy text.

    Plan: one min(doc_id) reduction per type (map-side combinable),
    checkpoint thresholds via the scale-safe two-pass global rank
    (operators/ranks.py — no single-task window over the doc table),
    then a 5-row broadcast join + conditional count — the corpus is
    scanned once and nothing token-scaled is ever re-shuffled."""
    from storagetapper_spark.operators.ranks import two_pass_rank

    norm = _norm(spark, sf)
    first = (norm.select("doc_id", F.explode("w").alias("tok"))
             .groupBy("tok").agg(F.min("doc_id").alias("first_doc")))
    d = t(spark, sf, "documents").select("doc_id")
    ranked = two_pass_rank(d, [F.col("doc_id")],
                           F.floor(F.col("doc_id") / F.lit(1024)))
    fr = F.explode(F.array(*[F.lit(p) for p in _HEAPS_FRACS])).alias("pct")
    th = (ranked.select("*", fr)
          .filter(F.col("_rank") == F.ceil(
              F.col("pct") * F.col("_n") / F.lit(100)))
          .select("pct", F.col("_rank").alias("n_docs_at"),
                  F.col("doc_id").alias("th")))
    return (first.crossJoin(F.broadcast(th))
            .groupBy("pct", "n_docs_at")
            .agg(F.sum(F.when(F.col("first_doc") <= F.col("th"), 1)
                       .otherwise(0)).alias("vocab_size"))
            .orderBy("pct"))


HEAPS_SQL = f"""
WITH {_NORM_SQL},
first AS (
  SELECT tok, min(doc_id) AS first_doc
  FROM (SELECT doc_id, unnest(w) AS tok FROM norm) GROUP BY tok
),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rn,
         count(*) OVER () AS n_docs
  FROM documents
),
th AS (
  SELECT f.pct, r.rn AS n_docs_at, r.doc_id AS th
  FROM ranked r
  CROSS JOIN (SELECT unnest([{", ".join(map(str, _HEAPS_FRACS))}]) AS pct) f
  WHERE r.rn = CAST(ceil(f.pct * r.n_docs / 100.0) AS BIGINT)
)
SELECT th.pct, th.n_docs_at,
       CAST(sum(CASE WHEN first.first_doc <= th.th THEN 1 ELSE 0 END)
            AS BIGINT) AS vocab_size
FROM first CROSS JOIN th
GROUP BY th.pct, th.n_docs_at
ORDER BY th.pct
"""


QUERIES["corpus_growth_curve"] = (corpus_growth_curve, HEAPS_SQL)


def text_js_divergence(spark: SparkSession, sf: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between the unigram
    distributions of every source pair — the standard
    domain-similarity matrix behind mixture weighting (cf. the DSIR
    line of work, sample_importance_weights).

    Decomposition that avoids a full-outer join: shared tokens
    contribute the usual p·ln(2p/(p+q)) + q·ln(2q/(p+q)) terms
    (quantized to micro-ints before the sum — float addition order is
    engine-dependent, integer addition is not); tokens private to one
    side contribute exactly ln2 times their probability mass, computed
    in closed form from the exact shared-mass totals.  Token tables are
    vocabulary-sized; the pair join is an equi-join on token."""
    norm = _norm(spark, sf)
    # r10: a persist() of cnt was tried and REVERTED — interleaved A/B
    # at sf0.1 measured 1.6s (this form) vs 2.6s (persisted): the three
    # references share the identical exchange subtree, which Spark
    # already collapses via ReusedExchange, so the cache is pure cost.
    cnt = (norm.select("source", F.explode("w").alias("tok"))
           .groupBy("source", "tok")
           .agg(F.count(F.lit(1)).alias("n")))
    tot = cnt.groupBy("source").agg(F.sum("n").alias("nt"))
    a = (cnt.join(tot, "source")
         .select(F.col("source").alias("s1"), "tok",
                 F.col("n").alias("n1"), F.col("nt").alias("nt1")))
    b = (cnt.join(tot, "source")
         .select(F.col("source").alias("s2"), F.col("tok").alias("tok2"),
                 F.col("n").alias("n2"), F.col("nt").alias("nt2")))
    shared = a.join(b, (F.col("tok") == F.col("tok2"))
                    & (F.col("s1") < F.col("s2")))
    p = F.col("n1").cast("double") / F.col("nt1").cast("double")
    q = F.col("n2").cast("double") / F.col("nt2").cast("double")
    term = 0.5 * (p * F.log(2.0 * p / (p + q))
                  + q * F.log(2.0 * q / (p + q)))
    agg = (shared.select(
        "s1", "s2", "nt1", "nt2",
        F.floor(term * 1000000).cast("long").alias("t_micro"),
        F.col("n1").alias("sh1"), F.col("n2").alias("sh2"))
        .groupBy("s1", "s2", "nt1", "nt2")
        .agg(F.count(F.lit(1)).alias("n_shared"),
             F.sum("t_micro").alias("shared_micro"),
             F.sum("sh1").alias("m1"), F.sum("sh2").alias("m2")))
    import math
    priv = (0.5 * math.log(2.0)
            * ((F.col("nt1") - F.col("m1")).cast("double")
               / F.col("nt1").cast("double")
               + (F.col("nt2") - F.col("m2")).cast("double")
               / F.col("nt2").cast("double")))
    return (agg.select(
        "s1", "s2", "n_shared",
        (F.col("shared_micro")
         + F.floor(priv * 1000000)).cast("long").alias("jsd_micro"))
        .orderBy("s1", "s2"))


JSD_SQL = f"""
WITH {_NORM_SQL},
cnt AS (
  SELECT source, tok, count(*) AS n
  FROM (SELECT source, unnest(w) AS tok FROM norm) GROUP BY 1, 2
),
tot AS (SELECT source, CAST(sum(n) AS BIGINT) AS nt FROM cnt GROUP BY 1),
shared AS (
  SELECT a.source AS s1, b.source AS s2, ta.nt AS nt1, tb.nt AS nt2,
         a.n AS n1, b.n AS n2
  FROM cnt a JOIN cnt b ON a.tok = b.tok AND a.source < b.source
  JOIN tot ta ON ta.source = a.source
  JOIN tot tb ON tb.source = b.source
),
terms AS (
  SELECT s1, s2, nt1, nt2, n1, n2,
         CAST(floor(0.5 * (
             (CAST(n1 AS DOUBLE) / nt1)
               * ln(2.0 * (CAST(n1 AS DOUBLE) / nt1)
                    / (CAST(n1 AS DOUBLE) / nt1 + CAST(n2 AS DOUBLE) / nt2))
             + (CAST(n2 AS DOUBLE) / nt2)
               * ln(2.0 * (CAST(n2 AS DOUBLE) / nt2)
                    / (CAST(n1 AS DOUBLE) / nt1 + CAST(n2 AS DOUBLE) / nt2))
           ) * 1000000) AS BIGINT) AS t_micro
  FROM shared
),
agg AS (
  SELECT s1, s2, nt1, nt2, count(*) AS n_shared,
         CAST(sum(t_micro) AS BIGINT) AS shared_micro,
         CAST(sum(n1) AS BIGINT) AS m1, CAST(sum(n2) AS BIGINT) AS m2
  FROM terms GROUP BY 1, 2, 3, 4
)
SELECT s1, s2, n_shared,
       CAST(shared_micro
            + floor(0.5 * ln(2.0)
                    * (CAST(nt1 - m1 AS DOUBLE) / nt1
                       + CAST(nt2 - m2 AS DOUBLE) / nt2) * 1000000)
            AS BIGINT) AS jsd_micro
FROM agg
ORDER BY s1, s2
"""


QUERIES["text_js_divergence"] = (text_js_divergence, JSD_SQL)


def text_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical diversity per source: type-token ratio and the Simpson
    repeat-probability Σ n(n−1)/(N(N−1)) — both exact integer ratios
    (no float accumulates anywhere; the division happens once per
    source).  High Simpson ⇒ a few types dominate ⇒ boilerplate."""
    norm = _norm(spark, sf)
    cnt = (norm.select("source", F.explode("w").alias("tok"))
           .groupBy("source", "tok")
           .agg(F.count(F.lit(1)).alias("n")))
    s = (cnt.groupBy("source")
         .agg(F.count(F.lit(1)).alias("n_types"),
              F.sum("n").alias("n_tokens"),
              F.sum(F.col("n") * (F.col("n") - 1)).alias("rep")))
    ttr = (F.col("n_types").cast("double") * 1000000
           / F.col("n_tokens").cast("double"))
    simpson = (F.col("rep").cast("double") * 1000000
               / (F.col("n_tokens") * (F.col("n_tokens") - 1))
               .cast("double"))
    return (s.select("source", "n_types", "n_tokens",
                     F.floor(ttr).cast("long").alias("ttr_micro"),
                     F.floor(simpson).cast("long").alias("simpson_micro"))
            .orderBy("source"))


DIVERSITY_SQL = f"""
WITH {_NORM_SQL},
cnt AS (
  SELECT source, tok, count(*) AS n
  FROM (SELECT source, unnest(w) AS tok FROM norm) GROUP BY 1, 2
),
s AS (
  SELECT source, count(*) AS n_types,
         CAST(sum(n) AS BIGINT) AS n_tokens,
         CAST(sum(n * (n - 1)) AS BIGINT) AS rep
  FROM cnt GROUP BY source
)
SELECT source, n_types, n_tokens,
       CAST(floor(CAST(n_types AS DOUBLE) * 1000000
                  / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS ttr_micro,
       CAST(floor(CAST(rep AS DOUBLE) * 1000000
                  / CAST(n_tokens * (n_tokens - 1) AS DOUBLE)) AS BIGINT)
         AS simpson_micro
FROM s
ORDER BY source
"""


QUERIES["text_diversity"] = (text_diversity, DIVERSITY_SQL)
