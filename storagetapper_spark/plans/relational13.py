"""Batch 13: price variance decomposition (ANOVA) and weighted
all-pairs document similarity (tf-idf cosine via inverted index).

Exactness: ANOVA runs entirely on exact integer cents with per-group
terms micro-floored before the cross-group sum; tf-idf pair
contributions are micro-floored per (pair, term) before the integer
sum per pair (SCALE.md discipline — float addition order never touches
the hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


def price_anova_brands(spark: SparkSession, sf: str) -> DataFrame:
    """One-way ANOVA of retail price across brands: how much price
    variance is BETWEEN brands (η² = SSB/SST)?  Low η² ⇒ brand is not
    a price segment.  One map-side-combined agg per brand, then the
    closed form SSB = Σ_b S_b²/n_b − S²/N on exact cents; each brand's
    term is floored to whole cents² before the (≈25-row) final sum, so
    the result is order-independent (micro-scaling would overflow a
    long at s² ≈ 10¹⁹)."""
    p = t(spark, sf, "part")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    g = (p.select(F.col("p_brand").alias("brand"), cents.alias("c"))
         .groupBy("brand")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum("c").alias("s"),
              F.sum(F.col("c") * F.col("c")).alias("s2")))
    tot = g.agg(F.count(F.lit(1)).alias("n_brands"),
                F.sum("n").alias("nn"), F.sum("s").alias("ss"),
                F.sum("s2").alias("ss2"))
    term = F.floor(F.col("s").cast("double") * F.col("s").cast("double")
                   / F.col("n").cast("double")).cast("long")
    per_brand = g.select(term.alias("t"))
    ssb_part = per_brand.agg(F.sum("t").alias("sum_t"))
    out = ssb_part.crossJoin(F.broadcast(tot))
    grand = (F.col("ss").cast("double") * F.col("ss").cast("double")
             / F.col("nn").cast("double"))
    ssb = F.col("sum_t").cast("double") - grand
    sst = F.col("ss2").cast("double") - grand
    return out.select(
        "n_brands", F.col("nn").alias("n_parts"),
        F.floor(ssb).cast("long").alias("ssb_cents2"),
        F.floor(sst).cast("long").alias("sst_cents2"),
        F.floor(ssb / sst * 1000000).cast("long").alias("eta2_micro"))


ANOVA_SQL = """
WITH g AS (
  SELECT p_brand AS brand, count(*) AS n,
         CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS BIGINT)
           AS s,
         CAST(sum(CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(round(p_retailprice * 100) AS BIGINT))
              AS BIGINT) AS s2
  FROM part GROUP BY 1
),
tot AS (
  SELECT count(*) AS n_brands, CAST(sum(n) AS BIGINT) AS nn,
         CAST(sum(s) AS BIGINT) AS ss, CAST(sum(s2) AS BIGINT) AS ss2
  FROM g
),
terms AS (
  SELECT CAST(sum(CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                             / CAST(n AS DOUBLE)) AS BIGINT))
              AS BIGINT) AS sum_t
  FROM g
)
SELECT t.n_brands, t.nn AS n_parts,
       CAST(floor(CAST(x.sum_t AS DOUBLE)
                  - CAST(t.ss AS DOUBLE) * CAST(t.ss AS DOUBLE)
                    / CAST(t.nn AS DOUBLE)) AS BIGINT) AS ssb_cents2,
       CAST(floor(CAST(t.ss2 AS DOUBLE)
                  - CAST(t.ss AS DOUBLE) * CAST(t.ss AS DOUBLE)
                    / CAST(t.nn AS DOUBLE)) AS BIGINT) AS sst_cents2,
       CAST(floor((CAST(x.sum_t AS DOUBLE)
                   - CAST(t.ss AS DOUBLE) * CAST(t.ss AS DOUBLE)
                     / CAST(t.nn AS DOUBLE))
                  / (CAST(t.ss2 AS DOUBLE)
                     - CAST(t.ss AS DOUBLE) * CAST(t.ss AS DOUBLE)
                       / CAST(t.nn AS DOUBLE))
                  * 1000000) AS BIGINT) AS eta2_micro
FROM terms x CROSS JOIN tot t
"""


QUERIES = {
    "price_anova_brands": (price_anova_brands, ANOVA_SQL),
}


_AP_MAX_DF = 50     # prune terms in more than this many docs
_AP_TOPK = 20
_AP_DOC_CAP = 500   # restrict to first docs: keeps the oracle tractable


def text_allpairs_cosine_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """Top-20 most similar document pairs by tf-idf cosine, via the
    inverted-index (posting-list) join — the weighted all-pairs
    similarity shape (Bayardo et al.): pairs are generated ONLY where
    a shared term exists, and high-df terms (> 50 docs) are pruned
    first — the classic frequency filter that bounds posting-list
    fan-out (a stopword-ish term would otherwise generate ~n² pairs).

    Doc set capped at doc_id < 500 so the DuckDB oracle stays
    tractable; the Spark plan is the production shape at any corpus
    size (posting join + per-pair integer sum of micro-floored
    products; norms broadcast)."""
    docs = (t(spark, sf, "documents")
            .filter(F.col("doc_id") < _AP_DOC_CAP))
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "),
            " +", " ")), " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    wdf = (tf.join(F.broadcast(df.filter(F.col("df") <= _AP_MAX_DF)),
                   "tok")
           .crossJoin(F.broadcast(nd))
           .select("doc_id", "tok",
                   (F.col("tf").cast("double")
                    * F.log(F.col("n_docs").cast("double")
                            / F.col("df").cast("double"))).alias("w")))
    norm = (wdf.select("doc_id",
                       F.floor(F.col("w") * F.col("w") * 1000000)
                       .cast("long").alias("w2"))
            .groupBy("doc_id").agg(F.sum("w2").alias("norm2_micro")))
    a = wdf.select(F.col("doc_id").alias("d1"), "tok",
                   F.col("w").alias("w1"))
    b = wdf.select(F.col("doc_id").alias("d2"),
                   F.col("tok").alias("tok2"), F.col("w").alias("w2"))
    pairs = (a.join(b, (F.col("tok") == F.col("tok2"))
                    & (F.col("d1") < F.col("d2")))
             .select("d1", "d2",
                     F.floor(F.col("w1") * F.col("w2") * 1000000)
                     .cast("long").alias("p")))
    dot = pairs.groupBy("d1", "d2").agg(
        F.sum("p").alias("dot_micro"),
        F.count(F.lit(1)).alias("n_shared_terms"))
    n1 = norm.select(F.col("doc_id").alias("d1"),
                     F.col("norm2_micro").alias("nm1"))
    n2 = norm.select(F.col("doc_id").alias("d2"),
                     F.col("norm2_micro").alias("nm2"))
    cos = (F.col("dot_micro").cast("double")
           / F.sqrt(F.col("nm1").cast("double")
                    * F.col("nm2").cast("double")))
    return (dot.join(F.broadcast(n1), "d1").join(F.broadcast(n2), "d2")
            .select("d1", "d2", "n_shared_terms",
                    F.floor(cos * 1000000).cast("long")
                    .alias("cosine_micro"))
            .orderBy(F.desc("cosine_micro"), "d1", "d2")
            .limit(_AP_TOPK))


ALLPAIRS_SQL = f"""
WITH docsf AS (SELECT doc_id, text FROM documents
               WHERE doc_id < {_AP_DOC_CAP}),
toks AS (
  SELECT doc_id, unnest(string_split(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')), ' ')) AS tok
  FROM docsf
),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok
       HAVING count(*) <= {_AP_MAX_DF}),
nd AS (SELECT count(*) AS n_docs FROM docsf),
wdf AS (
  SELECT tf.doc_id, tf.tok,
         CAST(tf.tf AS DOUBLE)
           * ln(CAST(nd.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS w
  FROM tf JOIN df ON df.tok = tf.tok CROSS JOIN nd
),
norm AS (
  SELECT doc_id,
         CAST(sum(CAST(floor(w * w * 1000000) AS BIGINT)) AS BIGINT)
           AS norm2_micro
  FROM wdf GROUP BY doc_id
),
pairs AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(floor(a.w * b.w * 1000000) AS BIGINT) AS p
  FROM wdf a JOIN wdf b ON a.tok = b.tok AND a.doc_id < b.doc_id
),
dot AS (
  SELECT d1, d2, CAST(sum(p) AS BIGINT) AS dot_micro,
         count(*) AS n_shared_terms
  FROM pairs GROUP BY 1, 2
)
SELECT d.d1, d.d2, d.n_shared_terms,
       CAST(floor(CAST(d.dot_micro AS DOUBLE)
                  / sqrt(CAST(n1.norm2_micro AS DOUBLE)
                         * CAST(n2.norm2_micro AS DOUBLE))
                  * 1000000) AS BIGINT) AS cosine_micro
FROM dot d
JOIN norm n1 ON n1.doc_id = d.d1
JOIN norm n2 ON n2.doc_id = d.d2
ORDER BY cosine_micro DESC, d.d1, d.d2
LIMIT {_AP_TOPK}
"""


QUERIES["text_allpairs_cosine_tfidf"] = (text_allpairs_cosine_tfidf,
                                         ALLPAIRS_SQL)
