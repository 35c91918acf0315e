"""Query batch 7: more TPC-H-shaped scans/joins (q4/q6/q14/q19 analogs
on the fixture schema) and text-quality signals a training pipeline
filters on (PII detection, repetition ratio)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


# --- q6: forecast revenue change (pure pushdown filter + single agg) ----

def q6_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q6 shape: every predicate reaches the parquet scan
    (PushedFilters), the agg is a single map-side partial — the
    minimal-shuffle query (one row crosses the exchange)."""
    li = t(spark, sf, "lineitem")
    return (li.filter((F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
                      & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
                      & (F.col("l_discount") >= 0.05)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
              # exact 1e-4-dollar units (cents × discount hundredths),
              # shared division (q1 idiom; raw double sums flake)
              .agg((F.sum(F.expr(
                        "CAST(round(l_extendedprice * 100) AS BIGINT)"
                        " * CAST(round(l_discount * 100) AS BIGINT)"))
                    .cast("double") / 10000.0).alias("revenue"),
                   F.count(F.lit(1)).alias("n_lines")))


Q6_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT))
            AS DOUBLE) / 10000.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --- q4: order priority checking (EXISTS semi-join) ----------------------

def q4_order_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q4 shape: EXISTS → left-semi join (never multiplies rows,
    ships only o_orderkey across the shuffle)."""
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = t(spark, sf, "lineitem").filter(F.col("l_tax") > 0.05)
    return (orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
                  .groupBy("o_orderpriority")
                  .agg(F.count(F.lit(1)).alias("order_count"))
                  .orderBy("o_orderpriority"))


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_tax > 0.05)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- q14: promotion effect (conditional agg over a join) -----------------

def q14_promo_effect(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
              .agg(F.round(100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev)
                                          .otherwise(0.0)) / F.sum(rev), 4)
                    .alias("promo_revenue_pct")))


Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- q19: discounted revenue (disjunctive multi-range join filter) -------

def q19_disjunctive_ranges(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q19 shape: OR of (brand, quantity-range, size-range)
    conjuncts evaluated on a broadcast join — Catalyst extracts the
    common join key so the disjunction never becomes a cartesian."""
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#12") & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#23") & F.col("l_quantity").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return j.filter(cond).agg(
        # exact 1e-4-dollar units, shared division (q1 idiom)
        (F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"
                      " * (100 - CAST(round(l_discount * 100) AS BIGINT))"))
         .cast("double") / 10000.0).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"))


Q19_SQL = """
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#12' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


# --- q17: small-quantity-order revenue (correlated scalar subquery) ------

def q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q17 shape: lineitems under 20% of their part's average
    quantity.  The correlated scalar subquery decorrelates to a
    per-part aggregate joined back — the aggregate side is |part|-sized
    (broadcastable), so the fact table is scanned once and never
    self-joined row-to-row."""
    li = t(spark, sf, "lineitem")
    part = t(spark, sf, "part")
    avg_qty = (li.groupBy("l_partkey")
                 .agg((0.2 * F.avg("l_quantity")).alias("qty_limit")))
    return (li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#3")),
                    li.l_partkey == part.p_partkey)
              .join(F.broadcast(avg_qty), "l_partkey")
              .filter(F.col("l_quantity") < F.col("qty_limit"))
              # exact cents sum, shared divisions (q1 idiom)
              .agg((F.sum(F.expr("CAST(round(l_extendedprice * 100)"
                                 " AS BIGINT)"))
                    .cast("double") / 100.0 / 7.0).alias("avg_yearly"),
                   F.count(F.lit(1)).alias("n_lines")))


Q17_SQL = """
SELECT CAST(sum(CAST(round(l1.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 / 7.0 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l1
JOIN part ON p_partkey = l1.l_partkey
WHERE p_brand = 'Brand#3'
  AND l1.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                       FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
"""


# --- q22: global-avg filter + NOT EXISTS anti-join ------------------------

def q22_global_sales_opportunity(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H q22 shape: customers above the global average balance with
    no high-value order.  The scalar global average is a 1-row
    broadcast; the NOT EXISTS is a left-anti join shipping only
    custkeys (the anti side is pre-filtered, so it carries the few
    high-value orders, not the whole table)."""
    cust = t(spark, sf, "customer")
    big_orders = t(spark, sf, "orders").filter(F.col("o_totalprice") > 300000.0)
    # the threshold and the group sum both ride exact cents sums +
    # shared divisions (q1 idiom) — a raw-double avg threshold could
    # flip a borderline customer between runs
    bal_cents = F.expr("CAST(round(c_acctbal * 100) AS BIGINT)")
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg((F.sum(bal_cents).cast("double")
                     / F.count(F.lit(1)) / 100.0).alias("avg_bal")))
    return (cust.crossJoin(F.broadcast(avg_bal))
                .filter(F.col("c_acctbal") > F.col("avg_bal"))
                .join(big_orders, cust.c_custkey == big_orders.o_custkey,
                      "left_anti")
                .groupBy(F.col("c_nationkey"))
                .agg(F.count(F.lit(1)).alias("numcust"),
                     (F.sum(bal_cents).cast("double") / 100.0)
                     .alias("totacctbal"))
                .orderBy("c_nationkey"))


Q22_SQL = """
SELECT c_nationkey,
       count(*) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT))
                               AS DOUBLE) / count(*) / 100.0
                   FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


# --- PII detection (training-data compliance filter) ---------------------

_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_IPV4_RE = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
_PHONE_RE = "\\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\\b"


def text_pii_flags(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document PII signals (email/IP/phone regex counts) — the
    filter every compliance-scrubbing pipeline runs before training.
    Pure regexp_count expressions: JVM-side, scan-parallel, no UDF."""
    docs = t(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_IPV4_RE)).alias("n_ipv4"),
        F.regexp_count(F.col("text"), F.lit(_PHONE_RE)).alias("n_phones"),
    ).withColumn("has_pii",
                 (F.col("n_emails") + F.col("n_ipv4") + F.col("n_phones")) > 0)


PII_SQL = f"""
SELECT doc_id, n_emails, n_ipv4, n_phones,
       (n_emails + n_ipv4 + n_phones) > 0 AS has_pii
FROM (SELECT doc_id,
             len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(text, '{_IPV4_RE}')) AS n_ipv4,
             len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones
      FROM documents)
"""


# --- repetition ratio (text-quality signal) -------------------------------

def text_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Repeated-word mass: 1 - distinct_words/total_words per document —
    high repetition is the classic low-quality/spam signal.  Split +
    aggregate expressions only; the scan is the whole cost."""
    docs = t(spark, sf, "documents")
    words = F.split(F.col("text"), " ")
    n = F.size(words)
    nd = F.size(F.array_distinct(words))
    return docs.select(
        "doc_id", n.alias("n_words"), nd.alias("n_distinct_words"),
        F.round(1.0 - nd.cast("double") / n, 4).alias("repetition_ratio"))


REPETITION_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
       round(1.0 - len(list_distinct(string_split(text, ' ')))
                   / len(string_split(text, ' ')), 4) AS repetition_ratio
FROM documents
"""


# --- snapshot diff (derive a changelog from two snapshot versions) -------

def snapshot_diff_changelog(spark: SparkSession, sf: str) -> DataFrame:
    """Diff-based CDC fallback: minimal insert/update/delete set between
    two deterministic 'versions' of lineitem (v2 extends the date range,
    drops orderkeys %97, bumps quantity for %89)."""
    from storagetapper_spark.operators.snapshot_diff import snapshot_diff

    li = t(spark, sf, "lineitem")
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"]
    old = (li.filter(F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
             .select(*cols))
    new = (li.filter((F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
                     & (F.col("l_orderkey") % 97 != 0))
             .select("l_orderkey", "l_linenumber",
                     F.when(F.col("l_orderkey") % 89 == 0,
                            F.col("l_quantity") + 1)
                      .otherwise(F.col("l_quantity")).alias("l_quantity"),
                     "l_extendedprice"))
    return snapshot_diff(old, new, pk_cols=["l_orderkey", "l_linenumber"])


SNAPSHOT_DIFF_SQL = """
WITH oldv AS (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-07-01'
), newv AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey % 89 = 0 THEN l_quantity + 1
              ELSE l_quantity END AS l_quantity,
         l_extendedprice
  FROM lineitem
  WHERE l_shipdate < TIMESTAMP '1998-01-01' AND l_orderkey % 97 <> 0
)
SELECT * FROM (
  SELECT coalesce(o.l_orderkey, n.l_orderkey) AS l_orderkey,
         coalesce(o.l_linenumber, n.l_linenumber) AS l_linenumber,
         CASE WHEN o.l_orderkey IS NULL THEN 'insert'
              WHEN n.l_orderkey IS NULL THEN 'delete'
              WHEN o.l_quantity IS DISTINCT FROM n.l_quantity
                OR o.l_extendedprice IS DISTINCT FROM n.l_extendedprice
              THEN 'update' END AS op,
         n.l_quantity, n.l_extendedprice
  FROM oldv o
  FULL JOIN newv n
    ON o.l_orderkey = n.l_orderkey AND o.l_linenumber = n.l_linenumber
) WHERE op IS NOT NULL
"""


# --- tf-idf ranked retrieval (inverted-index keyword search) -------------

_SEARCH_TERMS = ["spark", "join", "window"]
_TOPK = 10


def text_tfidf_search(spark: SparkSession, sf: str) -> DataFrame:
    """Keyword search: tf-idf-ranked top-10 docs for a fixed query.
    Shape = the batch build of an inverted index: explode to (doc, term)
    postings, per-term document frequencies (a broadcast-sized dim —
    |vocab| rows), then score = Σ tf·idf over query terms.  Postings
    shuffle once on the term; document text never leaves the scan."""
    from pyspark.sql.window import Window

    docs = t(spark, sf, "documents")
    n_docs = docs.count()
    tok = docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
    tf = (tok.filter(F.col("w").isin(_SEARCH_TERMS))
             .groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf")))
    dfreq = (tok.filter(F.col("w").isin(_SEARCH_TERMS))
                .groupBy("w").agg(F.countDistinct("doc_id").alias("df")))
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0
    # score = quantized Σ tf·idf (1e-9-unit BIGINT sum + one shared
    # division): the per-(doc, term) tfidf doubles are identical in
    # both engines, and the integer sum is order-free however the ≤
    # |query| terms combine (a raw double sum can flip in the last ulp
    # between runs, which also perturbs the rank tie-break)
    scored = (tf.join(F.broadcast(dfreq), "w")
                .withColumn("tfidf_u",
                            F.round(F.col("tf") * idf * 1e9).cast("long"))
                .groupBy("doc_id")
                .agg((F.sum("tfidf_u").cast("double") / 1e9).alias("score"),
                     F.count(F.lit(1)).alias("n_terms_hit")))
    # top-k FIRST via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, no full sort, no single-partition exchange of the corpus),
    # THEN the rank window over only the k surviving rows — the global
    # Window.orderBy form funnels every scored doc through one partition
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(_TOPK)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w))


def _tfidf_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in _SEARCH_TERMS)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), hits AS (
  SELECT doc_id, w FROM tok WHERE w IN ({terms})
), tf AS (
  SELECT doc_id, w, count(*) AS tf FROM hits GROUP BY doc_id, w
), dfreq AS (
  SELECT w, count(DISTINCT doc_id) AS df FROM hits GROUP BY w
), n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id,
         CAST(sum(CAST(round(tf.tf * (ln((n.n_docs + 1.0)
                                         / (dfreq.df + 1.0)) + 1.0) * 1e9)
                       AS BIGINT)) AS DOUBLE) / 1e9 AS score,
         count(*) AS n_terms_hit
  FROM tf JOIN dfreq USING (w) CROSS JOIN n
  GROUP BY tf.doc_id
)
SELECT doc_id, score, n_terms_hit,
       row_number() OVER (ORDER BY score DESC, doc_id) AS rank
FROM scored
QUALIFY rank <= {_TOPK}
"""


# --- mergeable histogram sketch -----------------------------------------

def sketch_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-width histogram of l_quantity per linestatus (long form:
    one row per non-empty bin).  The per-partition partial IS the
    sketch; the shuffle moves ≤ n_bins rows per group however many
    input rows exist (operators/sketch.py)."""
    li = t(spark, sf, "lineitem")
    bin_id = F.least(F.greatest(F.floor(F.col("l_quantity") / 2.0), F.lit(0)),
                     F.lit(24)).cast("int")
    return (li.withColumn("bin", bin_id)
              .groupBy("l_linestatus", "bin")
              .agg(F.count(F.lit(1)).alias("n")))


SKETCH_HIST_SQL = """
SELECT l_linestatus,
       CAST(least(greatest(floor(l_quantity / 2.0), 0), 24) AS INT) AS bin,
       count(*) AS n
FROM lineitem
GROUP BY l_linestatus, bin
"""




# --- corpus n-gram frequency table --------------------------------------
# The corpus-statistics op behind tokenizer training / contamination
# checks: top word-3-grams per language by raw occurrence count (NOT
# per-doc-distinct — frequency semantics).  Same lookahead-regex
# shingling as the dedup operators; one narrow shuffle on (lang, gram),
# top-k per lang bounded by a WindowGroupLimit plan.

def text_ngram_freq(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from storagetapper_spark.operators.text import normalize_text

    docs = t(spark, sf, "documents")
    norm = normalize_text(F.col("text"))
    pat = "(?<!\\S)(?=(\\S+ \\S+ \\S+))"
    grams = docs.select(
        "lang", F.explode(F.regexp_extract_all(norm, F.lit(pat), 1)).alias("g"))
    counts = grams.groupBy("lang", "g").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("g"))
    return (counts.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= 10))


NGRAM_FREQ_SQL = """
WITH norm AS (
  SELECT lang,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS nt
  FROM documents
), toks AS (
  SELECT lang, string_split(nt, ' ') AS w FROM norm WHERE len(string_split(nt, ' ')) >= 3
), grams AS (
  SELECT lang, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM toks, UNNEST(range(1, len(w) - 1)) AS u(i)
), counts AS (
  SELECT lang, g, count(*) AS n FROM grams GROUP BY lang, g
)
SELECT lang, g, n,
       row_number() OVER (PARTITION BY lang ORDER BY n DESC, g) AS rank
FROM counts QUALIFY rank <= 10
"""


QUERIES = {
    "sketch_histogram": (sketch_histogram, SKETCH_HIST_SQL),
    "text_tfidf_search": (text_tfidf_search, _tfidf_sql()),
    "snapshot_diff_changelog": (snapshot_diff_changelog, SNAPSHOT_DIFF_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q4_order_priority": (q4_order_priority, Q4_SQL),
    "q14_promo_effect": (q14_promo_effect, Q14_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q22_global_sales_opportunity": (q22_global_sales_opportunity, Q22_SQL),
    "q19_disjunctive_ranges": (q19_disjunctive_ranges, Q19_SQL),
    "text_pii_flags": (text_pii_flags, PII_SQL),
    "text_repetition": (text_repetition, REPETITION_SQL),
    "text_ngram_freq": (text_ngram_freq, NGRAM_FREQ_SQL),
}
