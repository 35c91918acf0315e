"""Query batch: dataset assembly for training — document chunking
(fixed-width char windows with overlap; whitespace-token budgets),
train/val/test splitting, corpus-mixture rebalancing, and the
multimodal manifest.  All narrow or broadcast-only plans with exact
DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.operators import text as X
from storagetapper_spark.plans.common import events_t, t

_SIZE, _STRIDE, _TOKENS = 200, 150, 64


def text_chunk_fixed(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").select("doc_id", "text")
    return X.chunk_fixed(docs, size=_SIZE, stride=_STRIDE)


CHUNK_FIXED_SQL = f"""
SELECT d.doc_id,
       CAST((u.s - 1) // {_STRIDE} AS INT) AS chunk_id,
       CAST(u.s AS INT) AS chunk_start,
       CAST(length(substr(d.text, CAST(u.s AS INT), {_SIZE})) AS BIGINT)
         AS chunk_len,
       md5(substr(d.text, CAST(u.s AS INT), {_SIZE})) AS chunk_md5
FROM documents d,
     unnest(generate_series(1, greatest(1, length(d.text)), {_STRIDE}))
       AS u(s)
"""


def text_chunk_tokens(spark: SparkSession, sf: str) -> DataFrame:
    docs = t(spark, sf, "documents").select("doc_id", "text")
    return X.chunk_tokens(docs, tokens=_TOKENS)


CHUNK_TOKENS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
)
SELECT t.doc_id,
       CAST((u.s - 1) // {_TOKENS} AS INT) AS chunk_id,
       CAST(u.s AS INT) AS tok_start,
       CAST(len(w[CAST(u.s AS INT):CAST(u.s AS INT) + {_TOKENS - 1}])
            AS BIGINT) AS n_tokens,
       md5(array_to_string(w[CAST(u.s AS INT):CAST(u.s AS INT) + {_TOKENS - 1}],
                           ' ')) AS chunk_md5
FROM toks t,
     unnest(generate_series(1, greatest(1, len(t.w)), {_TOKENS})) AS u(s)
"""




def sample_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10): exactly one
    label per doc, stable under corpus growth."""
    from storagetapper_spark.operators.sampling import split_assign

    docs = t(spark, sf, "documents")
    return split_assign(docs, "doc_id").select("doc_id", "lang", "split")


_U = ("CAST(('0x' || substring(md5('{salt}' || CAST(doc_id AS VARCHAR)), 1, 15)) "
      "AS BIGINT) / 1152921504606846976.0")

SAMPLE_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN {_U.format(salt='split')} < 0.8 THEN 'train'
            WHEN {_U.format(salt='split')} < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def sample_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Downsample-only rebalance of the lang mixture to 30% en / 17.5%
    each other lang; rates derive from exact counts (no driver collect),
    membership is hash-deterministic."""
    from storagetapper_spark.operators.sampling import mixture_rebalance

    docs = t(spark, sf, "documents")
    targets = {"en": 0.3, "de": 0.175, "zh": 0.175, "fr": 0.175,
               "es": 0.175}
    return mixture_rebalance(docs, "lang", targets, "doc_id") \
        .select("doc_id", "lang", "source")


SAMPLE_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT lang, CAST(count(*) AS DOUBLE) AS n,
         CASE WHEN lang = 'en' THEN 0.3 ELSE 0.175 END AS t
  FROM documents GROUP BY lang
), m AS (SELECT min(n / t) AS m FROM counts),
rates AS (SELECT lang, (t * m.m / n) AS rate FROM counts, m)
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN rates r ON d.lang = r.lang
WHERE {_U.format(salt='mix').replace('doc_id', 'd.doc_id')} < r.rate
"""


def multimodal_manifest(spark: SparkSession, sf: str) -> DataFrame:
    """The JVM-side half of the media pipeline (operators/multimodal.py):
    opaque payload bytes -> typed manifest (modality, byte size, content
    hash) with zero Python; the codec half (decode) is the mapInPandas
    stage behind MEDIA_CODECS.  Document text stands in for payload
    bytes (no binary fixture); modality is a deterministic doc_id hash."""
    docs = t(spark, sf, "documents")
    modality = (F.when(F.col("doc_id") % 3 == 0, "image")
                 .when(F.col("doc_id") % 3 == 1, "audio")
                 .otherwise("video"))
    return docs.select(
        "doc_id", modality.alias("modality"),
        F.octet_length("text").cast("long").alias("byte_size"),
        F.sha2(F.col("text"), 256).alias("content_sha256"))


MULTIMODAL_MANIFEST_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_size,
       sha256(text) AS content_sha256
FROM documents
"""


def agg_salted_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted aggregation (operators/skew.salted_agg) over the
    skewed event_type distribution; the oracle is the PLAIN group-by —
    equality proves salting never changes results.  Sums in decimal so
    the two-phase fold is order-independent."""
    from storagetapper_spark.operators.skew import salted_agg

    ev = events_t(spark, sf).select(
        "event_id", "event_type",
        F.col("value").cast("decimal(18,6)").alias("value"))
    out = salted_agg(ev, ["event_type"],
                     {"value": "sum", "event_id": "count"}, n_salts=16)
    return out.select("event_type",
                      F.col("sum_value").cast("double").alias("sum_value"),
                      F.col("count_event_id").alias("n_events"))


AGG_SALTED_SQL = """
SELECT event_type,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


# --- reproducible global shuffle + sharding (training-data write side) --

def sample_shuffle_shard(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic shuffle-shard assignment over documents: every doc
    lands in exactly one of 16 hash-range shards with an md5 sort key;
    per shard we report the count and the head/tail docs in key order.
    Engine-portable determinism (salted md5, no RNG) — the oracle
    recomputes the identical assignment in DuckDB.  Scale: assignment
    is a narrow projection; the ONLY wide op is the per-shard agg
    (map-side partial).  The write path (repartition + sort-within-
    partition, no global sort) is operators/sampling.shuffle_shard's
    docstring contract, exercised in tests."""
    from storagetapper_spark.operators.sampling import shuffle_shard

    docs = t(spark, sf, "documents").select("doc_id")
    sharded = shuffle_shard(docs, n_shards=16, seed="r5")
    return (sharded.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min_by("doc_id", "sort_key").alias("head_doc"),
                 F.max_by("doc_id", "sort_key").alias("tail_doc"),
                 F.min("sort_key").alias("min_key"))
            .orderBy("shard"))


SHUFFLE_SHARD_SQL = """
WITH keyed AS (
  SELECT doc_id,
         md5('r5' || '|' || CAST(doc_id AS VARCHAR)) AS sort_key
  FROM documents),
sharded AS (
  SELECT doc_id, sort_key,
         ((strpos('0123456789abcdef', substr(sort_key, 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(sort_key, 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(sort_key, 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(sort_key, 4, 1)) - 1)) % 16
           AS shard
  FROM keyed)
SELECT CAST(shard AS INTEGER) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       arg_min(doc_id, sort_key) AS head_doc,
       arg_max(doc_id, sort_key) AS tail_doc,
       min(sort_key) AS min_key
FROM sharded GROUP BY shard ORDER BY shard
"""


_PACK_BUDGET = 2048


def sample_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window packing over the documents table: docs packed
    first-fit-decreasing into 2048-token bins per md5-hash partition
    (the shuffle_shard key, so BOTH engines compute the identical
    partitioning).  Greedy FFD output is not SQL-expressible, but its
    correctness INVARIANTS are — so the query emits a per-partition
    certificate (VERDICT r7 #4, the ε-twin pattern of
    winsorized_prices_approx): exact-hashable columns the oracle
    recomputes (n_docs, clamped token total, the ceil(total/budget)
    bin lower bound) plus five booleans the oracle asserts TRUE —
    every doc packed exactly once (docs_unique + the n_docs match),
    every bin's recorded fill equals its members' clamped token sum
    (fills_consistent), no bin over budget (max_fill_ok), bin count >=
    the pigeonhole lower bound (bins_ge_lb), and the first-fit
    certificate that AT MOST ONE bin is <= half-full (first_fit_cert —
    if two bins ended <= B/2 the later one's first item would have fit
    in the earlier, so FFD would never have opened it; this bounds
    n_bins < 2*OPT+1 without trusting the packer).  Every emitted
    value is a pure function of the per-partition token MULTISET, so
    the output is deterministic even though tie order inside
    applyInPandas is not.  The 11/9*OPT+6/9 FFD bound is NOT asserted:
    it holds vs true OPT, which can exceed the SQL-computable
    pigeonhole bound, so checking it against ceil(total/budget) could
    legitimately fail.

    Scale: shuffles only (doc_id, n_tokens, shard); the Arrow kernel
    is linear per partition; the certificate is two map-side-combined
    groupBys over one row per doc."""
    from storagetapper_spark.operators.sampling import (pack_sequences,
                                                        shuffle_shard)

    b = _PACK_BUDGET
    docs = t(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"))
    sharded = (shuffle_shard(docs, n_shards=64, seed="pack")
               .select("doc_id", "n_tokens",
                       F.col("shard").cast("long").alias("pack_key")))
    packed = pack_sequences(sharded, budget=b, part_col="pack_key")
    cl = F.least(F.col("n_tokens"), F.lit(b))
    bins = (packed.groupBy("pack_partition", "bin_id")
            .agg(F.count(F.lit(1)).alias("bin_docs"),
                 F.countDistinct("doc_id").alias("bin_docs_distinct"),
                 F.sum(cl).alias("member_sum"),
                 F.min("bin_fill").alias("fill_min"),
                 F.max("bin_fill").alias("fill_max")))
    cert = (bins.groupBy("pack_partition")
            .agg(F.sum("bin_docs").alias("n_docs"),
                 F.sum("bin_docs_distinct").alias("n_docs_distinct"),
                 F.count(F.lit(1)).alias("n_bins"),
                 F.sum("member_sum").alias("total_clamped"),
                 F.max("fill_max").alias("max_fill"),
                 F.sum(F.when((F.col("fill_min") != F.col("fill_max"))
                              | (F.col("fill_min") != F.col("member_sum")),
                              1).otherwise(0)).alias("bad_bins"),
                 F.sum(F.when(F.col("fill_max") * 2 <= F.lit(b), 1)
                       .otherwise(0)).alias("half_empty_bins")))
    min_bins = F.expr(f"(total_clamped + {b - 1}) div {b}")
    return (cert.select(
        F.col("pack_partition").cast("int").alias("pack_partition"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_clamped").cast("long").alias("total_tokens_clamped"),
        min_bins.cast("long").alias("min_bins"),
        (F.col("n_docs") == F.col("n_docs_distinct")).alias("docs_unique"),
        (F.col("bad_bins") == 0).alias("fills_consistent"),
        (F.col("max_fill") <= b).alias("max_fill_ok"),
        (F.col("n_bins") >= min_bins).alias("bins_ge_lb"),
        (F.col("half_empty_bins") <= 1).alias("first_fit_cert"))
        .orderBy("pack_partition"))


PACK_SEQUENCES_SQL = f"""
WITH toks AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
         md5('pack' || '|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
sharded AS (
  SELECT doc_id, least(n_tokens, {_PACK_BUDGET}) AS cl,
         ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 4096
        + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 256
        + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
        + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1)) % 64
           AS pack_partition
  FROM toks
)
SELECT CAST(pack_partition AS INTEGER) AS pack_partition,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(cl) AS BIGINT) AS total_tokens_clamped,
       CAST((sum(cl) + {_PACK_BUDGET - 1}) // {_PACK_BUDGET} AS BIGINT)
         AS min_bins,
       TRUE AS docs_unique, TRUE AS fills_consistent,
       TRUE AS max_fill_ok, TRUE AS bins_ge_lb, TRUE AS first_fit_cert
FROM sharded GROUP BY pack_partition ORDER BY pack_partition
"""


QUERIES = {
    "text_chunk_fixed": (text_chunk_fixed, CHUNK_FIXED_SQL),
    "text_chunk_tokens": (text_chunk_tokens, CHUNK_TOKENS_SQL),
    "sample_split": (sample_split, SAMPLE_SPLIT_SQL),
    "sample_mixture": (sample_mixture, SAMPLE_MIXTURE_SQL),
    "multimodal_manifest": (multimodal_manifest, MULTIMODAL_MANIFEST_SQL),
    "agg_salted_skew": (agg_salted_skew, AGG_SALTED_SQL),
    "sample_shuffle_shard": (sample_shuffle_shard, SHUFFLE_SHARD_SQL),
    "sample_pack_sequences": (sample_pack_sequences, PACK_SEQUENCES_SQL),
}
