"""Dedup analytics batch 2: cosine threshold sweep, cross-source
duplicate matrix, basket-size histogram — the calibration and
provenance readouts around the dedup operators (companions to
dedup_minhash_calibration and dedup_savings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_SWEEP_THRS = [30, 35, 40, 45]  # cosine · 100 (fixture cosines are low)


def dedup_cosine_threshold_sweep(spark: SparkSession, sf: str
                                 ) -> DataFrame:
    """Threshold calibration for semantic dedup: for each candidate
    cosine threshold, how many near-dup pairs and how many distinct
    vectors would be implicated?  Pairs are generated ONCE from the
    same-label blocked join (dedup_embedding_cosine's shape — shuffles
    on the block key, never all-pairs); the sweep is conditional
    aggregation over that single pair set.

    r10 optimization (guide §1.2/§2.3): per-vector norms are computed
    once per ROW before the join (N·D work) instead of once per PAIR
    (P·D work) — the norm fold is the identical left-to-right IEEE
    expression, so cos is bit-equal; and both sweep outputs (pair count
    + distinct-vector count) come from ONE aggregation over ONE
    evaluation of the join (explode [ida, idb] → count/2 + distinct
    count), where the previous shape referenced the join subtree twice
    and computed the cosine join twice per run."""
    emb = t(spark, sf, "embeddings")
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: x * x),
        F.lit(0.0), lambda acc, v: acc + v))
    vec = emb.select("vec_id", "label",
                     F.col("embedding").cast("array<double>").alias("e"),
                     nrm.alias("nrm"))
    a = vec.select(F.col("vec_id").alias("ida"), "label",
                   F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = vec.select(F.col("vec_id").alias("idb"),
                   F.col("label").alias("lb"),
                   F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v)
    cos = F.round(dot / (F.col("na") * F.col("nb")), 6)
    pairs = (a.join(b, (F.col("label") == F.col("lb"))
                    & (F.col("ida") < F.col("idb")))
             .select("ida", "idb", cos.alias("cos"))
             .filter(F.col("cos") >= _SWEEP_THRS[0] / 100.0))
    thr = F.explode(F.array(
        *[F.lit(x) for x in _SWEEP_THRS])).alias("thr_pct")
    hits = (pairs.select("*", thr)
            .filter(F.col("cos") >= F.col("thr_pct") / 100.0))
    ex = hits.select("thr_pct",
                     F.explode(F.array("ida", "idb")).alias("vid"))
    return (ex.groupBy("thr_pct")
            .agg((F.count(F.lit(1)) / F.lit(2)).cast("long")
                 .alias("n_pairs"),
                 F.countDistinct("vid").alias("n_vectors"))
            .orderBy("thr_pct"))


_COS_SQL = """round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[]))
       / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                CAST(a.embedding AS DOUBLE[])))
          * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])))), 6)"""

SWEEP_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb, {_COS_SQL} AS cos
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE {_COS_SQL} >= {_SWEEP_THRS[0] / 100.0}
),
hits AS (
  SELECT t.thr_pct, p.ida, p.idb
  FROM pairs p
  CROSS JOIN (SELECT unnest([{", ".join(map(str, _SWEEP_THRS))}])
              AS thr_pct) t
  WHERE p.cos >= t.thr_pct / 100.0
),
np AS (SELECT thr_pct, count(*) AS n_pairs FROM hits GROUP BY 1),
ids AS (
  SELECT thr_pct, count(*) AS n_vectors FROM (
    SELECT DISTINCT thr_pct, vid FROM (
      SELECT thr_pct, unnest([ida, idb]) AS vid FROM hits
    )
  ) GROUP BY thr_pct
)
SELECT np.thr_pct, np.n_pairs, ids.n_vectors
FROM np JOIN ids ON ids.thr_pct = np.thr_pct
ORDER BY np.thr_pct
"""


QUERIES = {
    "dedup_cosine_threshold_sweep":
        (dedup_cosine_threshold_sweep, SWEEP_SQL),
}


def dedup_cross_source_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Which sources restate each other?  Per source pair: distinct
    3-gram shingles BOTH contain and the overlap coefficient
    (shared / min(|A|, |B|), floor-micro), top-15 pairs — the
    provenance matrix that tells a curation owner whether source B
    mirrors source A (feed suppression beats post-hoc dedup).  The
    fixture has zero cross-source EXACT duplicates (verified), so the
    matrix runs at shingle granularity; shingles dedupe per document
    before exploding (the contamination_check lesson) and the pair
    join runs on the distinct (shingle, source) table."""
    from storagetapper_spark.plans.datapipe7 import _NG, _norm

    norm = _norm(spark, sf)
    idx = F.sequence(F.lit(0), F.size("w") - _NG)
    sh = F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", *[
            F.element_at(F.col("w"), (i + j + 1).cast("int"))
            for j in range(_NG)])))
    gs = (norm.filter(F.size("w") >= _NG)
          .select("source", F.explode(sh).alias("g")).distinct())
    sizes = gs.groupBy("source").agg(F.count(F.lit(1)).alias("n_g"))
    a = gs.select("g", F.col("source").alias("s1"))
    b = gs.select(F.col("g").alias("g2"), F.col("source").alias("s2"))
    shared = (a.join(b, (F.col("g") == F.col("g2"))
                     & (F.col("s1") < F.col("s2")))
              .groupBy("s1", "s2")
              .agg(F.count(F.lit(1)).alias("n_shared")))
    na = sizes.select(F.col("source").alias("s1"),
                      F.col("n_g").alias("n1"))
    nb = sizes.select(F.col("source").alias("s2"),
                      F.col("n_g").alias("n2"))
    ov = (F.col("n_shared").cast("double") * 1000000
          / F.least("n1", "n2").cast("double"))
    return (shared.join(F.broadcast(na), "s1")
            .join(F.broadcast(nb), "s2")
            .select("s1", "s2", "n_shared",
                    F.floor(ov).cast("long").alias("overlap_micro"))
            .orderBy(F.desc("overlap_micro"), "s1", "s2")
            .limit(15))


CROSS_SOURCE_SQL = """
WITH norm AS (
  SELECT doc_id, source,
         string_split(trim(regexp_replace(
             regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
             ' +', ' ', 'g')), ' ') AS w
  FROM documents
),
gs AS (
  SELECT DISTINCT source, g FROM (
    SELECT source,
           unnest(list_distinct(list_transform(
               range(1, len(w) - 1),
               i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
    FROM norm WHERE len(w) >= 3
  )
),
sizes AS (SELECT source, count(*) AS n_g FROM gs GROUP BY source),
shared AS (
  SELECT a.source AS s1, b.source AS s2, count(*) AS n_shared
  FROM gs a JOIN gs b ON a.g = b.g AND a.source < b.source
  GROUP BY 1, 2
)
SELECT sh.s1, sh.s2, sh.n_shared,
       CAST(floor(CAST(sh.n_shared AS DOUBLE) * 1000000
                  / CAST(least(na.n_g, nb.n_g) AS DOUBLE)) AS BIGINT)
         AS overlap_micro
FROM shared sh
JOIN sizes na ON na.source = sh.s1
JOIN sizes nb ON nb.source = sh.s2
ORDER BY overlap_micro DESC, sh.s1, sh.s2
LIMIT 15
"""


QUERIES["dedup_cross_source_matrix"] = (dedup_cross_source_matrix,
                                        CROSS_SOURCE_SQL)


def basket_size_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Items-per-order histogram with order and item shares — the
    basket-shape profile behind the co-occurrence family (its pair
    fan-out is Σ size², read directly off this table).  Two map-side
    combinable aggs."""
    li = t(spark, sf, "lineitem")
    per_order = (li.groupBy("l_orderkey")
                 .agg(F.count(F.lit(1)).alias("size")))
    tot = per_order.agg(F.count(F.lit(1)).alias("n_orders"),
                        F.sum("size").alias("n_items"))
    return (per_order.groupBy("size")
            .agg(F.count(F.lit(1)).alias("n_orders_of_size"))
            .crossJoin(F.broadcast(tot))
            .select("size", "n_orders_of_size",
                    F.floor(F.col("n_orders_of_size") * 1000000
                            / F.col("n_orders")).cast("long")
                    .alias("order_share_micro"),
                    F.floor(F.col("n_orders_of_size") * F.col("size")
                            * 1000000 / F.col("n_items")).cast("long")
                    .alias("item_share_micro"))
            .orderBy("size"))


BASKET_SQL = """
WITH per_order AS (
  SELECT l_orderkey, count(*) AS size FROM lineitem GROUP BY 1
),
tot AS (
  SELECT count(*) AS n_orders, CAST(sum(size) AS BIGINT) AS n_items
  FROM per_order
)
SELECT p.size, count(*) AS n_orders_of_size,
       CAST(floor(count(*) * 1000000 / t.n_orders) AS BIGINT)
         AS order_share_micro,
       CAST(floor(count(*) * p.size * 1000000 / t.n_items) AS BIGINT)
         AS item_share_micro
FROM per_order p CROSS JOIN tot t
GROUP BY p.size, t.n_orders, t.n_items
ORDER BY p.size
"""


QUERIES["basket_size_histogram"] = (basket_size_histogram, BASKET_SQL)


def dedup_normalized_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup AFTER text canonicalization (lowercase, strip
    non-alphanumerics, collapse whitespace) — the layer between raw
    exact dedup and MinHash that catches byte-differing re-encodes of
    the same content (case, punctuation, wrapping).  Reports how many
    extra duplicates normalization surfaces over raw exact dedup
    (dedup_exact's hash) and the largest normalized cluster.

    Scale: two content-hash groupBys (raw and normalized) over one
    scan — the same single-shuffle shape as dedup_exact; the summary
    is a scalar reduce."""
    docs = t(spark, sf, "documents")
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
        " +", " "))
    hashed = docs.select(
        F.md5(F.col("text")).alias("h_raw"),
        F.md5(norm).alias("h_norm"))
    per_norm = hashed.groupBy("h_norm").agg(F.count(F.lit(1)).alias("c"))
    raw_distinct = hashed.agg(
        F.countDistinct("h_raw").alias("distinct_raw"),
        F.count(F.lit(1)).alias("n_docs"))
    norm_stats = per_norm.agg(
        F.count(F.lit(1)).alias("distinct_norm"),
        F.max("c").alias("largest_cluster"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .alias("docs_in_dup_clusters"))
    return (raw_distinct.crossJoin(F.broadcast(norm_stats))
            .select("n_docs", "distinct_raw", "distinct_norm",
                    (F.col("n_docs") - F.col("distinct_norm"))
                    .alias("dupes_normalized"),
                    (F.col("distinct_raw") - F.col("distinct_norm"))
                    .alias("extra_vs_raw"),
                    "largest_cluster", "docs_in_dup_clusters"))


NORM_EXACT_SQL = """
WITH hashed AS (
  SELECT md5(text) AS h_raw,
         md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h_norm
  FROM documents
),
per_norm AS (SELECT h_norm, count(*) AS c FROM hashed GROUP BY 1),
raw_d AS (
  SELECT count(DISTINCT h_raw) AS distinct_raw, count(*) AS n_docs
  FROM hashed
),
norm_s AS (
  SELECT count(*) AS distinct_norm, max(c) AS largest_cluster,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
           AS docs_in_dup_clusters
  FROM per_norm
)
SELECT n_docs, distinct_raw, distinct_norm,
       n_docs - distinct_norm AS dupes_normalized,
       distinct_raw - distinct_norm AS extra_vs_raw,
       largest_cluster, docs_in_dup_clusters
FROM raw_d CROSS JOIN norm_s
"""


QUERIES["dedup_normalized_exact"] = (dedup_normalized_exact, NORM_EXACT_SQL)
