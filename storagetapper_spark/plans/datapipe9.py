"""Round-6 training-data pipeline batch: stratified reservoir
sampling, minhash-over-adjacency link prediction support, FDR
correction, and product-quantization assignment — the sampling /
multiple-testing / vector-compression layer of a large-scale data
pipeline (SURVEY.md §2.7 addendum).

All queries follow the house rules: exact integers at rounding
boundaries (micro-units + floor), salted-md5 determinism instead of
RNG, per-key windows with map-side group limits, oracles that replay
every cap and hash bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_RES_K = 50
_RES_SALT = "r6"


def sample_reservoir_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-k uniform sample per language stratum via the
    deterministic bottom-k sketch (operators/sampling.
    stratified_reservoir): rank docs by salted md5, keep the 50
    smallest per lang.  Equivalent to per-stratum reservoir sampling
    but order-free and mergeable — the property the streaming fold
    (streaming/reservoir.py) and map-side WindowGroupLimit both
    exploit; at 100 TB each task ships ≤ k rows per stratum into the
    one shuffle."""
    from storagetapper_spark.operators.sampling import stratified_reservoir

    docs = t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return (stratified_reservoir(docs, ["lang"], _RES_K,
                                 salt=_RES_SALT)
            .select("lang", "rk", "doc_id", "n_chars")
            .orderBy("lang", "rk"))


SAMPLE_RESERVOIR_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         md5('{_RES_SALT}' || '|' || CAST(doc_id AS VARCHAR)) AS sort_key
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY sort_key, doc_id) AS rk
  FROM keyed
)
SELECT lang, rk, doc_id, n_chars
FROM ranked WHERE rk <= {_RES_K}
ORDER BY lang, rk
"""


QUERIES = {
    "sample_reservoir_stratified":
        (sample_reservoir_stratified, SAMPLE_RESERVOIR_SQL),
}


_PQ_SUBS = 4        # subspaces of 16 dims each
_PQ_SUBDIM = 16
_PQ_K = 8           # codebook entries per subspace
_PQ_DIM = 64


def embedding_pq_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization assignment over the embedding table: split
    each 64-dim vector into 4×16-dim subvectors and code each against
    an 8-entry per-subspace codebook — 4 bytes per vector, the 64×
    compression every billion-scale ANN index (IVF-PQ) starts from.

    Codebooks are seeded deterministically from vec_id 0..7's
    subvectors (k-means refinement of a codebook is exactly
    ml_kmeans_lloyd run per subspace; this query is the ASSIGN/encode
    path).  The quantized-integer discipline: micro-int coordinates,
    exact int64 subspace distances (≤ 16·(2·10⁶ µ)² ≈ 6·10¹³ per
    pair), argmin ties to the lowest code in both engines, distortion
    sums in DECIMAL(38,0)/HUGEINT so the aggregate never overflows at
    any corpus size.

    Scale shape: one NARROW map pass per row against 4×8×16 literal
    centroids (the codebook broadcasts; rows never shuffle for
    assignment), then one 32-key aggregation with map-side partials.
    Output: (subspace, code, n_vecs, distortion_sum) — 32 rows."""
    xq = (t(spark, sf, "embeddings")
          .select("vec_id",
                  F.transform(F.col("embedding"),
                              lambda x: F.floor(x.cast("double") * 1000000)
                              .cast("long")).alias("xq")))
    seeds = (xq.filter(F.col("vec_id") < _PQ_K)
             .select("vec_id", "xq").collect())
    cb = {int(r.vec_id): [int(v) for v in r.xq] for r in seeds}
    assert len(cb) == _PQ_K

    # r10 (guide §4.2): encode in ONE Arrow/numpy pass — the expression
    # form paid 4×8 interpreted zip_with/aggregate folds per row.
    # Exact int64 distances and the argmin tie-break are identical
    # (operators/similarity.pq_encode_np), so (sub, code, d) rows are
    # bit-equal and the aggregate below is unchanged.
    from storagetapper_spark.operators.similarity import pq_encode_np

    assigned = pq_encode_np(xq, cb, _PQ_SUBS, _PQ_SUBDIM, with_dist=True)
    return (assigned
            .groupBy(F.col("sub").alias("subspace"), "code")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 # decimal accumulation (overflow-safe at any scale),
                 # BIGINT at the boundary (HUGEINT→float64 pandas trap)
                 F.sum(F.col("d").cast("decimal(38,0)"))
                 .cast("long").alias("distortion_sum"))
            .orderBy("subspace", "code"))


PQ_ASSIGN_SQL = f"""
WITH x AS MATERIALIZED (
  SELECT vec_id, jj.range AS j,
         CAST(floor(CAST(embedding[CAST(jj.range AS INTEGER) + 1]
                         AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM embeddings CROSS JOIN range({_PQ_DIM}) jj
),
cb AS (SELECT vec_id AS k, j, x AS c FROM x WHERE vec_id < {_PQ_K}),
dist AS (
  SELECT x.vec_id, x.j // {_PQ_SUBDIM} AS sub, cb.k,
         CAST(sum((x.x - cb.c) * (x.x - cb.c)) AS BIGINT) AS d
  FROM x JOIN cb ON x.j = cb.j
  GROUP BY x.vec_id, x.j // {_PQ_SUBDIM}, cb.k
),
assigned AS (
  SELECT vec_id, sub, k AS code, d FROM (
    SELECT dist.*, ROW_NUMBER() OVER (
      PARTITION BY vec_id, sub ORDER BY d ASC, k ASC) AS rn
    FROM dist)
  WHERE rn = 1
)
SELECT sub AS subspace, code, count(*) AS n_vecs,
       CAST(sum(CAST(d AS HUGEINT)) AS BIGINT) AS distortion_sum
FROM assigned
GROUP BY sub, code
ORDER BY subspace, code
"""


QUERIES["embedding_pq_assign"] = (embedding_pq_assign, PQ_ASSIGN_SQL)


_IVFPQ_CELLS = 8     # coarse cells (centroids = first 8 corpus vecs)
_IVFPQ_NPROBE = 2
_IVFPQ_TOPK = 5


def ann_ivf_pq_search(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ approximate nearest-neighbor search — the composition of
    the coarse-cell (ann_ivf) and product-quantization
    (embedding_pq_assign) layers into the billion-scale serving shape:
    queries probe nprobe=2 of 8 coarse cells, and distances inside a
    cell are asymmetric-distance (ADC) lookups against the 4×8 PQ
    codebook instead of full-vector math.

    Fully deterministic and oracle-replayed end to end: coarse
    centroids = first 8 corpus vectors (vec_id 5..12), codebook
    entries = subvectors of the next 8 (vec_id 13..20), micro-int
    coordinates, exact int64 squared-L2 everywhere, every argmin
    tie-broken on the lower id — the ann_ivf convention (queries =
    vec_id < 5, corpus ≥ 5, k = 5).

    Scale shape: cell assignment and PQ encoding are NARROW map passes
    against literal centroid/codebook arrays (model broadcasts, rows
    never shuffle to assign); the ADC lookup table is queries×4×8 = 160
    rows broadcast; search touches only probed cells (partition
    pruning by cell at 100 TB — the encoded table is written
    partitioned by cell); the per-query top-k is a WindowGroupLimit
    rank (map-side partial top-5)."""
    from pyspark.sql import Window

    emb = (t(spark, sf, "embeddings")
           .select("vec_id",
                   F.transform(F.col("embedding"),
                               lambda x: F.floor(x.cast("double") * 1000000)
                               .cast("long")).alias("xq")))
    # r10: no corpus persist (at 100 TB the corpus cannot be cached and
    # the model rows are a pushed-down vec_id-range scan at any scale),
    # and ONE model collect instead of two separate jobs.
    corpus = emb.filter(F.col("vec_id") >= 5)
    queries = emb.filter(F.col("vec_id") < 5)

    model_rows = sorted(
        emb.filter((F.col("vec_id") >= 5)
                   & (F.col("vec_id") < 5 + _IVFPQ_CELLS + _PQ_K))
           .select("vec_id", "xq").collect(),
        key=lambda r: r.vec_id)
    coarse = {i: [int(v) for v in r.xq]
              for i, r in enumerate(model_rows[:_IVFPQ_CELLS])}
    cb = {i: [int(v) for v in r.xq]
          for i, r in enumerate(model_rows[_IVFPQ_CELLS:])}
    assert len(coarse) == _IVFPQ_CELLS and len(cb) == _PQ_K

    # r10 (guide §4.2): cell assignment + PQ encoding in ONE Arrow/numpy
    # pass (operators/similarity.pq_encode_np) — the expression form
    # paid 8 + 4×8 interpreted zip_with/aggregate folds per corpus row
    # (whole-stage codegen never compiles HOF lambdas).  Exact int64
    # math and the argmin tie-break are identical, so the output rows
    # are bit-equal.
    from storagetapper_spark.operators.similarity import pq_encode_np

    encoded = pq_encode_np(corpus, cb, _PQ_SUBS, _PQ_SUBDIM,
                           coarse=coarse)

    # Probe list + ADC lookup table, built DRIVER-SIDE in exact int64
    # numpy (r10): the query panel is a FIXED 5-vector collect (the
    # brute_force_topk_np precedent) and the outputs are nprobe×5 = 10
    # and 5×4×8 = 160 rows — but as expressions they were 8 + 32
    # inlined interpreted folds over 64-element literal arrays, whose
    # Catalyst planning/codegen dwarfed the whole query's execution
    # (~9s of a 10s run at sf0.1; the data work is milliseconds).
    # Selection order is identical: stable argsort over (d, k-ascending
    # layout) == array_sort of struct(d, k).
    import numpy as np

    q_rows = sorted(queries.select("vec_id", "xq").collect(),
                    key=lambda r: r.vec_id)
    Q = np.array([[int(v) for v in r.xq] for r in q_rows], dtype=np.int64)
    C = np.array([coarse[k] for k in sorted(coarse)], dtype=np.int64)
    B = np.array([cb[k] for k in sorted(cb)], dtype=np.int64)
    dq = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    probe_rows = [(int(r.vec_id), int(c))
                  for r, dr in zip(q_rows, dq)
                  for c in np.argsort(dr, kind="stable")[:_IVFPQ_NPROBE]]
    probes = spark.createDataFrame(probe_rows, "query_id long, cell long")
    lut_rows = []
    for r, qv in zip(q_rows, Q):
        for s in range(_PQ_SUBS):
            qs = qv[s * _PQ_SUBDIM:(s + 1) * _PQ_SUBDIM]
            bs = B[:, s * _PQ_SUBDIM:(s + 1) * _PQ_SUBDIM]
            dsub = ((qs[None, :] - bs) ** 2).sum(axis=1)
            lut_rows += [(int(r.vec_id), s, k, int(dsub[k]))
                         for k in range(_PQ_K)]
    lut = spark.createDataFrame(
        lut_rows, "query_id long, sub long, code long, d long")

    cand = (encoded.join(F.broadcast(probes), "cell")
            .join(F.broadcast(lut), ["query_id", "sub", "code"])
            .groupBy("query_id", "vec_id")
            .agg(F.sum("d").alias("approx_d")))
    w = Window.partitionBy("query_id").orderBy("approx_d", "vec_id")
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _IVFPQ_TOPK)
            .select("query_id", "vec_id", "approx_d", "rank")
            .orderBy("query_id", "rank"))


_IVFPQ_L2 = ("CAST(sum((a.x - b.x) * (a.x - b.x)) AS BIGINT)")

ANN_IVF_PQ_SQL = f"""
WITH x AS MATERIALIZED (
  SELECT vec_id, jj.range AS j,
         CAST(floor(CAST(embedding[CAST(jj.range AS INTEGER) + 1]
                         AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM embeddings CROSS JOIN range({_PQ_DIM}) jj
),
corpus AS (SELECT * FROM x WHERE vec_id >= 5),
q AS (SELECT * FROM x WHERE vec_id < 5),
coarse AS (
  SELECT DENSE_RANK() OVER (ORDER BY vec_id) - 1 AS cell, j, x
  FROM corpus WHERE vec_id < 5 + {_IVFPQ_CELLS}
),
cb AS (
  SELECT DENSE_RANK() OVER (ORDER BY vec_id) - 1 AS code, j, x
  FROM corpus
  WHERE vec_id >= 5 + {_IVFPQ_CELLS}
    AND vec_id < 5 + {_IVFPQ_CELLS} + {_PQ_K}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT a.vec_id, b.cell, {_IVFPQ_L2} AS d,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                              ORDER BY {_IVFPQ_L2} ASC, b.cell ASC) AS rn
    FROM corpus a JOIN coarse b ON a.j = b.j
    GROUP BY a.vec_id, b.cell)
  WHERE rn = 1
),
encoded AS (
  SELECT vec_id, sub, code FROM (
    SELECT a.vec_id, a.j // {_PQ_SUBDIM} AS sub, b.code,
           {_IVFPQ_L2} AS d,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id, a.j // {_PQ_SUBDIM}
                              ORDER BY {_IVFPQ_L2} ASC, b.code ASC) AS rn
    FROM corpus a JOIN cb b ON a.j = b.j
    GROUP BY a.vec_id, a.j // {_PQ_SUBDIM}, b.code)
  WHERE rn = 1
),
probes AS (
  SELECT query_id, cell FROM (
    SELECT a.vec_id AS query_id, b.cell, {_IVFPQ_L2} AS d,
           ROW_NUMBER() OVER (PARTITION BY a.vec_id
                              ORDER BY {_IVFPQ_L2} ASC, b.cell ASC) AS rn
    FROM q a JOIN coarse b ON a.j = b.j
    GROUP BY a.vec_id, b.cell)
  WHERE rn <= {_IVFPQ_NPROBE}
),
lut AS (
  SELECT a.vec_id AS query_id, a.j // {_PQ_SUBDIM} AS sub, b.code,
         {_IVFPQ_L2} AS d
  FROM q a JOIN cb b ON a.j = b.j
  GROUP BY a.vec_id, a.j // {_PQ_SUBDIM}, b.code
),
cand AS (
  SELECT l.query_id, e.vec_id, CAST(sum(l.d) AS BIGINT) AS approx_d
  FROM encoded e
  JOIN assign s ON s.vec_id = e.vec_id
  JOIN probes p ON p.cell = s.cell
  JOIN lut l ON l.query_id = p.query_id AND l.sub = e.sub
            AND l.code = e.code
  GROUP BY l.query_id, e.vec_id
)
SELECT query_id, vec_id, approx_d, rank FROM (
  SELECT cand.*, ROW_NUMBER() OVER (PARTITION BY query_id
                                    ORDER BY approx_d ASC, vec_id ASC)
           AS rank
  FROM cand)
WHERE rank <= {_IVFPQ_TOPK}
ORDER BY query_id, rank
"""


QUERIES["ann_ivf_pq_search"] = (ann_ivf_pq_search, ANN_IVF_PQ_SQL)


def asof_nearest_rate(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest as-of: for every click, the purchase rate closest in
    time in EITHER direction, ties to the earlier one — pandas
    merge_asof direction='nearest', completing the backward /
    forward / nearest trio (operators/asof.asof_join; parity with
    pandas proven property-wise in test_asof_pandas_parity).

    Plan: the same single key-shuffle union as backward asof, with a
    second (reversed-order) window fill over the SAME exchange and a
    per-row winner comparison — one shuffle total, no join of two asof
    results.  The oracle replays nearest as an argmin over the
    user-bounded click×rate candidates (|Δt|, backward-first)."""
    from storagetapper_spark.operators.asof import asof_join

    ev = t(spark, sf, "events")
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("event_id", "user_id", "ts"))
    rates = (ev.filter(F.col("event_type") == "purchase")
             .groupBy("user_id", "ts")
             .agg(F.round(F.max("value"), 2).alias("rate")))
    out = asof_join(clicks, rates, by=["user_id"],
                    left_ts="ts", right_ts="ts", right_cols=["rate"],
                    direction="nearest", suffix="_near")
    return (out.select("event_id", "user_id", "rate_near")
            .orderBy("event_id"))


ASOF_NEAREST_SQL = """
WITH rates AS (
  SELECT user_id, ts, round(max(value), 2) AS rate
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
cand AS (
  SELECT c.event_id, c.user_id, r.rate,
         ROW_NUMBER() OVER (
           PARTITION BY c.event_id
           ORDER BY abs(epoch(c.ts) - epoch(r.ts)) ASC,
                    CASE WHEN r.ts <= c.ts THEN 0 ELSE 1 END ASC) AS rn
  FROM clicks c JOIN rates r ON c.user_id = r.user_id
)
SELECT c.event_id, c.user_id, cand.rate AS rate_near
FROM clicks c LEFT JOIN cand
  ON cand.event_id = c.event_id AND cand.rn = 1
ORDER BY c.event_id
"""


QUERIES["asof_nearest_rate"] = (asof_nearest_rate, ASOF_NEAREST_SQL)
