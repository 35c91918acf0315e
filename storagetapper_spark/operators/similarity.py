"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; an LSH-bucketed
(random-hyperplane / SRP) variant as the 100 TB scale path — buckets cut
the candidate set from |corpus| to |bucket| per query, trading recall
for a ~2^planes reduction in compared pairs.

All dot products are pure Column expressions (zip_with + aggregate in
double precision — deterministic left-to-right fold, exactly matching a
sequential oracle).  The query side is broadcast: top-k never shuffles
the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k per query.  The query set is broadcast (small
    by assumption); the corpus streams through map-side; the only
    shuffle is the final per-query top-k (k rows per query after the
    window — AQE-coalesced, tiny)."""
    q = F.broadcast(queries.select(F.col(query_id_col),
                                   F.col(vec_col).alias("_qvec")))
    corpus = corpus.repartition(corpus.sparkSession.sparkContext.defaultParallelism)
    sim = F.round(cosine(F.col(vec_col), F.col("_qvec")), 6)
    scored = (
        corpus.crossJoin(q)
              .select(F.col(query_id_col), F.col(id_col), sim.alias("cosine_sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection bucket id: bit i = sign(vec · plane_i).
    Planes are plain Python float lists (deterministic, seeded by caller)
    folded into the expression — broadcast as literals, no UDF."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]),
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def make_planes(dim: int, n_planes: int = 6, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (LCG — no numpy needed at
    plan-build time, reproducible across engines)."""
    state = seed
    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append(((state >> 33) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", n_planes: int = 6,
             dim: int = 64, seed: int = 42) -> DataFrame:
    """Approximate top-k: compare only within the query's SRP bucket.
    At 100 TB the bucket column is computed once at ingest and the
    corpus is partitioned/bucketed by it, turning ANN into a co-located
    per-bucket scan instead of a full cross join."""
    planes = make_planes(dim, n_planes, seed)
    c = corpus.withColumn("_bucket", srp_bucket(F.col(vec_col), planes))
    q = F.broadcast(
        queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec"))
               .withColumn("_bucket", srp_bucket(F.col("_qvec"), planes)))
    sim = F.round(cosine(F.col(vec_col), F.col("_qvec")), 6)
    scored = (
        c.join(q, on="_bucket")
         .select(F.col(query_id_col), F.col(id_col), sim.alias("cosine_sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine_sim").desc(), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def embedding_near_dup(corpus: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding", threshold: float = 0.95,
                       n_planes: int = 8, dim: int = 64, seed: int = 7) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP blocking: pairs in
    the same bucket with cosine ≥ threshold.  (Exact variant = blocking
    on a metadata column instead; same downstream.)"""
    planes = make_planes(dim, n_planes, seed)
    c = corpus.select(id_col, vec_col).withColumn("_bucket", srp_bucket(F.col(vec_col), planes))
    a, b = c.alias("a"), c.alias("b")
    sim = F.round(cosine(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")), 6)
    return (
        a.join(b, on="_bucket")
         .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
         .select(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"),
                 sim.alias("cosine_sim"))
         .filter(F.col("cosine_sim") >= threshold)
    )
