"""cell_rank_np / cosine_score_np (operators/similarity): the r10
Arrow/numpy ANN kernels must reproduce the round-6 cosine and the
(sim DESC, centroid_id/vec_id ASC) selection of the expression forms
they replaced — checked against the literal crossJoin+window /
F.round(cosine(...), 6) plans on seeded random vectors.
"""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from storagetapper_spark.operators.similarity import (
    cell_rank_np,
    cosine,
    cosine_score_np,
)

DIM, N, K = 64, 40, 6


def _vecs(seed, n):
    rng = random.Random(seed)
    return [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(n)]


def test_cosine_score_np_matches_expression(spark):
    a = _vecs(3, N)
    b = _vecs(4, N)
    df = spark.createDataFrame(
        [(i, a[i], b[i]) for i in range(N)],
        "pid long, v array<double>, qv array<double>")
    want = {r.pid: r.sim for r in df.select(
        "pid", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("sim"))
        .collect()}
    got = {r.pid: r.sim
           for r in cosine_score_np(df, "v", "qv", ["pid"]).collect()}
    assert got == want


def test_cell_rank_np_matches_window_form(spark):
    vs = _vecs(5, N)
    cents = _vecs(6, K)
    df = spark.createDataFrame(
        [(i, vs[i]) for i in range(N)], "vec_id long, v array<double>")
    cent = spark.createDataFrame(
        [(i, cents[i]) for i in range(K)],
        "centroid_id long, cv array<double>")
    w = Window.partitionBy("vec_id").orderBy(
        F.round(cosine(F.col("v"), F.col("cv")), 6).desc(),
        F.col("centroid_id"))
    for max_rank in (1, 3):
        want = {(r.vec_id, r.rn): r.centroid_id
                for r in df.crossJoin(F.broadcast(cent))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") <= max_rank).collect()}
        got = {(r.vec_id, r.rn): r.centroid_id
               for r in cell_rank_np(
                   df, [(i, cents[i]) for i in range(K)],
                   "vec_id", "v", max_rank).collect()}
        assert got == want, max_rank


def test_cell_rank_np_tie_break_lowest_centroid(spark):
    # duplicate centroids force exact round-6 ties at every rank
    v = _vecs(7, 5)
    c0 = _vecs(8, 1)[0]
    cents = [(0, c0), (1, list(c0)), (2, list(c0))]
    df = spark.createDataFrame(
        [(i, v[i]) for i in range(5)], "vec_id long, v array<double>")
    rows = cell_rank_np(df, cents, "vec_id", "v", 3).collect()
    for r in rows:
        assert r.centroid_id == r.rn - 1
