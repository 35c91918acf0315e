"""Similarity-search operator semantics."""

import math

from storagetapper_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup,
    lsh_topk,
    make_planes,
)


def _corpus(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [1.0, 0.0, 0.0, 0.0]),   # identical to 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_exact(spark):
    corpus = _corpus(spark)
    queries = (corpus.filter("vec_id = 1")
               .selectExpr("vec_id as query_id", "embedding"))
    got = brute_force_topk(corpus, queries, k=3).collect()
    assert [r.vec_id for r in got] == [1, 5, 2]   # self, twin, near
    assert got[0].cosine_sim == 1.0 and got[1].cosine_sim == 1.0
    expected = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(got[2].cosine_sim - round(expected, 6)) < 1e-6


def test_lsh_topk_contains_twin(spark):
    corpus = _corpus(spark)
    queries = corpus.filter("vec_id = 1").selectExpr("vec_id as query_id", "embedding")
    got = lsh_topk(corpus, queries, k=3, dim=4)
    ids = [r.vec_id for r in got.collect()]
    # identical vector always lands in the same SRP bucket
    assert 5 in ids and 1 in ids


def test_embedding_near_dup(spark):
    pairs = embedding_near_dup(_corpus(spark), threshold=0.999, dim=4).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 5)}
    assert pairs[0].cosine_sim == 1.0


def test_planes_deterministic():
    assert make_planes(8, 4, seed=1) == make_planes(8, 4, seed=1)
    assert make_planes(8, 4, seed=1) != make_planes(8, 4, seed=2)
    p = make_planes(16, 6)
    assert len(p) == 6 and len(p[0]) == 16
    assert all(-1.0 <= x <= 1.0 for row in p for x in row)


def test_semantic_dedup_invariants(spark, sf_dir):
    """SemDeDup decisions: every duplicate component lives inside ONE
    centroid cell, the canonical member is the component min id, and
    each component keeps exactly one canonical."""
    from pyspark.sql import functions as F

    from storagetapper_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dec = semantic_dedup(emb, n_centroids=8, threshold=0.35).persist()
    rows = dec.collect()
    assert len(rows) == emb.count()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        assert comp == min(m.vec_id for m in members)
        canon = [m for m in members if m.is_canonical]
        assert len(canon) == 1 and canon[0].vec_id == comp
        if len(members) > 1:
            assert len({m.cell for m in members}) == 1, comp
    # at least one non-trivial duplicate group at this threshold
    assert any(len(m) > 1 for m in by_comp.values())
    dec.unpersist()
