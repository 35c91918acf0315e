"""Approximation-quality measurements: IVF recall@k against brute force,
MinHash-LSH precision/recall against ground-truth near-duplicates.
These pin the quality of the approximate scale paths, not just their
plumbing — a recall regression fails the build."""

import random

import pytest
from pyspark.sql import functions as F

from storagetapper_spark.operators.dedup import minhash_lsh_pairs
from storagetapper_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    train_centroids,
)

np = pytest.importorskip("numpy")

DIM, K = 32, 5


@pytest.fixture(scope="module")
def clustered_vectors(spark):
    """1000 corpus + 20 query vectors drawn around 16 cluster centers —
    the regime IVF is built for."""
    rng = np.random.default_rng(42)
    centers = rng.normal(size=(16, DIM)) * 4.0
    rows, queries = [], []
    for i in range(1000):
        c = i % 16
        v = centers[c] + rng.normal(size=DIM)
        rows.append((i + 100, [float(x) for x in v]))
    for qi in range(20):
        c = qi % 16
        v = centers[c] + rng.normal(size=DIM)
        queries.append((qi, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qdf = spark.createDataFrame(queries, "query_id long, embedding array<float>")
    return corpus, qdf


def test_ivf_recall_at_k(clustered_vectors):
    corpus, queries = clustered_vectors
    exact = brute_force_topk(corpus, queries, k=K)
    approx = ivf_topk(corpus, queries, k=K, n_centroids=16, n_probe=4)

    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    for r in approx.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)

    recalls = [len(truth[q] & got.get(q, set())) / K for q in truth]
    mean_recall = sum(recalls) / len(recalls)
    # probing 4/16 cells of well-clustered data must find most true
    # neighbors; regression here means assignment/probe logic broke
    assert mean_recall >= 0.8, f"IVF recall@{K} = {mean_recall:.2f}"

    # k-means||-trained centroids (the production path) must do at
    # least as well as the naive first-N seed on clustered data
    trained = train_centroids(corpus, 16, max_iter=5)
    approx_t = ivf_topk(corpus, queries, k=K, n_centroids=16, n_probe=4,
                        centroids=trained)
    got_t = {}
    for r in approx_t.collect():
        got_t.setdefault(r.query_id, set()).add(r.vec_id)
    recall_t = sum(len(truth[q] & got_t.get(q, set())) / K
                   for q in truth) / len(truth)
    assert recall_t >= mean_recall - 0.05, (
        f"trained-centroid recall {recall_t:.2f} < naive {mean_recall:.2f}")
    assert recall_t >= 0.9, f"trained IVF recall@{K} = {recall_t:.2f}"


def _word_doc(rng, n_words=60):
    return " ".join(f"w{rng.randrange(2000)}" for _ in range(n_words))


def _perturb(rng, text, frac=0.08):
    words = text.split()
    n_swap = max(1, int(len(words) * frac))
    for _ in range(n_swap):
        words[rng.randrange(len(words))] = f"w{rng.randrange(2000)}"
    return " ".join(words)


def test_minhash_lsh_precision_recall(spark):
    rng = random.Random(7)
    docs, truth_pairs = [], set()
    next_id = 0
    for _ in range(80):
        base = _word_doc(rng)
        docs.append((next_id, base))
        base_id = next_id
        next_id += 1
        if rng.random() < 0.4:           # ~32 near-dup pairs
            docs.append((next_id, _perturb(rng, base)))
            truth_pairs.add((base_id, next_id))
            next_id += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")

    cand = minhash_lsh_pairs(df, num_hashes=16, bands=8, shingle_n=3)
    flagged = {(r.id_a, r.id_b) for r in
               cand.filter(F.col("jaccard_est") >= 0.4).collect()}

    tp = len(flagged & truth_pairs)
    recall = tp / len(truth_pairs)
    precision = tp / max(len(flagged), 1)
    # 8% word-perturbation kills ~3x8=24% of 3-shingles -> true Jaccard
    # ≈ 0.76/1.24 ≈ 0.6; 8 bands x 2 rows catches J=0.6 with
    # p ≈ 1-(1-J^2)^8 ≈ 0.97; unrelated docs have J ≈ 0 -> est ≈ 0
    assert recall >= 0.85, f"LSH recall = {recall:.2f} ({tp}/{len(truth_pairs)})"
    assert precision >= 0.9, f"LSH precision = {precision:.2f}"


def test_lsh_plan_properties():
    """lsh_plan: the s-curve p(J)=1-(1-J^r)^b must catch pairs above the
    target threshold and reject the unrelated-pair regime."""
    from storagetapper_spark.operators.dedup import lsh_plan

    def p(j, b, r):
        return 1 - (1 - j ** r) ** b

    for n in (16, 32, 64, 128):
        for th in (0.5, 0.6, 0.7, 0.8, 0.9):
            b, r = lsh_plan(th, n)
            assert b * r == n
            # pairs at/above the threshold are caught with high odds
            assert p(min(th + 0.2, 0.95), b, r) >= 0.85, (n, th, b, r)
            # the unrelated-pair regime stays under the budget
            assert p(0.10, b, r) <= 0.10, (n, th, b, r)
            assert p(0.05, b, r) <= 0.05, (n, th, b, r)
            # optimality: no budget-satisfying divisor catches more
            for b2 in range(1, n + 1):
                if n % b2 or b2 == b:
                    continue
                r2 = n // b2
                if p(0.10, b2, r2) <= 0.10:
                    assert p(th, b, r) >= p(th, b2, r2), (n, th, b, r, b2)
    # the measured corpus regime (J≈0.6, 16 hashes) picks the banding
    # the precision/recall test validated empirically
    assert lsh_plan(0.6, 16) == (8, 2)
