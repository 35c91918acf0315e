"""Vectorized and IVF ANN variants: agreement with the exact expression
baseline, recall properties."""

from storagetapper_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_np,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _queries(spark):
    return (_emb(spark).filter("vec_id < 5")
            .selectExpr("vec_id as query_id", "embedding"))


def test_np_matches_expression_baseline(spark):
    emb = _emb(spark)
    corpus = emb.filter("vec_id >= 5")
    a = {(r.query_id, r.rank): (r.vec_id, r.cosine_sim)
         for r in brute_force_topk(corpus, _queries(spark), k=5).collect()}
    b = {(r.query_id, r.rank): (r.vec_id, r.cosine_sim)
         for r in brute_force_topk_np(corpus, _queries(spark), k=5).collect()}
    assert a == b


def test_ivf_topk_recall(spark):
    emb = _emb(spark)
    corpus = emb.filter("vec_id >= 5")
    exact = {r.query_id: [] for r in _queries(spark).collect()}
    for r in brute_force_topk(corpus, _queries(spark), k=5).collect():
        exact[r.query_id].append(r.vec_id)
    # full probe = exact equivalence
    full = ivf_topk(corpus, _queries(spark), k=5, n_centroids=8, n_probe=8)
    got_full = {}
    for r in full.collect():
        got_full.setdefault(r.query_id, []).append(r.vec_id)
    assert {q: sorted(v) for q, v in got_full.items()} == \
           {q: sorted(v) for q, v in exact.items()}
    # partial probe: valid rows, plausible recall (≥ some overlap overall)
    part = ivf_topk(corpus, _queries(spark), k=5, n_centroids=8, n_probe=3)
    got = {}
    for r in part.collect():
        got.setdefault(r.query_id, set()).add(r.vec_id)
    overlap = sum(len(got.get(q, set()) & set(v)) for q, v in exact.items())
    total = sum(len(v) for v in exact.values())
    assert overlap / total >= 0.4  # 3/8 cells probed on random vectors


def test_ivf_centroids_persist_and_reload(spark, sf_dir, tmp_path):
    """Serving contract: centroids trained once, saved as parquet, and
    reloaded must reproduce the exact same IVF results (no retrain at
    query time)."""
    import os

    from storagetapper_spark.operators.similarity import ivf_topk, train_centroids
    from storagetapper_spark.plans.common import t

    emb = t(spark, sf_dir, "embeddings")
    corpus = emb.where("vec_id % 10 != 0")
    queries = (emb.where("vec_id % 10 = 0").limit(3)
               .selectExpr("vec_id AS query_id", "embedding"))

    cents = train_centroids(corpus, n_centroids=8)
    idx_path = str(tmp_path / "ivf_index")
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid_id INT, centroid ARRAY<DOUBLE>",
    ).write.parquet(idx_path)

    reloaded = [r.centroid for r in
                spark.read.parquet(idx_path).orderBy("centroid_id").collect()]
    a = ivf_topk(corpus, queries, k=5, centroids=cents)
    b = ivf_topk(corpus, queries, k=5, centroids=reloaded)
    ra = {(r.query_id, r.vec_id, r.cosine_sim) for r in a.collect()}
    rb = {(r.query_id, r.vec_id, r.cosine_sim) for r in b.collect()}
    assert ra == rb and len(ra) > 0
    assert os.path.exists(idx_path)
