"""Replays for the round-7 continuation batch K: filtered-ANN recall
tradeoff, Chapman capture-recapture, McNemar model comparison."""

import hashlib
import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_filtered_search_replay(spark, sf_dir):
    rows = {r.query_id: r
            for r in QUERIES["ann_filtered_search"](spark, sf_dir).collect()}
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64)
                   * 1e6).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    lab = emb.label.to_numpy()
    corp, cids, clab = mat[ids >= 5], ids[ids >= 5], lab[ids >= 5]
    n2 = (corp.astype(object) ** 2).sum(axis=1).astype(np.float64)
    for qid in range(5):
        q = mat[ids == qid][0]
        ip = (corp @ q).astype(np.float64)
        ck = np.sign(ip) * ip * ip / n2
        order = sorted(range(len(cids)), key=lambda i: (-ck[i], cids[i]))
        pre = [cids[i] for i in order if clab[i] == 1][:5]
        post = [cids[i] for i in order[:20] if clab[i] == 1]
        r = rows[qid]
        assert r.n_true == len(pre)
        assert r.n_post == len(post)
        assert r.recovered == len(set(pre) & set(post))
        assert r.postfilter_recall_micro \
            == len(set(pre) & set(post)) * 1_000_000 // len(pre)
        assert r.underfilled == (len(post) < 5)
        # post-filtering can only lose, never gain, true neighbors
        assert r.recovered <= r.n_true


def test_capture_recapture_replay(spark, sf_dir):
    row = QUERIES["stats_capture_recapture"](spark, sf_dir).collect()[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    thr = int((1 << 60) * 0.4)

    def u(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    a = docs.doc_id.map(lambda i: u(str(i)) < thr)
    b = docs.doc_id.map(lambda i: u(f"crawlB:{i}") < thr)
    n1, n2, m = int(a.sum()), int(b.sum()), int((a & b).sum())
    nhat = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    assert (row.n1, row.n2, row.recaptured) == (n1, n2, m)
    assert row.n_true == len(docs)
    assert row.n_hat == math.floor(nhat)
    # the estimate should land within a few SE of the truth
    assert abs(row.n_hat - row.n_true) < 6 * max(row.se_floor, 1) + 10


def test_mcnemar_models_replay(spark, sf_dir):
    row = QUERIES["ml_mcnemar_model_comparison"](spark,
                                                 sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")[
        ["p_partkey", "p_size", "p_type"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    truth = j.p_type.str.startswith("PROMO")
    pred_a = np.round(j.l_extendedprice * 100).astype(np.int64) <= 1500000
    pred_b = j.p_size <= 25
    a_ok = (pred_a == truth).to_numpy()
    b_ok = (pred_b == truth).to_numpy()
    b_cell = int((a_ok & ~b_ok).sum())
    c_cell = int((~a_ok & b_ok).sum())
    chi2 = (abs(b_cell - c_cell) - 1.0) ** 2 / (b_cell + c_cell)
    assert row.n == len(j)
    assert (row.a_correct, row.b_correct) == (int(a_ok.sum()),
                                              int(b_ok.sum()))
    assert (row.b_cell, row.c_cell) == (b_cell, c_cell)
    assert row.chi2_cc_milli == math.floor(chi2 * 1000.0)
    assert row.significant_05 == (row.chi2_cc_milli > 3841)
