"""Model-evaluation batch invariants vs numpy/pandas recomputations."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def _scores_labels(sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.stack(pdf.embedding.values)[:, 0]
                 .astype("float64") * 1e6).astype("int64")
    return v, (pdf.label.values == 1)


def test_calibration_bins_and_ece(spark, sf_dir):
    out = QUERIES["ml_calibration_ece"](spark, sf_dir).collect()
    v, pos = _scores_labels(sf_dir)
    mn, mx = int(v.min()), int(v.max())
    norm = (v - mn) / (mx - mn)
    bins = np.minimum(9, np.floor(norm * 10).astype("int64"))
    nq = np.floor(norm * 1e6).astype("int64")
    n_total = len(v)
    ece = 0
    want = {}
    for b in np.unique(bins):
        m = bins == b
        n, npos, snq = int(m.sum()), int(pos[m].sum()), int(nq[m].sum())
        conf = snq / n
        acc = npos * 1e6 / n
        want[int(b)] = (n, npos, math.floor(conf), math.floor(acc))
        ece += math.floor(n / n_total * abs(acc - conf))
    got = {r.bin: (r.n, r.n_pos, r.conf_micro, r.acc_micro)
           for r in out}
    assert got == want
    assert all(r.ece_micro == ece for r in out)
    assert sum(r.n for r in out) == n_total
    # bin confidences are monotone (equi-width bins over the score)
    confs = [r.conf_micro for r in sorted(out, key=lambda r: r.bin)]
    assert confs == sorted(confs)


def test_classification_metrics_identities(spark, sf_dir):
    r = QUERIES["ml_classification_metrics"](spark, sf_dir).collect()[0]
    v, pos = _scores_labels(sf_dir)
    pred = v >= 0
    tp = int((pred & pos).sum())
    fp = int((pred & ~pos).sum())
    fn = int((~pred & pos).sum())
    tn = int((~pred & ~pos).sum())
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    assert r.tp + r.fp + r.fn + r.tn == len(v)
    assert r.precision_micro == math.floor(tp * 1e6 / (tp + fp))
    assert r.recall_micro == math.floor(tp * 1e6 / (tp + fn))
    assert r.f1_micro == math.floor(2 * tp * 1e6 / (2 * tp + fp + fn))


def test_kfold_groups_never_straddle_folds(spark, sf_dir):
    import hashlib

    out = QUERIES["sample_kfold_group_assign"](spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["source", "n_chars"])
    fold_of = {s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 5
               for s in docs.source.unique()}
    g = docs.assign(fold=docs.source.map(fold_of)).groupby("fold")
    want = {int(f): (len(gr), gr.source.nunique(),
                     int(gr.n_chars.sum()))
            for f, gr in g}
    got = {r.fold: (r.n_docs, r.n_groups, r.n_chars) for r in out}
    assert got == want
    # group integrity: fold count per source is 1 by construction;
    # every source appears in exactly one fold
    assert sum(r.n_groups for r in out) == docs.source.nunique()
    assert sum(r.n_docs for r in out) == len(docs)


def test_ndcg_matches_numpy(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.stack(pdf.embedding.values)[:, 0]
                 .astype("float64") * 1e6).astype("int64")
    pos = (pdf.label.values == 1)
    order = np.lexsort((pdf.vec_id.values, -v))[:100]
    rel = pos[order]
    dcg = sum(math.floor(1e6 / math.log2(i + 2))
              for i, r in enumerate(rel) if r)
    ideal_n = min(int(pos.sum()), 100)
    idcg = sum(math.floor(1e6 / math.log2(i + 2))
               for i in range(ideal_n))
    out = QUERIES["ml_ndcg_at_k"](spark, sf_dir).collect()[0]
    assert out.k_pos == int(rel.sum())
    assert out.dcg_micro == dcg
    assert out.idcg_micro == idcg
    assert out.ndcg_micro == math.floor(dcg * 1e6 / idcg)
    assert 0 <= out.ndcg_micro <= 1_000_000


def test_mcc_matches_numpy(spark, sf_dir):
    r = QUERIES["ml_mcc"](spark, sf_dir).collect()[0]
    v, pos = _scores_labels(sf_dir)
    pred = v >= 0
    tp = int((pred & pos).sum())
    fp = int((pred & ~pos).sum())
    fn = int((~pred & pos).sum())
    tn = int((~pred & ~pos).sum())
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    mcc = ((tp * tn - fp * fn)
           / math.sqrt(float((tp + fp) * (tp + fn)
                             * (tn + fp) * (tn + fn))))
    assert r.mcc_micro == math.floor(mcc * 1e6)
    assert -1_000_000 <= r.mcc_micro <= 1_000_000


def test_tukey_fences_match_numpy(spark, sf_dir):
    out = {r.brand: r for r in
           QUERIES["profile_tukey_fences"](spark, sf_dir).collect()}
    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_brand", "p_retailprice"])
    part["c"] = (part.p_retailprice * 100).round().astype("int64")
    for brand, g in part.groupby("p_brand"):
        q1 = float(np.percentile(g.c.values, 25, method="linear"))
        q3 = float(np.percentile(g.c.values, 75, method="linear"))
        iqr = q3 - q1
        n_out = int(((g.c < q1 - 1.5 * iqr)
                     | (g.c > q3 + 1.5 * iqr)).sum())
        r = out[brand]
        assert r.n == len(g)
        assert r.q1_x4 == int(round(q1 * 4))
        assert r.q3_x4 == int(round(q3 * 4))
        assert r.n_outliers == n_out
