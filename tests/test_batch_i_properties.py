"""Replays for the round-7 continuation batch I: Wilcoxon signed-rank
(scipy-free midrank replay), per-cohort AUC fairness audit, and
DAU/WAU stickiness."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_wilcoxon_replay(spark, sf_dir):
    row = QUERIES["stats_wilcoxon_signed_rank"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    yr = pd.to_datetime(o.o_orderdate).dt.year
    cents = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    piv = (pd.DataFrame({"ck": o.o_custkey, "yr": yr, "v": cents})
           [yr.isin([1996, 1997]).to_numpy()]
           .groupby(["ck", "yr"]).v.sum().unstack().dropna())
    d = (piv[1997] - piv[1996]).astype(np.int64)
    d = d[d != 0]
    ranks = pd.Series(np.abs(d.to_numpy())).rank(method="average")
    w_plus = float(ranks[(d > 0).to_numpy()].sum())
    n = len(d)
    _, t_counts = np.unique(np.abs(d.to_numpy()), return_counts=True)
    tie = float((t_counts.astype(np.int64) ** 3 - t_counts).sum())
    mu = n * (n + 1) / 4.0
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
    z = (w_plus - mu - math.copysign(0.5, w_plus - mu)) / math.sqrt(var)
    assert row.n == n
    assert row.n_pos == int((d > 0).sum())
    assert row.w_plus_x2 == int(round(2 * w_plus))
    assert row.tie_term == int(tie)
    assert row.z_milli == math.floor(z * 1000.0)
    # rank sums decompose: W+ + W- = n(n+1)/2 (in doubled units)
    assert row.w_plus_x2 <= n * (n + 1)


def test_group_auc_replay(spark, sf_dir):
    rows = {r.cohort: r
            for r in QUERIES["ml_group_auc"](spark, sf_dir).collect()}
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.stack(emb.embedding.to_numpy())[:, 0].astype(np.float64)
                 * 1e6).astype(np.int64)
    pos = (emb.label == 1).to_numpy()
    cohort = (emb.vec_id % 4).to_numpy()
    aucs = {}
    for c in range(4):
        m = cohort == c
        ranks = pd.Series(v[m]).rank(method="average").to_numpy()
        n1, n0 = int(pos[m].sum()), int((~pos[m]).sum())
        r1 = float(ranks[pos[m]].sum())
        auc = (r1 - n1 * (n1 + 1) / 2.0) / (n1 * n0)
        r = rows[c]
        assert (r.n_pos, r.n_neg) == (n1, n0)
        assert r.auc_micro == math.floor(auc * 1e6)
        aucs[c] = r.auc_micro
    wm = rows[0].weighted_mean_auc_micro
    tot = sum(rows[c].n_pos + rows[c].n_neg for c in range(4))
    assert wm == math.floor(sum(aucs[c] * (rows[c].n_pos + rows[c].n_neg)
                                for c in range(4)) / tot)
    for c in range(4):
        assert rows[c].gap_micro == aucs[c] - wm
    # gaps against a weighted mean must straddle (or touch) zero
    assert min(r.gap_micro for r in rows.values()) <= 0
    assert max(r.gap_micro for r in rows.values()) >= 0


def test_dau_wau_replay(spark, sf_dir):
    rows = {r.week: r for r in
            QUERIES["events_dau_wau_stickiness"](spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ts = pd.to_datetime(ev.ts)
    df = pd.DataFrame({
        "day": ts.dt.date,
        "week": ts.dt.to_period("W-SUN").dt.start_time.dt.date,
        "u": ev.user_id})
    for wk, g in df.groupby("week"):
        dau = g.groupby("day").u.nunique()
        wau = g.u.nunique()
        r = rows[wk]
        assert r.days_observed == len(dau)
        assert r.wau == wau
        assert r.avg_dau_milli == int(dau.sum()) * 1000 // len(dau)
        assert r.stickiness_micro == int(dau.sum()) * 1_000_000 \
            // (len(dau) * wau)
        # stickiness is a share of the week
        assert 1_000_000 // 7 - 1 <= r.stickiness_micro <= 1_000_000
    assert set(rows) == set(df.week.unique())
