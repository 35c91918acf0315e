"""Textbook replays for the paired/blocked nonparametric batch
(plans/stats4.py): each query's statistic is recomputed from the raw
fixture with an independent literal pandas/numpy implementation (the
formulas as a stats textbook states them), and structural invariants
(rank-sum identities, run-count bounds, shrinkage pulling toward the
prior mean) are asserted on top."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def _orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def test_mcnemar_replay(spark, sf_dir):
    row = QUERIES["stats_mcnemar_test"](spark, sf_dir).collect()[0]
    o = _orders(sf_dir)
    yr = pd.to_datetime(o.o_orderdate).dt.year
    per = pd.DataFrame({
        "ck": o.o_custkey,
        "early": (yr <= 1997).astype(int),
        "late": (yr >= 1999).astype(int)}).groupby("ck").max()
    b = int(((per.early == 1) & (per.late == 0)).sum())
    c = int(((per.early == 0) & (per.late == 1)).sum())
    assert (row.early_only, row.late_only) == (b, c)
    assert row.n_subjects == len(per)
    assert row.n_subjects == (row.both_eras + row.early_only
                              + row.late_only + row.neither)
    chi2 = (abs(b - c) - 1.0) ** 2 / (b + c)
    assert row.chi2_cc_milli == math.floor(chi2 * 1000.0)


def test_cochran_q_replay(spark, sf_dir):
    row = QUERIES["stats_cochran_q"](spark, sf_dir).collect()[0]
    o = _orders(sf_dir)
    x = pd.DataFrame({
        "ck": o.o_custkey,
        "x1": (o.o_orderpriority == "1-URGENT").astype(int),
        "x2": (o.o_orderpriority == "2-HIGH").astype(int),
        "x3": (o.o_orderpriority == "3-MEDIUM").astype(int),
    }).groupby("ck").max()
    r = x.sum(axis=1)
    kept = x[(r > 0) & (r < 3)]
    rk = kept.sum(axis=1)
    cj = kept.sum(axis=0).to_numpy()
    t_sum = int(rk.sum())
    q = 2.0 * (3.0 * float((cj.astype(np.int64) ** 2).sum())
               - float(t_sum) ** 2) \
        / (3.0 * t_sum - float((rk.astype(np.int64) ** 2).sum()))
    assert row.n_blocks == len(kept)
    assert [row.c1, row.c2, row.c3] == cj.tolist()
    assert row.t_sum == t_sum
    # treatment totals decompose the block-total sum
    assert row.c1 + row.c2 + row.c3 == row.t_sum
    assert row.q_milli == math.floor(q * 1000.0)
    assert row.df == 2


def test_friedman_replay(spark, sf_dir):
    row = QUERIES["stats_friedman_test"](spark, sf_dir).collect()[0]
    o = _orders(sf_dir)
    yr = pd.to_datetime(o.o_orderdate).dt.year
    cents = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    df = pd.DataFrame({"ck": o.o_custkey, "yr": yr, "v": cents})
    df = df[df.yr.isin([1995, 1996, 1997])]
    yearly = df.groupby(["ck", "yr"]).v.sum().reset_index()
    sizes = yearly.groupby("ck").size()
    complete = set(sizes[sizes == 3].index)
    yearly = yearly[yearly.ck.isin(complete)]
    # textbook mid-ranks via pandas rank(average) within block
    yearly["rank"] = yearly.groupby("ck").v.rank(method="average")
    n = len(complete)
    rj = yearly.groupby("yr")["rank"].sum().to_numpy()
    # within-block ranks always sum to k(k+1)/2
    assert np.isclose(rj.sum(), 6.0 * n)
    chi2 = 12.0 / (n * 3 * 4) * float((rj ** 2).sum()) - 3.0 * n * 4
    assert row.n_blocks == n
    assert row.chi2_milli == math.floor(chi2 * 1000.0)


def test_runs_test_replay(spark, sf_dir):
    row = QUERIES["stats_runs_test"](spark, sf_dir).collect()[0]
    o = _orders(sf_dir)
    daily = (o.groupby(pd.to_datetime(o.o_orderdate).dt.date)
             .size().sort_index())
    n, s = len(daily), int(daily.sum())
    above = (daily.to_numpy() * n > s).astype(int)
    runs = 1 + int((above[1:] != above[:-1]).sum())
    n1, n2 = int(above.sum()), n - int(above.sum())
    assert (row.n_days, row.n_above, row.n_below) == (n, n1, n2)
    assert row.runs == runs
    # a run count is always within [1, n]
    assert 1 <= row.runs <= row.n_days
    mu = 2.0 * n1 * n2 / n + 1.0
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    z = (runs - mu) / math.sqrt(var)
    assert row.z_milli == math.floor(z * 1000.0)


def test_ljung_box_replay(spark, sf_dir):
    got = {r.event_type: r
           for r in QUERIES["ts_ljung_box"](spark, sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    day = pd.to_datetime(ev.ts).dt.date
    for et, grp in ev.groupby("event_type"):
        x = (grp.groupby(pd.to_datetime(grp.ts).dt.date).size()
             .sort_index().to_numpy().astype(np.int64))
        n = len(x)
        d = x * n - x.sum()
        den = float((d.astype(object) ** 2).sum())
        q = 0.0
        rho1 = None
        for k in range(1, 8):
            rho = float((d[:-k].astype(object)
                         * d[k:].astype(object)).sum()) / den
            if k == 1:
                rho1 = rho
            q += rho * rho / (n - k)
        q *= n * (n + 2.0)
        row = got[et]
        assert row.n_days == n
        assert row.rho1_micro == math.floor(rho1 * 1e6)
        assert row.q_lb_milli == math.floor(q * 1000.0)
    assert set(got) == set(ev.event_type.unique())


def test_eb_shrinkage_replay_and_pull_to_prior(spark, sf_dir):
    rows = QUERIES["ml_eb_shrinkage"](spark, sf_dir).collect()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    per = li.groupby("l_partkey").agg(
        n=("l_returnflag", "size"),
        k=("l_returnflag", lambda s: int((s == "R").sum())))
    rate_u = (per.k * 1_000_000 // per.n).astype(np.int64)
    p = len(per)
    m = float(rate_u.sum()) / p / 1e6
    v = float((rate_u.astype(object) ** 2).sum()) / p / 1e12 - m * m
    ab = m * (1.0 - m) / v - 1.0
    alpha = m * ab
    assert ab > 0 and 0.0 < m < 1.0
    for r in rows:
        n_i, k_i = per.loc[r.l_partkey, "n"], per.loc[r.l_partkey, "k"]
        assert (r.n, r.k) == (n_i, k_i)
        shrunk = (k_i + alpha) / (n_i + ab)
        assert r.shrunk_rate_micro == math.floor(shrunk * 1e6)
        # shrinkage pulls strictly toward the prior mean
        raw = k_i / n_i
        assert (min(raw, m) - 1e-12 <= shrunk <= max(raw, m) + 1e-12)
    assert rows == sorted(rows, key=lambda r: (-r.n, r.l_partkey))
