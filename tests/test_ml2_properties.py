"""Property tests for the ML feature-engineering batch: numpy replay
of standardized ridge, shrinkage vs the OLS sibling, the LOO-encoding
algebraic identity, and a pandas WoE/IV replay."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def _lineitem_xy(sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x1 = np.floor(li.l_quantity).astype(np.int64).to_numpy()
    x2 = np.floor(li.l_discount * 10000 + 0.5).astype(np.int64).to_numpy()
    y = np.floor(li.l_extendedprice + 0.5).astype(np.int64).to_numpy()
    return x1, x2, y


def test_ridge_matches_numpy_closed_form(spark, sf_dir):
    row = QUERIES["ml_ridge_normal"](spark, sf_dir).collect()[0]
    x1, x2, y = _lineitem_xy(sf_dir)
    X = np.column_stack([x1, x2]).astype(np.float64)
    yf = y.astype(np.float64)
    Xs = (X - X.mean(0)) / X.std(0, ddof=0)
    ys = (yf - yf.mean()) / yf.std(ddof=0)
    n = len(yf)
    alpha = 0.1
    # standardized ridge: (R + aI)^-1 r with R the correlation matrix
    R = (Xs.T @ Xs) / n
    r = (Xs.T @ ys) / n
    a = np.linalg.solve(R + alpha * np.eye(2), r)
    b = a * yf.std(ddof=0) / X.std(0, ddof=0)
    intercept = yf.mean() - b @ X.mean(0)
    assert abs(row.a1_std_micro / 1e6 - a[0]) < 1e-4
    assert abs(row.a2_std_micro / 1e6 - a[1]) < 1e-4
    assert abs(row.b1_micro / 1e6 - b[0]) < 1e-3
    assert abs(row.b2_micro / 1e6 - b[1]) < 1e-3
    assert abs(row.intercept_milli / 1e3 - intercept) < 1e-1
    # shrinkage: standardized slopes strictly inside the OLS solution
    a_ols = np.linalg.solve(R, r)
    assert abs(a[0]) < abs(a_ols[0]) and abs(a[1]) < abs(a_ols[1])


def test_loo_encoding_identity_and_prior_pull(spark, sf_dir):
    rows = QUERIES["ml_target_encoding_loo"](spark, sf_dir).collect()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_returnflag"])
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"])
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["y"] = (j.l_returnflag == "R").astype(int)
    prior = j.y.mean()
    g = j.groupby("p_brand").y.agg(["sum", "count"])
    m = 100.0
    for r in rows:
        s_g, n_g = g.loc[r.p_brand, "sum"], g.loc[r.p_brand, "count"]
        assert (r.s_g, r.n_g) == (s_g, n_g)
        enc = (s_g - r.y + m * prior) / (n_g - 1 + m)
        assert r.enc_micro == math.floor(enc * 1e6)
        # the label's own value is excluded: enc(y=1) < enc(y=0)
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, {})[r.y] = r.enc_micro
    for brand, encs in by_brand.items():
        if len(encs) == 2:
            assert encs[1] < encs[0], brand


def test_woe_iv_replay_and_zero_sum(spark, sf_dir):
    rows = QUERIES["ml_woe_iv"](spark, sf_dir).collect()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_returnflag"])
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_brand"])
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    j["y"] = (j.l_returnflag == "R").astype(int)
    e_all = j.y.sum()
    ne_all = len(j) - e_all
    iv_total = 0.0
    for r in rows:
        grp = j[j.p_brand == r.p_brand]
        e = grp.y.sum()
        ne = len(grp) - e
        assert (r.e, r.ne) == (e, ne)
        ed = (e + 0.5) / (e_all + 0.5)
        ned = (ne + 0.5) / (ne_all + 0.5)
        woe = math.log(ed / ned)
        assert r.woe_micro == math.floor(woe * 1e6)
        iv_total += (ed - ned) * woe
    # IV is a sum of non-negative terms: every contribution >= 0
    assert all(r.iv_contrib_nano >= 0 for r in rows)
    assert abs(sum(r.iv_contrib_nano for r in rows) / 1e9
               - iv_total) < 1e-6


def test_mutual_info_matches_textbook_replay(spark, sf_dir):
    rows = {r.feature: r for r in
            QUERIES["ml_mutual_info_screen"](spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    y = (li.l_returnflag == "R").astype(int)
    feats = {
        "f_quantity": np.floor(li.l_quantity).astype(np.int64),
        "f_discount_pct": np.floor(li.l_discount * 100 + 0.5
                                   ).astype(np.int64),
        "f_ship_month": li.l_shipdate.dt.month.astype(np.int64),
    }
    n = len(y)
    py = y.value_counts(normalize=True)
    h_y = -sum(p * math.log(p) for p in py)
    for name, x in feats.items():
        ct = pd.crosstab(x, y)
        mi = 0.0
        for xv in ct.index:
            for yv in ct.columns:
                nxy = ct.loc[xv, yv]
                if nxy == 0:
                    continue
                mi += nxy / n * math.log(
                    n * nxy / (ct.loc[xv].sum() * ct[yv].sum()))
        r = rows[name]
        assert r.n_levels == len(ct.index)
        assert abs(r.mi_nano / 1e9 - mi) < 1e-5
        assert abs(r.hy_nano / 1e9 - h_y) < 1e-6
        assert 0 <= r.relevance_micro <= 1000000


def test_als_user_step_matches_numpy_ridge(spark, sf_dir):
    """Each user's solved factors equal the numpy closed-form ridge
    solution over that user's item factors, and one half-step strictly
    reduces the regularized squared loss vs the zero vector."""
    import hashlib

    rows = QUERIES["recsys_als_user_step"](spark, sf_dir).collect()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey", "l_quantity"])
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["q"] = j.l_quantity.astype(np.int64)
    r = (j.groupby(["o_custkey", "l_partkey"]).q.sum()
         .reset_index())

    def fac(ax, k):
        h = hashlib.md5(f"{ax}:{k}".encode()).hexdigest()[:8]
        return int(h, 16) % 2001 - 1000

    lam = 1e6
    for row in rows[:5]:
        mine = r[r.o_custkey == row.o_custkey]
        Fm = np.array([[fac("f1", k), fac("f2", k)]
                       for k in mine.l_partkey], dtype=np.float64)
        rv = mine.q.to_numpy().astype(np.float64)
        A = Fm.T @ Fm + lam * np.eye(2)
        u = np.linalg.solve(A, Fm.T @ rv) * 1000.0
        assert row.n_items == len(mine)
        assert abs(row.u1_micro / 1e6 - u[0]) < 1e-3
        assert abs(row.u2_micro / 1e6 - u[1]) < 1e-3
        # loss(u) < loss(0): the half-step made progress
        um = u / 1000.0
        loss_u = ((rv - Fm @ um) ** 2).sum() + lam * (um ** 2).sum()
        loss_0 = (rv ** 2).sum()
        assert loss_u < loss_0


def test_theil_decomposition_identities(spark, sf_dir):
    """T = T_within + T_between (additivity), shares sum to 1, T >= 0,
    and T matches a direct pandas replay."""
    rows = QUERIES["agg_theil_index"](spark, sf_dir).collect()
    allrow = [r for r in rows if r.segment == "ALL"][0]
    segs = [r for r in rows if r.segment != "ALL"]
    assert abs(sum(r.revenue_share_micro for r in segs)
               - allrow.revenue_share_micro) <= len(segs)
    assert 999990 <= allrow.revenue_share_micro <= 1000000
    assert allrow.t_contrib_nano >= 0
    # pandas replay of total T
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["cents"] = np.floor(
        j.l_extendedprice * (1 - j.l_discount) * 100 + 0.5
    ).astype(np.int64)
    x = j.groupby("o_custkey").cents.sum().to_numpy().astype(np.float64)
    mu = x.mean()
    t = float(np.mean(x / mu * np.log(x / mu)))
    assert abs(allrow.t_contrib_nano / 1e9 - t) < 1e-5
    # between-term <= total (within is non-negative)
    assert allrow.t_between_nano <= allrow.t_contrib_nano + 1
