"""Property tests for the round-7 second batch: DeLong replay against
the literal per-observation structural components, CMH against a
pandas stratified replay, rich-club monotonic structure, and
time-split fold leakage-safety invariants."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_delong_matches_structural_component_replay(spark, sf_dir):
    row = QUERIES["ml_auc_delong_ci"](spark, sf_dir).collect()[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.array([e[0] for e in emb.embedding],
                          dtype=np.float64) * 1e6).astype(np.int64)
    y = (emb.label == 1).to_numpy()
    xs, ys = v[y], v[~y]
    n1, n0 = len(xs), len(ys)
    # literal DeLong structural components, one per observation
    v10 = np.array([((ys < x).sum() + 0.5 * (ys == x).sum()) / n0
                    for x in xs])
    v01 = np.array([((xs > yv).sum() + 0.5 * (xs == yv).sum()) / n1
                    for yv in ys])
    auc = v10.mean()
    var = v10.var(ddof=1) / n1 + v01.var(ddof=1) / n0
    assert (row.n_pos, row.n_neg) == (n1, n0)
    assert abs(row.auc_micro / 1e6 - auc) < 1e-5
    assert abs(row.var_nano / 1e9 - var) < 1e-7
    half = 1.959964 * math.sqrt(var)
    assert abs(row.ci_lo_micro / 1e6 - (auc - half)) < 1e-5
    assert abs(row.ci_hi_micro / 1e6 - (auc + half)) < 1e-5
    assert row.ci_lo_micro <= row.auc_micro <= row.ci_hi_micro
    # the ml_auc_roc point estimate sits inside (identical estimator)
    auc_pt = QUERIES["ml_auc_roc"](spark, sf_dir).collect()[0]
    assert abs(auc_pt.auc_micro - row.auc_micro) <= 1


def test_cmh_matches_pandas_stratified_replay(spark, sf_dir):
    row = QUERIES["stats_cmh_test"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet",
                        columns=["p_partkey", "p_type"])
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    j = (li.merge(p, left_on="l_partkey", right_on="p_partkey")
         .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    j["promo"] = j.p_type.str.startswith("PROMO")
    j["ret"] = j.l_returnflag == "R"
    sum_a = sum_e = sum_v = sum_ad = sum_bc = 0.0
    n_strata = 0
    for _, g in j.groupby("s_nationkey"):
        a = int((g.promo & g.ret).sum())
        b = int((g.promo & ~g.ret).sum())
        c = int((~g.promo & g.ret).sum())
        d = int((~g.promo & ~g.ret).sum())
        n = a + b + c + d
        n_strata += 1
        sum_a += a
        sum_e += (a + b) * (a + c) / n
        sum_v += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        sum_ad += a * d / n
        sum_bc += b * c / n
    chi2 = (abs(sum_a - sum_e) - 0.5) ** 2 / sum_v
    assert row.n_strata == n_strata
    assert row.sum_a == sum_a
    assert abs(row.chi2_micro / 1e6 - chi2) < 1e-4
    assert abs(row.mh_odds_ratio_micro / 1e6 - sum_ad / sum_bc) < 1e-4


def test_rich_club_structure(spark, sf_dir):
    rows = QUERIES["graph_rich_club"](spark, sf_dir).collect()
    assert [r.k for r in rows] == [2, 4, 8, 16, 32]
    for prev, cur in zip(rows, rows[1:]):
        # higher threshold => fewer nodes, fewer qualifying edges
        assert cur.n_nodes <= prev.n_nodes
        assert cur.n_edges <= prev.n_edges
    for r in rows:
        if r.phi_micro is not None:
            assert 0 <= r.phi_micro <= 1000000
            # edges among club members can't exceed the club's pairs
            assert 2 * r.n_edges <= r.n_nodes * (r.n_nodes - 1)


def test_time_split_folds_never_leak_and_expand(spark, sf_dir):
    rows = QUERIES["sample_time_split_folds"](spark, sf_dir).collect()
    assert [r.fold for r in rows] == [1, 2, 3, 4, 5]
    for prev, cur in zip(rows, rows[1:]):
        # expanding window: training strictly grows with the fold
        assert cur.train_end > prev.train_end
        assert cur.train_days >= prev.train_days
        assert cur.train_orders >= prev.train_orders
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"])
    days = o.o_orderdate.dt.normalize()
    total = len(o)
    for r in rows:
        te = pd.Timestamp(r.train_end)
        assert r.train_orders == int((days <= te).sum())
        assert r.test_orders == int(
            ((days > te) & (days <= te + pd.Timedelta(days=14))).sum())
        # train + test never exceeds the corpus (no double counting)
        assert r.train_orders + r.test_orders <= total


def test_brier_decomposition_identity_and_replay(spark, sf_dir):
    """BS = REL − RES + UNC + WBV − 2·COV exactly (nano tolerance for
    the per-component floors), and BS matches a direct numpy replay."""
    row = QUERIES["ml_brier_decomposition"](spark, sf_dir).collect()[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.array([e[0] for e in emb.embedding],
                          dtype=np.float64) * 1e6).astype(np.int64)
    y = (emb.label == 1).to_numpy().astype(np.int64)
    mn, mx = v.min(), v.max()
    p = np.floor((v - mn) / (mx - mn) * 1e6).astype(np.int64) / 1e6
    bs = ((p - y) ** 2).mean()
    assert row.n == len(y)
    assert abs(row.brier_nano / 1e9 - bs) < 1e-6
    lhs = row.brier_nano
    rhs = (row.reliability_nano - row.resolution_nano
           + row.uncertainty_nano + row.within_bin_var_nano
           - 2 * row.within_bin_cov_nano)
    # each of 6 components floored to nano over <=10 bins
    assert abs(lhs - rhs) <= 60
    assert row.resolution_nano >= 0 and row.reliability_nano >= 0
    assert row.within_bin_var_nano >= 0


def test_overdispersion_matches_numpy(spark, sf_dir):
    row = QUERIES["stats_overdispersion_test"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"])
    per = o.groupby(o.o_orderdate.dt.normalize()).size()
    c = per.reindex(pd.date_range(per.index.min(), per.index.max(),
                                  freq="D"), fill_value=0).to_numpy()
    assert row.n_days == len(c) and row.n_orders == c.sum()
    vmr = c.var(ddof=1) / c.mean()
    disp = ((c - c.mean()) ** 2).sum() / c.mean()
    assert abs(row.vmr_micro / 1e6 - vmr) < 1e-4
    assert abs(row.dispersion_milli / 1e3 - disp) < 1e-1
