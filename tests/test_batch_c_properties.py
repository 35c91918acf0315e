"""Replays for the round-7 continuation batch C: Dunn's post-hoc z,
Bartlett's variance-homogeneity chi-square, and R/S Hurst analysis —
each recomputed with a literal numpy/pandas textbook implementation
on the raw fixture."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_dunn_posthoc_replay(spark, sf_dir):
    rows = {r.pair: r
            for r in QUERIES["stats_dunn_posthoc"](spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    v = li.l_quantity.astype(np.int64)
    g = li.l_returnflag
    # textbook: average ranks over the pooled sample
    ranks = pd.Series(v).rank(method="average")
    n = len(v)
    _, t_counts = np.unique(v, return_counts=True)
    tie = float((t_counts.astype(np.int64) ** 3 - t_counts).sum())
    s2 = n * (n + 1) / 12.0 - tie / (12.0 * (n - 1))
    rbar = {k: float(ranks[(g == k).to_numpy()].mean()) for k in "ANR"}
    nn = {k: int((g == k).sum()) for k in "ANR"}
    for pair, (i, j) in {"A-N": ("A", "N"), "A-R": ("A", "R"),
                         "N-R": ("N", "R")}.items():
        z = (rbar[i] - rbar[j]) / math.sqrt(s2 * (1 / nn[i] + 1 / nn[j]))
        assert rows[pair].z_milli == math.floor(z * 1000.0), pair
        assert rows[pair].n_i == nn[i] and rows[pair].n_j == nn[j]
        assert rows[pair].significant_bonf == (abs(rows[pair].z_milli)
                                               > 2638)


def test_bartlett_replay(spark, sf_dir):
    row = QUERIES["stats_bartlett_test"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    x = np.floor(li.l_extendedprice * 100 + 0.5).astype(np.int64)
    g = li.l_returnflag
    ni, s2i = {}, {}
    for k in "ANR":
        xi = x[(g == k).to_numpy()]
        ni[k] = len(xi)
        # unbiased variance from exact integer sums
        sx, sxx = int(xi.sum()), int((xi.astype(object) ** 2).sum())
        s2i[k] = (ni[k] * sxx - sx * sx) / (ni[k] * (ni[k] - 1.0))
    nt = sum(ni.values())
    sp2 = sum((ni[k] - 1) * s2i[k] for k in "ANR") / (nt - 3.0)
    num = (nt - 3.0) * math.log(sp2) \
        - sum((ni[k] - 1) * math.log(s2i[k]) for k in "ANR")
    corr = 1.0 + (sum(1.0 / (ni[k] - 1) for k in "ANR")
                  - 1.0 / (nt - 3.0)) / (3.0 * 2.0)
    assert (row.n_a, row.n_n, row.n_r) == (ni["A"], ni["N"], ni["R"])
    assert row.chi2_milli == math.floor(num / corr * 1000.0)
    assert row.correction_micro == math.floor(corr * 1e6)
    # the correction factor is always a hair above 1
    assert 1_000_000 < row.correction_micro < 1_100_000


def test_hurst_rs_replay(spark, sf_dir):
    rows = QUERIES["ts_hurst_rs"](spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    y = (o.groupby(pd.to_datetime(o.o_orderdate).dt.date).size()
         .sort_index().to_numpy().astype(np.int64))
    pts = []
    for r in rows:
        s = r.scale
        rsus = []
        for b in range(len(y) // s):
            blk = y[b * s:(b + 1) * s]
            tot = int(blk.sum())
            zp = s * np.cumsum(blk) - np.arange(1, s + 1) * tot
            d = s * int((blk.astype(object) ** 2).sum()) - tot * tot
            if d <= 0:
                continue
            rsus.append(math.floor((int(zp.max()) - int(zp.min()))
                                   / math.sqrt(d) * 1e6))
        assert r.n_blocks == len(rsus)
        mean_rs = sum(rsus) / len(rsus) / 1e6
        assert r.mean_rs_micro == math.floor(mean_rs * 1e6)
        pts.append((math.log(s), math.log(mean_rs)))
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    slope = ((len(xs) * (xs * ys).sum() - xs.sum() * ys.sum())
             / (len(xs) * (xs * xs).sum() - xs.sum() ** 2))
    assert rows[0].hurst_milli == math.floor(slope * 1000.0)
    # all rows carry the same fitted H; a count series is in (0, 1)
    assert len({r.hurst_milli for r in rows}) == 1
    assert 0 < rows[0].hurst_milli < 1000
    # R/S grows with scale (the monotonicity H is fitted on)
    mrs = [r.mean_rs_micro for r in sorted(rows, key=lambda r: r.scale)]
    assert mrs == sorted(mrs)
