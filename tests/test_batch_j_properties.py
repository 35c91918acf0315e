"""Replays for the round-7 continuation batch J: Wilson score
intervals and pinball loss of constant quantile forecasters."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES

_Z = 1.959964


def test_wilson_ci_replay(spark, sf_dir):
    rows = {r.segment: r
            for r in QUERIES["stats_wilson_ci"](spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_mktsegment"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    for seg, g in j.groupby("c_mktsegment"):
        n = len(g)
        k = int((g.o_orderpriority == "1-URGENT").sum())
        p = k / n
        z2n = _Z * _Z / n
        center = (p + z2n / 2.0) / (1.0 + z2n)
        half = _Z * math.sqrt(p * (1 - p) / n
                              + _Z * _Z / (4.0 * n * n)) / (1.0 + z2n)
        r = rows[seg]
        assert (r.n, r.k) == (n, k)
        assert r.rate_micro == math.floor(p * 1e6)
        assert r.wilson_lo_micro == math.floor((center - half) * 1e6)
        assert r.wilson_hi_micro == math.floor((center + half) * 1e6)
        # Wilson interval brackets the point rate and stays in [0, 1]
        assert 0 <= r.wilson_lo_micro <= r.rate_micro + 1
        assert r.rate_micro <= r.wilson_hi_micro <= 1_000_000


def test_pinball_loss_replay(spark, sf_dir):
    rows = {r.q_milli: r
            for r in QUERIES["ml_pinball_loss"](spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cents = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    daily = (pd.DataFrame({
        "day": pd.to_datetime(o.o_orderdate).dt.date, "y": cents})
        .groupby("day").y.sum())
    split = pd.Timestamp("1999-01-01").date()
    train = np.sort(daily[daily.index < split].to_numpy())
    test = daily[daily.index >= split].to_numpy()
    for qm in (100, 500, 900):
        k = math.ceil(qm * len(train) / 1000.0)
        f = int(train[k - 1])  # type-1 order statistic
        loss = sum(max(qm * (int(y) - f), (qm - 1000) * (int(y) - f))
                   for y in test)
        covered = int((test <= f).sum())
        r = rows[qm]
        assert r.n_train == len(train)
        assert r.n_test == len(test)
        assert r.forecast_cents == f
        assert r.mean_pinball_milliq_cents == loss // len(test)
        assert r.test_coverage_micro == covered * 1_000_000 // len(test)
    # quantile forecasts are monotone in q
    assert (rows[100].forecast_cents <= rows[500].forecast_cents
            <= rows[900].forecast_cents)
    # empirical test coverage roughly tracks the nominal quantile
    assert rows[900].test_coverage_micro > rows[100].test_coverage_micro
