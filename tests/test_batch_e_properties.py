"""Replays for the round-7 continuation batch E: Harrell's C-index
(brute-force pair loop over the session rollup) and epoch-folding
periodicity (literal one-way-ANOVA eta^2 per fold)."""

import math
from collections import Counter

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def _sessions(sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"])
    # ts is datetime64[us]: normalize to ns before the int64 view so
    # the epoch math is unit-safe
    ev["ts_s"] = (pd.to_datetime(ev.ts).astype("datetime64[ns]")
                  .astype("int64") / 1e9)
    out = []
    horizon = ev.ts_s.max()
    for _, g in ev.groupby("user_id"):
        ts = g.ts_s.to_numpy()
        starts = [0] + [i for i in range(1, len(ts))
                        if ts[i] - ts[i - 1] > 1800] + [len(ts)]
        for a, b in zip(starts, starts[1:]):
            dur = math.floor((ts[b - 1] - ts[a]) / 60)
            event = int(horizon - ts[b - 1] >= 1800)
            out.append((dur, event, min(b - a, 64)))
    return out


def test_survival_concordance_replay(spark, sf_dir):
    row = QUERIES["ml_survival_concordance"](spark, sf_dir).collect()[0]
    sess = _sessions(sf_dir)
    assert row.n_sessions == len(sess)
    assert row.n_uncensored == sum(e for _, e, _ in sess)
    comparable = concordant = tied = 0
    # brute force O(n^2) on the sf0.001 fixture (~1k sessions)
    for i, (di, ei, si) in enumerate(sess):
        if ei != 1:
            continue
        for dj, ej, sj in sess:
            if dj <= di:
                continue
            comparable += 1
            if sj > si:
                concordant += 1
            elif sj == si:
                tied += 1
    assert row.comparable_pairs == comparable
    assert row.concordant == concordant
    assert row.tied_score == tied
    assert row.c_index_micro == (2 * concordant + tied) * 1_000_000 \
        // (2 * comparable)
    # engagement predicts survival far better than chance here
    assert row.c_index_micro > 500_000


def test_period_folding_replay(spark, sf_dir):
    rows = {r.period: r
            for r in QUERIES["ts_period_folding"](spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    daily = (o.groupby(pd.to_datetime(o.o_orderdate).dt.date)
             .size().sort_index())
    days = pd.to_datetime(pd.Series(daily.index))
    ti = (days - days.min()).dt.days.to_numpy()
    y = daily.to_numpy().astype(np.int64)
    n = len(y)
    syy = int((y.astype(object) ** 2).sum())
    s_all = int(y.sum())
    for p in (5, 6, 7, 14):
        # the registered quantized form: per-phase integer division
        a = 0
        for k in range(p):
            yk = y[ti % p == k]
            if len(yk):
                a += int(yk.sum()) ** 2 * 1_000_000 // len(yk)
        b = s_all ** 2 * 1_000_000 // n
        eta2 = (a - b) / (syy * 1_000_000 - b)
        r = rows[p]
        assert r.n_days == n
        assert r.n_phases == p
        assert r.eta2_ppm == math.floor(eta2 * 1e6)
        # ... and it agrees with the true ANOVA eta^2 to quantization
        grand = y.mean()
        ssb = sum(len(y[ti % p == k]) * (y[ti % p == k].mean() - grand) ** 2
                  for k in range(p) if len(y[ti % p == k]))
        sst = ((y - grand) ** 2).sum()
        assert abs(r.eta2_ppm / 1e6 - ssb / sst) < 1e-4
    # every eta^2 is a variance share
    assert all(0 <= r.eta2_ppm <= 1_000_000 for r in rows.values())
