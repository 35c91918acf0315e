"""Replays for the round-7 continuation batch M (final micro-batch):
exact trimmed mean via grid boundary terms, calibration slope."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_trimmed_mean_replay(spark, sf_dir):
    row = QUERIES["agg_trimmed_mean_exact"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    v = np.sort(np.round(li.l_extendedprice * 100).astype(np.int64))
    n = len(v)
    k = n * 50 // 1000
    kept = v[k:n - k]
    assert (row.n, row.k_per_tail, row.n_kept) == (n, k, len(kept))
    ks = int(kept.astype(object).sum())
    assert row.trimmed_mean_cents == ks // len(kept)
    assert row.trimmed_mean_milli_cents == ks * 1000 // len(kept)
    # the trimmed mean stays inside the kept range and within 5% of
    # the raw mean on this near-symmetric price distribution
    raw_milli = int(v.astype(object).sum()) * 1000 // n
    assert kept[0] * 1000 <= row.trimmed_mean_milli_cents <= kept[-1] * 1000
    assert abs(row.trimmed_mean_milli_cents - raw_milli) < raw_milli // 20


def test_reliability_slope_replay(spark, sf_dir):
    row = QUERIES["ml_reliability_slope"](spark, sf_dir).collect()[0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.stack(emb.embedding.to_numpy())[:, 0]
                 .astype(np.float64) * 1e6).astype(np.int64)
    y = (emb.label == 1).astype(np.int64).to_numpy()
    mn, mx = int(v.min()), int(v.max())
    p = (v - mn) * 1_000_000 // (mx - mn)
    n = len(v)
    sp = float(p.sum()) / 1e6
    spp = float((p.astype(object) ** 2).sum()) / 1e12
    sy = float(y.sum())
    spy = float((p.astype(object) * y).sum()) / 1e6
    slope = (n * spy - sp * sy) / (n * spp - sp * sp)
    intercept = (sy - slope * sp) / n
    assert row.n == n
    assert row.slope_micro == math.floor(slope * 1e6)
    assert row.intercept_micro == math.floor(intercept * 1e6)
    # a predicted rate at mid-scale stays a probability-ish value
    mid = (slope * 0.5 + intercept)
    assert -0.5 < mid < 1.5
