"""Replays for the round-7 continuation batch F: exact mode with
deterministic tiebreak, and the stump learning curve (nested hash
subsets replayed literally in pandas)."""

import hashlib
import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_mode_exact_replay(spark, sf_dir):
    rows = QUERIES["agg_mode_exact"](spark, sf_dir).collect()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    for r in rows:
        sub = li[(li.l_returnflag == r.rf) & (li.l_linestatus == r.ls)]
        counts = sub.l_quantity.astype(np.int64).value_counts()
        best_c = counts.max()
        best_v = min(int(v) for v, c in counts.items() if c == best_c)
        assert (r.mode_quantity, r.mode_count) == (best_v, int(best_c))
        assert r.n_group == len(sub)
        assert r.mode_share_micro == int(best_c) * 1_000_000 // len(sub)
    assert len(rows) == (li.groupby(["l_returnflag", "l_linestatus"])
                         .ngroups)


def _u60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


def test_learning_curve_replay(spark, sf_dir):
    rows = {r.denom: r
            for r in QUERIES["ml_learning_curve"](spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")[["p_partkey", "p_type"]]
    df = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    df["c"] = np.round(df.l_extendedprice * 100).astype(np.int64)
    df["pos"] = df.p_type.str.startswith("PROMO")
    df["u"] = [
        _u60(f"{o}-{l}") for o, l in zip(df.l_orderkey, df.l_linenumber)]

    def best_stump(sub):
        """argmin over thresholds (grid + no-split -1) of errors for
        'pos iff c <= thr', ties to the lowest threshold."""
        tp = int(sub.pos.sum())
        cands = [(-1, tp)]
        g = (sub.groupby("c").pos
             .agg(np_=lambda s: int(s.sum()), n="size").sort_index())
        cum_np = g.np_.cumsum()
        cum_nn = (g.n - g.np_).cumsum()
        for c in g.index:
            cands.append((int(c), (tp - int(cum_np[c])) + int(cum_nn[c])))
        err, thr = min((e, c) for c, e in cands)
        return thr, err

    n_full = len(df)
    for d in (8, 4, 2, 1):
        sub = df[df.u < (1 << 60) // d]
        thr, err = best_stump(sub)
        r = rows[d]
        assert r.n_train == len(sub)
        assert (r.threshold_cents, r.train_err) == (thr, err)
        pred = df.c <= thr
        full_err = int((pred != df.pos).sum())
        assert r.full_err == full_err
        assert r.full_acc_micro == (n_full - full_err) * 1_000_000 // n_full
    # nested subsets: training sizes strictly increase
    sizes = [rows[d].n_train for d in (8, 4, 2, 1)]
    assert sizes == sorted(sizes)
