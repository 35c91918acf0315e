"""Replays for the round-7 continuation batch L: Benjamini-Yekutieli
step-up, cost-sensitive threshold curve, zone-map overlap depth."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES
from storagetapper_spark.plans.stats4 import _BY_THR_MICRO


def test_fdr_by_is_a_subset_of_bh_and_replays(spark, sf_dir):
    by = {r.p_brand: r
          for r in QUERIES["stats_fdr_by"](spark, sf_dir).collect()}
    bh = {r.p_brand: r
          for r in QUERIES["stats_fdr_bh"](spark, sf_dir).collect()}
    assert set(by) == set(bh)
    for b in by:
        # same |z| table and ranking, stricter thresholds
        assert by[b].abs_z_micro == bh[b].abs_z_micro
        assert by[b].rk == bh[b].rk
        assert by[b].thr_micro > bh[b].thr_micro
        # BY under arbitrary dependence can only reject a SUBSET of BH
        if by[b].rejected:
            assert bh[b].rejected, b
    # replay the step-up walk with the literal BY thresholds
    ranked = sorted(by.values(), key=lambda r: r.rk)
    istar = 0
    for r in ranked:
        if r.abs_z_micro >= _BY_THR_MICRO[r.rk - 1]:
            istar = r.rk
    for r in ranked:
        assert r.thr_micro == _BY_THR_MICRO[r.rk - 1]
        assert r.rejected == (r.rk <= istar)


def test_threshold_cost_curve_replay(spark, sf_dir):
    rows = QUERIES["ml_threshold_cost_curve"](spark, sf_dir).collect()
    argmin = [r for r in rows if r.probe == "argmin"][0]
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.stack(emb.embedding.to_numpy())[:, 0]
                 .astype(np.float64) * 1e6).astype(np.int64)
    pos = (emb.label == 1).to_numpy()
    grid = np.sort(np.unique(v))
    best = None
    for th in grid:
        fn = int((pos & (v < th)).sum())
        fp = int((~pos & (v >= th)).sum())
        cost = 5 * fn + fp
        if best is None or (cost, th) < best:
            best = (cost, th, fn, fp)
    assert (argmin.cost, argmin.v) == (best[0], best[1])
    assert (argmin.fn, argmin.fp) == (best[2], best[3])
    # the argmin beats both degenerate policies
    all_pos_cost = int((~pos).sum())       # threshold at grid min
    all_neg_cost = 5 * int(pos.sum())      # threshold above grid max
    assert argmin.cost <= min(all_pos_cost, all_neg_cost)
    # curve probes carry the exact cost identity too
    for r in rows:
        assert r.cost == 5 * r.fn + r.fp


def test_overlap_depth_replay(spark, sf_dir):
    rows = {r.layout: r
            for r in QUERIES["layout_overlap_depth"](spark,
                                                     sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["ship_day"] = pd.to_datetime(li.l_shipdate).dt.date
    epoch = pd.Timestamp("1970-01-01").date()

    def depth_stats(sort_cols):
        srt = li.sort_values(sort_cols, kind="mergesort").reset_index()
        chunks = []
        for c in range(0, len(srt), 4096):
            blk = srt.iloc[c:c + 4096].ship_day
            chunks.append(((blk.min() - epoch).days,
                           (blk.max() - epoch).days))
        deltas = {}
        for lo, hi in chunks:
            deltas[lo] = deltas.get(lo, 0) + 1
            deltas[hi + 1] = deltas.get(hi + 1, 0) - 1
        days = sorted(deltas)
        depth = 0
        max_d, wsum, span_tot = 0, 0, 0
        for d, nxt in zip(days, days[1:]):
            depth += deltas[d]
            span = nxt - d
            max_d = max(max_d, depth)
            wsum += depth * span
            span_tot += span
        return len(chunks), max_d, wsum, span_tot

    for layout, cols in (("natural", ["l_orderkey", "l_linenumber"]),
                         ("sorted", ["ship_day", "l_orderkey",
                                     "l_linenumber"])):
        nc, mx, wsum, span = depth_stats(cols)
        r = rows[layout]
        assert r.n_chunks == nc
        assert r.max_depth == mx
        assert r.span_days == span
        assert r.avg_depth_milli == wsum * 1000 // span
    # clustering by the query key can only reduce read amplification
    assert rows["sorted"].avg_depth_milli \
        <= rows["natural"].avg_depth_milli
