"""Literal replays for pipeline batch 13: watermark planner (two-phase
running max == sequential scan), PAVA isotonic calibration (exact
integer merges + monotonicity/optimality properties), recsys
coverage/diversity."""

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_watermark_planner_replay(spark, sf_dir):
    r = QUERIES["events_watermark_planner"](spark, sf_dir).collect()[0]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values("event_id")
    e = (ev.ts.astype("datetime64[ns]").astype("int64") // 1000).to_numpy()
    rmax = np.maximum.accumulate(e)
    late = rmax - e
    assert r.n_events == len(e)
    assert r.max_late_us == int(late.max())
    assert r.n_late_any == int((late > 0).sum())
    for d in (60, 300, 900, 3600, 21600):
        nd = int((late > d * 1_000_000).sum())
        assert getattr(r, f"n_dropped_{d}s") == nd
        assert getattr(r, f"drop_ppm_{d}s") == nd * 1_000_000 // len(e)
    # the sweep is monotone: longer delay never drops more
    drops = [getattr(r, f"n_dropped_{d}s")
             for d in (60, 300, 900, 3600, 21600)]
    assert drops == sorted(drops, reverse=True)


def _pava_reference(grid):
    """Independent PAVA: repeatedly merge the first violating pair."""
    blocks = [[b, b, n, p] for b, n, p in grid]
    while True:
        v = next((j for j in range(len(blocks) - 1)
                  if blocks[j][3] * blocks[j + 1][2]
                  > blocks[j + 1][3] * blocks[j][2]), None)
        if v is None:
            return blocks
        a, b = blocks[v], blocks[v + 1]
        blocks[v:v + 2] = [[a[0], b[1], a[2] + b[2], a[3] + b[3]]]


def test_isotonic_calibration_replay(spark, sf_dir):
    rows = QUERIES["ml_isotonic_calibration"](spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.stack(emb.embedding.to_numpy())[:, 0]
                 .astype(np.float64) * 1e6).astype(np.int64)
    y = (emb.label == 1).astype(np.int64).to_numpy()
    mn, mx = int(v.min()), int(v.max())
    bins = (v - mn) * 100 // (mx - mn + 1)
    grid = sorted((int(b), int((bins == b).sum()), int(y[bins == b].sum()))
                  for b in np.unique(bins))
    want = _pava_reference(grid)
    got = [(r.bin_lo, r.bin_hi, r.n, r.pos) for r in rows]
    assert got == [tuple(b) for b in want]
    for r in rows:
        assert r.rate_micro == r.pos * 1_000_000 // r.n
    # defining isotonic properties: rates non-decreasing, totals
    # preserved, and each block's rate is the mean of what it pooled
    rates = [r.rate_micro for r in rows]
    assert rates == sorted(rates)
    assert sum(r.n for r in rows) == len(v)
    assert sum(r.pos for r in rows) == int(y.sum())
    # block ranges tile the bin axis without overlap
    for a, b in zip(rows, rows[1:]):
        assert a.bin_hi < b.bin_lo


def test_isotonic_is_optimal_fit(spark, sf_dir):
    """PAVA minimizes squared error among monotone fits: check that the
    pooled solution beats both the trivial constant fit and a
    per-bin-clamped alternative on the binned data."""
    rows = QUERIES["ml_isotonic_calibration"](spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    v = np.floor(np.stack(emb.embedding.to_numpy())[:, 0]
                 .astype(np.float64) * 1e6).astype(np.int64)
    y = (emb.label == 1).astype(np.int64).to_numpy()
    mn, mx = int(v.min()), int(v.max())
    bins = (v - mn) * 100 // (mx - mn + 1)
    fit = {}
    for r in rows:
        for b in range(r.bin_lo, r.bin_hi + 1):
            fit[b] = r.pos / r.n
    sse_pava = sum((y[i] - fit[int(bins[i])]) ** 2 for i in range(len(y)))
    const = y.mean()
    sse_const = float(((y - const) ** 2).sum())
    assert sse_pava <= sse_const + 1e-9


def test_recsys_coverage_diversity_replay(spark, sf_dir):
    r = QUERIES["recsys_coverage_diversity"](spark, sf_dir).collect()[0]
    li = (pd.read_parquet(f"{sf_dir}/lineitem.parquet")
          [["l_orderkey", "l_partkey"]].drop_duplicates())
    merged = li.merge(li, on="l_orderkey")
    merged = merged[merged.l_partkey_x != merged.l_partkey_y]
    cooc = (merged.groupby(["l_partkey_x", "l_partkey_y"]).size()
            .reset_index(name="n_ab"))
    cooc = cooc[cooc.n_ab >= 2]
    cnt = li.groupby("l_partkey").size().to_dict()
    sim = {}
    for t_ in cooc.itertuples():
        c = math.floor(t_.n_ab
                       / math.sqrt(cnt[t_.l_partkey_x]
                                   * cnt[t_.l_partkey_y]) * 1e6)
        sim[(t_.l_partkey_x, t_.l_partkey_y)] = (c, t_.n_ab)
    by_pa = defaultdict(list)
    for (pa, pb), (c, n_ab) in sim.items():
        by_pa[pa].append((-c, -n_ab, pb))
    recs = {pa: [pb for _, _, pb in sorted(v)[:5]]
            for pa, v in by_pa.items()}
    assert r.n_catalog == len(cnt)
    assert r.n_items_with_recs == len(recs)
    rec_items = {pb for v in recs.values() for pb in v}
    assert r.n_recommended == len(rec_items)
    assert r.n_rec_rows == sum(len(v) for v in recs.values())
    assert r.coverage_ppm == len(rec_items) * 1_000_000 // len(cnt)
    n_pairs, sim_sum = 0, 0
    for pa, lst in recs.items():
        for i in range(len(lst)):
            for j in range(i + 1, len(lst)):
                n_pairs += 1
                sim_sum += sim.get((lst[i], lst[j]), (0, 0))[0]
    assert r.n_pairs == n_pairs
    assert r.mean_intra_sim_micro == sim_sum // n_pairs
    assert r.mean_intra_diversity_micro == 1_000_000 - sim_sum // n_pairs


def test_unigram_viterbi_replay(spark, sf_dir):
    """Independent replay: rebuild the vocabulary and run a separate
    Viterbi implementation (plain DP over dict lookups), then check
    the per-length aggregates exactly — plus the defining optimality
    property: the DP score beats the all-single-chars segmentation."""
    import re
    from collections import Counter

    rows = {r.len: r for r in
            QUERIES["tokenizer_unigram_viterbi"](spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def norm(s):
        s = re.sub(r"[^a-z0-9 ]", " ", s.lower())
        return re.sub(r" +", " ", s).strip()

    wf = Counter()
    for t_ in docs.text:
        for w in norm(t_).split(" "):
            if 1 <= len(w) <= 16:
                wf[w] += 1
    pf = Counter()
    for w, f in wf.items():
        for n in range(1, 5):
            for i in range(len(w) - n + 1):
                pf[w[i:i + n]] += f
    top = sorted(pf.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
    vocab_keys = {p for p, _ in top} | {p for p in pf if len(p) == 1}
    z = float(sum(pf[p] for p in vocab_keys))
    sc = {p: int(np.round(math.log(pf[p] / z) * 1e6)) for p in vocab_keys}

    agg = defaultdict(lambda: [0, 0, 0, 0])  # n_words, freq, pieces, score
    for w, f in wf.items():
        L = len(w)
        bests, cnts = [0] * (L + 1), [0] * (L + 1)
        for j in range(1, L + 1):
            cands = [(bests[i] + sc[w[i:j]], -(cnts[i] + 1), i)
                     for i in range(max(0, j - 4), j) if w[i:j] in sc]
            s, negc, _ = max(cands)
            bests[j], cnts[j] = s, -negc
        # optimality vs the trivial all-singles segmentation
        singles = sum(sc[c] for c in w)
        assert bests[L] >= singles
        assert 1 <= cnts[L] <= L
        a = agg[L]
        a[0] += 1
        a[1] += f
        a[2] += f * cnts[L]
        a[3] += f * bests[L]
    for L, (nw, tf, tp, ws) in agg.items():
        r = rows[L]
        assert (r.n_words, r.total_freq, r.total_pieces) == (nw, tf, tp)
        assert r.avg_pieces_milli == tp * 1000 // tf
        assert r.chars_per_piece_micro == L * tf * 1_000_000 // tp
        assert r.avg_score_micro == math.floor(float(ws) / float(tf))
    assert set(rows) == set(agg)
