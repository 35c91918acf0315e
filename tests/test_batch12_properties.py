"""Literal replays for the round-10 freeze-lift batch (datapipe12):
winnowing fingerprints, winnowing pairs, tokenizer fertility, encoding
quality, systematic PPS sampling, DSIR importance, G-test — each
re-derived driver-side from the raw parquet with pandas/numpy/hashlib
and compared exactly (the batch's outputs are exact integers; the DSIR
and G-test log terms are quantized per bucket/cell before their sums,
so the replays reproduce them with the same quantization)."""

import hashlib
import math
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES

_W = 4
_N = 3


def _norm(s: str) -> str:
    s = re.sub(r"[^a-z0-9 ]", " ", s.lower())
    return re.sub(r" +", " ", s).strip()


def _winnow(text: str):
    """Reference winnowing: word 3-gram md5s, window-4 rightmost min.
    Returns (n_grams, set of (hash, pos))."""
    w = _norm(text).split(" ")
    if len(w) < _N:
        grams = [" ".join(w)]
    else:
        grams = [" ".join(w[i:i + _N]) for i in range(len(w) - _N + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    n = len(hs)
    sel = set()
    for i in range(max(1, n - _W + 1)):
        win = hs[i:i + _W]
        m = min(win)
        # rightmost occurrence of the minimum
        j = max(k for k, h in enumerate(win) if h == m)
        sel.add((m, i + j))
    return n, sel


def test_winnowing_fingerprints_replay(spark, sf_dir):
    out = {r.doc_id: r for r in
           QUERIES["text_winnowing_fingerprints"](spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert set(out) == set(docs.doc_id)
    for _, d in docs.iterrows():
        n, sel = _winnow(d.text)
        r = out[d.doc_id]
        assert r.n_grams == n
        assert r.n_fp == len(sel)
        assert r.n_windows == max(1, n - _W + 1)
        assert r.density_ppm == len(sel) * 1_000_000 // max(1, n - _W + 1)
        xor = 0
        for h, _pos in sel:
            xor ^= int(h[:15], 16)
        assert r.fp_xor == xor
        # the paper's density guarantee: expectation 2/(w+1); any doc
        # stays within the hard bounds [1/w, 1] per window
        assert len(sel) <= max(1, n - _W + 1)


def test_winnowing_pairs_replay(spark, sf_dir):
    rows = QUERIES["dedup_winnowing_pairs"](spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    fp = {d.doc_id: {h for h, _ in _winnow(d.text)[1]}
          for d in docs.itertuples()}
    freq = Counter(h for s in fp.values() for h in s)
    hot = {h for h, c in freq.items() if c < 2 or c > 50}
    shared = defaultdict(int)
    by_hash = defaultdict(list)
    for did, s in fp.items():
        for h in s:
            if h not in hot:
                by_hash[h].append(did)
    for h, ds in by_hash.items():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    want = {(a, b): c for (a, b), c in shared.items() if c >= 2}
    got = {(r.doc_a, r.doc_b): r for r in rows}
    assert set(got) == set(want)
    for (a, b), r in got.items():
        assert r.n_shared == want[(a, b)]
        assert r.containment_ppm == (want[(a, b)] * 1_000_000
                                     // min(len(fp[a]), len(fp[b])))
    # winnowing's reason to exist next to minhash: a shared run of
    # >= n+w-1 = 6 words guarantees a shared fingerprint, so every
    # reported pair genuinely shares passages (spot-audit the top one)
    if rows:
        top = max(rows, key=lambda r: r.n_shared)
        ta = set(_winnow(docs[docs.doc_id == top.doc_a].text.iloc[0])[1])
        tb = set(_winnow(docs[docs.doc_id == top.doc_b].text.iloc[0])[1])
        assert len({h for h, _ in ta} & {h for h, _ in tb}) >= top.n_shared


def test_tokenizer_fertility_replay(spark, sf_dir):
    rows = {r.lang: r for r in
            QUERIES["tokenizer_fertility_by_lang"](spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pat = re.compile(r"[a-z0-9]+|[^a-z0-9 ]")
    for lang, g in docs.groupby("lang"):
        chars = int(g.text.str.len().sum())
        words = int((g.text.str.len()
                     - g.text.str.replace(" ", "", regex=False).str.len()
                     + 1).sum())
        toks = int(sum(len(pat.findall(t.lower())) for t in g.text))
        r = rows[lang]
        assert (r.n_docs, r.chars, r.words, r.tokens) == \
            (len(g), chars, words, toks)
        assert r.tokens_per_word_micro == toks * 1_000_000 // words
        assert r.tokens_per_100c_micro == toks * 100_000_000 // chars
        assert r.chars_per_token_micro == chars * 1_000_000 // toks


def test_encoding_quality_replay(spark, sf_dir):
    rows = {r.source: r for r in
            QUERIES["text_encoding_quality"](spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ctl = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")
    moji = re.compile("Ã|â€|Â")
    for src, g in docs.groupby("source"):
        chars = int(g.text.str.len().sum())
        na = int(sum(sum(ord(c) > 127 for c in t) for t in g.text))
        r = rows[src]
        assert (r.n_docs, r.chars, r.non_ascii_chars) == (len(g), chars, na)
        assert r.docs_replacement_char == sum("�" in t for t in g.text)
        assert r.docs_control_chars == sum(bool(ctl.search(t))
                                           for t in g.text)
        assert r.docs_mojibake == sum(bool(moji.search(t)) for t in g.text)
        assert r.non_ascii_ppm == na * 1_000_000 // chars


def test_pps_systematic_replay(spark, sf_dir):
    rows = QUERIES["sample_pps_systematic"](spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["w"] = np.round(o.o_totalprice * 100).astype(np.int64)
    o["h"] = [hashlib.md5(str(k).encode()).hexdigest() for k in o.o_orderkey]
    got = defaultdict(list)
    for r in rows:
        got[r.stratum].append(r)
    for stratum, g in o.groupby("o_orderpriority"):
        g = g.sort_values(["h", "o_orderkey"])
        tot = int(g.w.astype(object).sum())
        step = tot // 10
        cum, want = 0, []
        for t in g.itertuples():
            prev = cum
            cum += int(t.w)
            if cum // step > prev // step:
                want.append((t.o_orderkey, int(t.w), cum, cum // step))
        have = [(r.o_orderkey, r.w, r.cum, r.sel_idx) for r in got[stratum]]
        assert sorted(have, key=lambda x: x[3]) == want
        # PPS property: the selection is size-biased — every selected
        # row "covers" the step boundary its weight straddles
        for _, w, cum_v, idx in want:
            assert (cum_v - w) < idx * step <= cum_v


def test_dsir_importance_replay(spark, sf_dir):
    rows = {r.source: r for r in
            QUERIES["sample_dsir_importance"](spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    B = 4096

    def buckets(text):
        return [int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B
                for tok in _norm(text).split(" ")]

    per_doc_b = {d.doc_id: buckets(d.text) for d in docs.itertuples()}
    src_of = dict(zip(docs.doc_id, docs.source))
    cs, ct = Counter(), Counter()
    for did, bs in per_doc_b.items():
        cs.update(bs)
        if src_of[did] == "src0":
            ct.update(bs)
    ns, nt = sum(cs.values()), sum(ct.values())
    lrm = {b: int(np.round((math.log((ct.get(b, 0) + 1.0) / (nt + B))
                            - math.log((cs[b] + 1.0) / (ns + B))) * 1e6))
           for b in cs}
    w = {did: sum(lrm[b] for b in bs) for did, bs in per_doc_b.items()}
    agg = defaultdict(list)
    ntok = defaultdict(int)
    for did, wv in w.items():
        agg[src_of[did]].append(wv)
        ntok[src_of[did]] += len(per_doc_b[did])
    for src, ws in agg.items():
        r = rows[src]
        assert r.n_docs == len(ws)
        assert r.sum_w_micro == sum(ws)
        assert r.sum_tok == ntok[src]
        assert r.w_per_ktok == math.floor(float(sum(ws)) * 1000.0
                                          / float(ntok[src]))
        assert r.min_w_micro == min(ws)
        assert r.max_w_micro == max(ws)
        assert r.n_target_leaning == sum(v > 0 for v in ws)
    # NOTE: the fixture's 20 sources draw from one shared vocabulary
    # (iid), so no source genuinely leans toward src0 — the weights
    # here are smoothing bias x doc length, which is exactly what DSIR
    # should report for an undifferentiated corpus.  The semantic
    # separation property is proven on a constructed domain-shifted
    # corpus below.


def test_dsir_importance_detects_domain_shift(spark, tmp_path):
    """On a corpus with a REAL domain difference the target source must
    get the highest length-normalized importance: src0 speaks
    vocabulary A, src2 speaks vocabulary B, src1 mixes — DSIR weights
    must order src0 > src1 > src2."""
    rng = np.random.RandomState(7)
    va = ["alpha", "beta", "gamma", "delta", "prime", "vector"]
    vb = ["stone", "river", "cloud", "ember", "forest", "tide"]

    def doc(vocab, n=30):
        return " ".join(rng.choice(vocab, n))

    recs = []
    for i in range(30):
        recs.append((i, doc(va), "en", "src0", 0))
    for i in range(30, 60):
        recs.append((i, doc(va + vb), "en", "src1", 0))
    for i in range(60, 90):
        recs.append((i, doc(vb), "en", "src2", 0))
    pd.DataFrame(recs, columns=["doc_id", "text", "lang", "source",
                                "n_chars"]) \
        .to_parquet(tmp_path / "documents.parquet")
    rows = {r.source: r for r in
            QUERIES["sample_dsir_importance"](spark, str(tmp_path))
            .collect()}
    assert rows["src0"].w_per_ktok > rows["src1"].w_per_ktok \
        > rows["src2"].w_per_ktok
    # complete separation: the WORST target-vocabulary doc still
    # outscores the BEST off-domain doc (absolute signs are not
    # meaningful under add-one smoothing over 4096 buckets on a tiny
    # corpus — ordering is the resampling-relevant output)
    assert rows["src0"].min_w_micro > rows["src2"].max_w_micro


def test_g_test_replay(spark, sf_dir):
    r = QUERIES["stats_g_test"](spark, sf_dir).collect()[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    cells = docs.groupby(["source", "lang"]).size()
    rt = docs.groupby("source").size()
    ctot = docs.groupby("lang").size()
    n = len(docs)
    g = 0
    for (s, l), o in cells.items():
        g += int(np.round(2.0 * float(o)
                          * math.log(float(o) * float(n)
                                     / (float(rt[s]) * float(ctot[l])))
                          * 1e6))
    assert r.n_docs == n
    assert r.n_sources == docs.source.nunique()
    assert r.n_langs == docs.lang.nunique()
    assert r.df == (r.n_sources - 1) * (r.n_langs - 1)
    assert r.n_cells == len(cells)
    assert r.g_micro == g
    # G is non-negative up to quantization jitter
    assert r.g_micro >= -len(cells)


def test_holt_winters_replay(spark, sf_dir):
    """Independent pandas replay of the per-nation HW-additive
    recursion, from raw parquet through the gap-filled calendar."""
    rows = {r.n_name: r for r in
            QUERIES["ts_holt_winters_additive"](spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    j = (o.merge(c, left_on="o_custkey", right_on="c_custkey")
         .merge(n, left_on="c_nationkey", right_on="n_nationkey"))
    j["day"] = pd.to_datetime(j.o_orderdate).dt.date
    for name, g in j.groupby("n_name"):
        cnt = g.groupby("day").size()
        idx = pd.date_range(min(cnt.index), max(cnt.index), freq="D").date
        y = [float(cnt.get(d, 0)) for d in idx]
        lvl = (y[0] + y[1] + y[2] + y[3] + y[4] + y[5] + y[6]) / 7.0
        tr = 0.0
        s = [y[i] - lvl for i in range(7)]
        for i in range(7, len(y)):
            yv = y[i]
            ln = 0.5 * (yv - s[0]) + 0.5 * (lvl + tr)
            tr = 0.25 * (ln - lvl) + 0.75 * tr
            sn = 0.25 * (yv - ln) + 0.75 * s[0]
            s = s[1:] + [sn]
            lvl = ln
        r = rows[name]
        assert r.n_days == len(y)
        assert r.level_micro == math.floor(lvl * 1e6)
        assert r.trend_micro == math.floor(tr * 1e6)
        for h in range(1, 8):
            assert getattr(r, f"f{h}") == math.floor(
                (lvl + float(h) * tr + s[h - 1]) * 1e6)


def test_holt_winters_learns_weekly_season(spark, tmp_path):
    """Semantic check on a constructed weekly pattern: orders spike
    every 7th day; the fitted seasonals must put the forecast peak on
    the right weekday and the trend near zero."""
    days = pd.date_range("1995-01-01", periods=140, freq="D")
    recs = []
    key = 0
    for i, d in enumerate(days):
        n_orders = 9 if i % 7 == 3 else 2  # weekly spike on phase 3
        for _ in range(n_orders):
            recs.append((key, 0, "1-URGENT", 100.0, d.date()))
            key += 1
    pd.DataFrame(recs, columns=["o_orderkey", "o_custkey",
                                "o_orderpriority", "o_totalprice",
                                "o_orderdate"]) \
        .to_parquet(tmp_path / "orders.parquet")
    pd.DataFrame([(0, "CUST", 0, 0.0)],
                 columns=["c_custkey", "c_name", "c_nationkey",
                          "c_acctbal"]) \
        .to_parquet(tmp_path / "customer.parquet")
    pd.DataFrame([(0, "NATION_X", 0)],
                 columns=["n_nationkey", "n_name", "n_regionkey"]) \
        .to_parquet(tmp_path / "nation.parquet")
    r = QUERIES["ts_holt_winters_additive"](spark, str(tmp_path)) \
        .collect()[0]
    fs = [getattr(r, f"f{h}") for h in range(1, 8)]
    # the last observed day is phase 139%7=6; forecast h lands on phase
    # (139+h)%7 — the spike phase 3 is h=4
    assert max(range(7), key=lambda i: fs[i]) == 3
    assert fs[3] > 7_000_000  # the peak forecast is near 9 orders
    assert abs(r.trend_micro) < 50_000  # flat series: trend ~ 0
    assert all(0 < fs[i] < 4_000_000 for i in range(7) if i != 3)
