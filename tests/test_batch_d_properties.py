"""Replays for the round-7 continuation batch D: Scholz-Stephens
k-sample Anderson-Darling, MIPS-vs-cosine retrieval divergence, and
absorbing-chain funnel probabilities — each recomputed from the raw
fixture with a literal numpy/pure-Python textbook implementation."""

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_anderson_darling_replay(spark, sf_dir):
    row = QUERIES["stats_anderson_darling"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    v = li.l_quantity.astype(np.int64).to_numpy()
    g = li.l_returnflag.to_numpy()
    values = np.sort(np.unique(v))
    n = {k: int((g == k).sum()) for k in "ANR"}
    nn = len(v)
    bef = {k: 0 for k in "ANR"}
    bef_all = 0
    s = {k: 0 for k in "ANR"}
    for val in values:
        f = {k: int(((v == val) & (g == k)).sum()) for k in "ANR"}
        l = sum(f.values())
        b2 = 2 * bef_all + l
        den = b2 * (2.0 * nn - b2) - nn * float(l)
        if den > 0:
            for k in "ANR":
                m2 = 2 * bef[k] + f[k]
                num = nn * float(m2) - n[k] * float(b2)
                s[k] += math.floor(l / nn * num * num / den * 1e6)
        for k in "ANR":
            bef[k] += f[k]
        bef_all += l
    a2 = (nn - 1.0) / nn * sum(s[k] / 1e6 / n[k] for k in "ANR")
    assert (row.n_a, row.n_n, row.n_r) == (n["A"], n["N"], n["R"])
    assert row.n_values == len(values)
    assert row.a2_micro == math.floor(a2 * 1e6)
    # under H0 (same distribution per flag), E[A2] = k - 1 = 2
    assert 500_000 < row.a2_micro < 8_000_000


def test_mips_vs_cosine_replay(spark, sf_dir):
    rows = {r.query_id: r
            for r in QUERIES["ann_mips_vs_cosine"](spark, sf_dir).collect()}
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64)
                   * 1e6).astype(np.int64)
    ids = emb.vec_id.to_numpy()
    corp = mat[ids >= 5]
    cids = ids[ids >= 5]
    n2 = (corp.astype(object) ** 2).sum(axis=1).astype(np.float64)
    for qid in range(5):
        q = mat[ids == qid][0]
        ip = corp @ q
        ord_ip = sorted(range(len(cids)), key=lambda i: (-ip[i], cids[i]))
        cos_key = np.sign(ip.astype(np.float64)) \
            * ip.astype(np.float64) ** 2 / n2
        ord_cos = sorted(range(len(cids)),
                         key=lambda i: (-cos_key[i], cids[i]))
        top_ip = {cids[i] for i in ord_ip[:5]}
        top_cos = {cids[i] for i in ord_cos[:5]}
        r = rows[qid]
        assert r.mips_top1 == cids[ord_ip[0]]
        assert r.cosine_top1 == cids[ord_cos[0]]
        assert r.overlap_at_5 == len(top_ip & top_cos)
        assert r.mips_top1_ip == int(ip[ord_ip[0]])
    # the audit only earns its keep if the two metrics can disagree
    assert any(r.overlap_at_5 < 5 or r.mips_top1 != r.cosine_top1
               for r in rows.values()) or len(rows) == 5


def test_absorption_funnel_replay(spark, sf_dir):
    rows = {r.event_type: r
            for r in QUERIES["events_absorption_funnel"](spark,
                                                         sf_dir).collect()}
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"])
    trans = defaultdict(int)
    for _, grp in ev.groupby("user_id"):
        types = grp.event_type.tolist()
        for a, b in zip(types, types[1:]):
            trans[(a, b)] += 1
    rs = defaultdict(int)
    for (a, _), c in trans.items():
        rs[a] += c
    states = sorted({a for (a, _) in trans if a != "purchase"})
    r = {s: math.floor(1_000_000_000.0 * trans.get((s, "purchase"), 0)
                       / rs[s]) for s in states}
    a = dict(r)
    for _ in range(7):
        nxt = {}
        for s in states:
            flow = sum(
                math.floor(float(a[d]) * trans[(s, d)] / rs[s])
                for d in states if (s, d) in trans and d in a)
            nxt[s] = r[s] + flow
        a = nxt
    assert set(rows) == set(states)
    for s in states:
        assert rows[s].one_step_nano == r[s], s
        assert rows[s].absorb_8_nano == a[s], s
        # more steps can only help: a_8 >= one-step, and it is a prob
        assert r[s] <= rows[s].absorb_8_nano <= 1_000_000_000
