"""Semantic invariants for interval_union_coverage and
graph_ra_link_prediction (oracle checks value equality; these check
meaning against independent recomputations)."""

from collections import defaultdict

import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_interval_union_matches_pandas_merge(spark, sf_dir):
    out = {r.c_mktsegment: r
           for r in QUERIES["interval_union_coverage"](spark, sf_dir)
           .collect()}
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    seg_of = dict(zip(cust.c_custkey, cust.c_mktsegment))
    days = (orders.o_orderdate.values.astype("datetime64[D]")
            .astype("int64"))
    per_cust = defaultdict(list)
    for ck, s in zip(orders.o_custkey, days):
        per_cust[ck].append((int(s), int(s) + 30))
    covered = defaultdict(int)
    islands = defaultdict(int)
    n_orders = defaultdict(int)
    for ck, ivs in per_cust.items():
        seg = seg_of[ck]
        n_orders[seg] += len(ivs)
        ivs.sort()
        cur_s, cur_e = ivs[0]
        for s, e in ivs[1:]:
            if s > cur_e:  # gap: close the island
                covered[seg] += cur_e - cur_s + 1
                islands[seg] += 1
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        covered[seg] += cur_e - cur_s + 1
        islands[seg] += 1
    assert set(out) == set(covered)
    for seg, r in out.items():
        assert r.covered_days == covered[seg]
        assert r.n_islands == islands[seg]
        assert r.n_orders == n_orders[seg]
        assert r.raw_days == n_orders[seg] * 31
        assert r.covered_days <= r.raw_days
        assert 0 < r.coverage_micro <= 1_000_000


def test_ra_pairs_are_distance_two_nonedges(spark, sf_dir):
    out = QUERIES["graph_ra_link_prediction"](spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    from storagetapper_spark.plans.graph2 import _adj, _edges
    e = _edges(spark, sf_dir)
    edge_set = {(r.pa, r.pb) for r in e.collect()}
    adj = defaultdict(set)
    for u, v in edge_set:
        adj[u].add(v)
        adj[v].add(u)
    deg = {u: len(vs) for u, vs in adj.items()}
    scores = []
    for r in out:
        assert (r.u, r.v) not in edge_set and (r.v, r.u) not in edge_set
        common = adj[r.u] & adj[r.v]
        assert len(common) == r.cn and r.cn >= 1
        assert r.ra_micro == sum(1_000_000 // deg[w] for w in common)
        scores.append(r.ra_micro)
    # top-k is ordered
    assert scores == sorted(scores, reverse=True)


def test_rolling_robust_anomaly_matches_pandas(spark):
    """Recompute the 28-day rolling median/MAD flags in pandas at
    sf0.01 (the fixture at sf0.001 has a too-sparse daily grid for
    full frames — the driver's gate SF is 0.01)."""
    import numpy as np

    sf = "/root/testdata/sf0.01"
    out = QUERIES["ts_rolling_robust_anomaly"](spark, sf).collect()
    orders = pd.read_parquet(f"{sf}/orders.parquet",
                             columns=["o_orderdate", "o_totalprice"])
    cents = (orders.o_totalprice * 100).round().astype("int64")
    dd = (orders.o_orderdate.values.astype("datetime64[D]")
          .astype("int64"))
    daily = pd.DataFrame({"dd": dd, "c": cents}).groupby("dd")["c"] \
        .sum().to_dict()
    flagged = {}
    for d, c in daily.items():
        frame = [daily[m] for m in range(d - 27, d + 1) if m in daily]
        if len(frame) != 28:
            continue
        med = float(np.median(frame))
        mad = float(np.median([abs(x - med) for x in frame]))
        if abs(c - med) > 3 * mad:
            flagged[d] = (c, int(med * 2), int(mad * 4))
    got = {(r.day.toordinal() - pd.Timestamp("1970-01-01").toordinal())
           if hasattr(r.day, "toordinal") else r.day: r for r in out}
    got = {int(k): (v.cents, v.med_x2, v.mad_x4) for k, v in got.items()}
    assert got == flagged
    assert len(out) > 0  # non-degenerate at the gate SF


def test_drift_ks_by_feature_matches_numpy(spark, sf_dir):
    import math

    import numpy as np

    out = {r.feat: r for r in
           QUERIES["drift_ks_by_feature"](spark, sf_dir).collect()}
    assert set(out) == {"quantity", "price_cents", "discount_pct"}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_shipdate", "l_quantity",
                                  "l_extendedprice", "l_discount"])
    li = li[li.l_shipdate.dt.year.isin([1995, 1996])]
    feats = {
        "quantity": li.l_quantity.astype("int64"),
        "price_cents": (li.l_extendedprice * 100).round().astype("int64"),
        "discount_pct": (li.l_discount * 100).round().astype("int64"),
    }
    is_a = (li.l_shipdate.dt.year == 1995).values
    for feat, v in feats.items():
        a = np.sort(v.values[is_a])
        b = np.sort(v.values[~is_a])
        grid = np.unique(v.values)
        fa = np.searchsorted(a, grid, side="right") / len(a)
        fb = np.searchsorted(b, grid, side="right") / len(b)
        d = np.abs(fa - fb).max()
        r = out[feat]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert r.ks_d_micro == math.floor(d * 1_000_000)


def test_mmd_linear_matches_numpy(spark, sf_dir):
    import math

    import numpy as np

    r = QUERIES["embedding_drift_mmd_linear"](spark, sf_dir).collect()[0]
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    x = np.floor(np.stack(pdf.embedding.values).astype("float64")
                 * 1e6).astype("int64")
    a = x[pdf.label.values == 0]
    b = x[pdf.label.values != 0]
    assert (r.n_label0, r.n_label1, r.n_dims) == (len(a), len(b), 64)
    d = np.array([math.floor(a[:, j].sum() / len(a)
                             - b[:, j].sum() / len(b))
                  for j in range(64)], dtype="int64")
    assert r.mmd2_micro2 == int((d * d).sum())


def test_prf_expansion_terms_are_relevant_set_terms(spark, sf_dir):
    from storagetapper_spark.plans.textrank import (
        _QUERY_TERMS, _PRF_MIN_LEN)

    out = QUERIES["text_query_expansion_prf"](spark, sf_dir).collect()
    assert 0 < len(out) <= 8
    rel = {r.doc_id for r in
           QUERIES["text_bm25_search"](spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    import re
    rel_toks = set()
    all_df = {}
    for _, row in docs.iterrows():
        toks = set(re.sub(r"[^a-z0-9 ]", " ", row.text.lower()).split())
        toks.discard("")
        for tk in toks:
            all_df[tk] = all_df.get(tk, 0) + 1
        if row.doc_id in rel:
            rel_toks |= toks
    weights = [r.offer_weight_micro for r in out]
    assert weights == sorted(weights, reverse=True)
    for r in out:
        assert r.tok in rel_toks            # candidates come from R
        assert r.tok not in _QUERY_TERMS    # original terms excluded
        assert len(r.tok) >= _PRF_MIN_LEN
        assert 1 <= r.r <= 10
        assert r.df == all_df[r.tok]        # df is corpus-wide
