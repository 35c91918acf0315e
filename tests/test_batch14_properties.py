"""Replays for batch 14: the Louvain move round — full independent
recomputation in Python (integer gains, synchronous moves) plus a
constructed two-clique graph where one round must recover the planted
communities."""

import math
from collections import defaultdict

import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def _louvain_reference(edges, brand_of):
    """edges: dict[(pa,pb)] = w with pa<pb; returns the query's row."""
    sym = defaultdict(dict)
    for (pa, pb), w in edges.items():
        sym[pa][pb] = w
        sym[pb][pa] = w
    deg = {i: sum(nb.values()) for i, nb in sym.items()}
    m2 = sum(deg.values())
    lbl = {i: brand_of[i] for i in deg}
    tot = defaultdict(int)
    for i, c in lbl.items():
        tot[c] += deg[i]
    new = {}
    for i in deg:
        wic = defaultdict(int)
        for j, w in sym[i].items():
            wic[lbl[j]] += w
        g_stay = m2 * wic.get(lbl[i], 0) - deg[i] * (tot[lbl[i]] - deg[i])
        cands = [(m2 * w - deg[i] * tot[c], c)
                 for c, w in wic.items() if c != lbl[i]]
        if cands and max(cands)[0] > g_stay:
            new[i] = max(cands)[1]
        else:
            new[i] = lbl[i]

    def q4(lab):
        s_in = defaultdict(int)
        s_tot = defaultdict(int)
        for (pa, pb), w in edges.items():
            if lab[pa] == lab[pb]:
                s_in[lab[pa]] += 2 * w
        for i, c in lab.items():
            s_tot[c] += deg[i]
        return (sum(m2 * s_in.get(c, 0) - s_tot[c] ** 2 for c in s_tot),
                len(s_tot))

    qb, ncb = q4(lbl)
    qa, nca = q4(new)
    return {
        "n_nodes": len(deg), "n_edges": len(edges), "m2": m2,
        "n_moved": sum(new[i] != lbl[i] for i in deg),
        "n_comm_before": ncb, "n_comm_after": nca,
        "q_before_micro": math.floor(qb / (m2 * m2) * 1e6),
        "q_after_micro": math.floor(qa / (m2 * m2) * 1e6),
    }, lbl, new


def _edges_from_fixture(sf_dir):
    li = (pd.read_parquet(f"{sf_dir}/lineitem.parquet")
          [["l_orderkey", "l_partkey"]].drop_duplicates())
    m = li.merge(li, on="l_orderkey")
    m = m[m.l_partkey_x < m.l_partkey_y]
    cooc = (m.groupby(["l_partkey_x", "l_partkey_y"]).size()
            .reset_index(name="w"))
    cooc = cooc[cooc.w >= 2]
    return {(t.l_partkey_x, t.l_partkey_y): int(t.w)
            for t in cooc.itertuples()}


def test_louvain_move_round_replay(spark, sf_dir):
    r = QUERIES["graph_louvain_move_round"](spark, sf_dir).collect()[0]
    edges = _edges_from_fixture(sf_dir)
    part = pd.read_parquet(f"{sf_dir}/part.parquet")
    brand_of = dict(zip(part.p_partkey, part.p_brand))
    want, lbl, new = _louvain_reference(edges, brand_of)
    for k, v in want.items():
        assert getattr(r, k) == v, (k, getattr(r, k), v)
    # every executed move had strictly positive individual gain at
    # decision time (the defining greedy property; the synchronous
    # round applies them simultaneously)
    assert want["n_moved"] == sum(new[i] != lbl[i] for i in new)


def test_louvain_recovers_planted_cliques(spark, tmp_path):
    """Two 6-cliques joined by one weak edge, brands planted WRONG for
    one node per clique: the move round must relabel exactly those two
    nodes and modularity must rise."""
    orders = []
    oid = 0
    # each co-order of a pair twice => edge weight 2
    cliq1, cliq2 = list(range(1, 7)), list(range(7, 13))
    for grp in (cliq1, cliq2):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                for _ in range(2):
                    orders.append((oid, grp[i]))
                    orders.append((oid, grp[j]))
                    oid += 1
    # one weak cross edge
    for _ in range(2):
        orders.append((oid, 6))
        orders.append((oid, 7))
        oid += 1
    pd.DataFrame(orders, columns=["l_orderkey", "l_partkey"]) \
        .to_parquet(tmp_path / "lineitem.parquet")
    brands = [(p, "BrandA" if p in cliq1 else "BrandB") for p in cliq1
              + cliq2]
    # plant two wrong labels
    brands = [(p, ("BrandB" if p == 3 else ("BrandA" if p == 9 else b)))
              for p, b in brands]
    pd.DataFrame([(p, f"part{p}", b, "t", 1, 1.0) for p, b in brands],
                 columns=["p_partkey", "p_name", "p_brand", "p_type",
                          "p_size", "p_retailprice"]) \
        .to_parquet(tmp_path / "part.parquet")
    r = QUERIES["graph_louvain_move_round"](spark, str(tmp_path)) \
        .collect()[0]
    assert r.n_moved == 2
    assert r.n_comm_before == 2 and r.n_comm_after == 2
    assert r.q_after_micro > r.q_before_micro
