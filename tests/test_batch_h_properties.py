"""Replays for the round-7 continuation batch H: Newman modularity of
the LPA partition, TOST equivalence, and the paired sign test."""

import math
from collections import defaultdict

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_modularity_replay(spark, sf_dir):
    row = QUERIES["graph_modularity"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]].drop_duplicates()
    from collections import Counter
    pair_counts = Counter()
    for _, parts in li.groupby("l_orderkey").l_partkey.apply(list).items():
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_counts[(ps[i], ps[j])] += 1
    edges = [e for e, c in pair_counts.items() if c >= 2]
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # 3 rounds of min-label propagation over closed neighborhoods
    label = {u: u for u in adj}
    for _ in range(3):
        label = {u: min([label[u]] + [label[v] for v in adj[u]])
                 for u in adj}
    m = len(edges)
    e_c = Counter()
    for a, b in edges:
        if label[a] == label[b]:
            e_c[label[a]] += 1
    d_c = Counter()
    for u in adj:
        d_c[label[u]] += len(adj[u])
    num = sum(4 * m * e_c[l] - d_c[l] ** 2 for l in d_c)
    q = math.floor(num * 1_000_000.0 / (4.0 * m * m))
    assert row.n_edges == m
    assert row.n_communities == len(d_c)
    assert row.intra_edges == sum(e_c.values())
    assert row.modularity_micro == q
    # Q in [-1/2, 1]; a single-community partition gives Q = 0 exactly
    # (4m*e_c - d_c^2 = 4m^2 - 4m^2), which the dense sf0.001 graph hits
    assert -500_000 <= row.modularity_micro <= 1_000_000
    if row.n_communities == 1:
        assert row.modularity_micro == 0


def test_tost_replay(spark, sf_dir):
    row = QUERIES["stats_tost_equivalence"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    p = pd.read_parquet(f"{sf_dir}/part.parquet")[["p_partkey", "p_type"]]
    df = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    c = np.round(df.l_extendedprice * (1 - df.l_discount) * 100
                 ).astype(np.int64)
    tr = df.p_type.str.startswith("PROMO").to_numpy()
    xt, xc = c[tr].astype(float), c[~tr].astype(float)
    diff = xt.mean() - xc.mean()
    se = math.sqrt(xt.var(ddof=1) / len(xt) + xc.var(ddof=1) / len(xc))
    zl = (diff + 50000.0) / se
    zu = (diff - 50000.0) / se
    assert (row.n_promo, row.n_other) == (len(xt), len(xc))
    assert abs(row.diff_milli_dollars - math.floor(diff * 10)) <= 1
    assert abs(row.z_lower_milli - math.floor(zl * 1000)) <= 1
    assert abs(row.z_upper_milli - math.floor(zu * 1000)) <= 1
    assert row.equivalent == (row.z_lower_milli > 1645
                              and row.z_upper_milli < -1645)
    # TOST is one-directional sanity: z_lower > z_upper always
    assert row.z_lower_milli > row.z_upper_milli


def test_sign_test_replay(spark, sf_dir):
    row = QUERIES["stats_sign_test"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    yr = pd.to_datetime(o.o_orderdate).dt.year
    cents = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    df = pd.DataFrame({"ck": o.o_custkey, "yr": yr, "v": cents})
    piv = (df[df.yr.isin([1996, 1997])]
           .groupby(["ck", "yr"]).v.sum().unstack())
    both = piv.dropna()
    pos = int((both[1997] > both[1996]).sum())
    neg = int((both[1997] < both[1996]).sum())
    ties = int((both[1997] == both[1996]).sum())
    n = pos + neg
    z = (pos - n / 2.0 - math.copysign(0.5, pos - n / 2.0)) \
        / math.sqrt(n / 4.0)
    assert (row.n_pairs, row.n_pos, row.n_neg, row.n_ties) \
        == (len(both), pos, neg, ties)
    assert row.z_milli == math.floor(z * 1000.0)
