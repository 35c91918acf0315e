"""Literal pandas/numpy replays for the round-9 exact-arithmetic
conversions: every converted aggregate is an exact integer unit sum
(cents, 1e-4 dollars, quantized micro-units) finished by shared double
divisions, so an independent int64 replay must match BITWISE — exact
``==`` on the emitted doubles, no tolerance.  A tolerance here would
defeat the point: the conversions exist precisely so the values are a
pure function of the input multiset, independent of partition order
and engine."""

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def _cents(x) -> np.ndarray:
    return np.round(np.asarray(x, dtype=np.float64) * 100).astype(np.int64)


def test_q3_revenue_replay(spark, sf_dir):
    rows = QUERIES["q3_shipping_priority"](spark, sf_dir).collect()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    c = c[c.c_mktsegment == "BUILDING"]
    o = o[o.o_orderdate < pd.Timestamp("1998-01-01")]
    li = li[li.l_shipdate > pd.Timestamp("1997-01-01")].copy()
    li["units"] = _cents(li.l_extendedprice) * (100 - _cents(li.l_discount))
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey"))
    g = (j.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"])["units"]
          .sum().reset_index())
    g["revenue"] = g.units.astype(np.float64) / 10000.0
    g = g.sort_values(["revenue", "l_orderkey"],
                      ascending=[False, True]).head(10)
    want = list(zip(g.l_orderkey, g.revenue))
    got = [(r.l_orderkey, r.revenue) for r in rows]
    assert got == want  # bitwise: int sums + one shared division


def test_time_weighted_avg_replay(spark, sf_dir):
    rows = QUERIES["time_weighted_avg"](spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    got = {r.user_id: (r.twa_value, r.n_intervals) for r in rows}
    for uid, grp in ev.groupby("user_id"):
        ts_us = grp.ts.astype("datetime64[ns]").astype(np.int64) // 1000
        dt = (ts_us.shift(-1) - ts_us).dropna().astype(np.int64)
        if not len(dt):
            assert uid not in got
            continue
        cents = _cents(grp.value)[: len(dt)]
        units = int((cents.astype(object) * dt.to_numpy()).sum())  # exact
        twa = float(units) / float(int(dt.sum())) / 100.0
        assert got[uid] == (twa, len(dt)), uid


def test_hhi_replay(spark, sf_dir):
    rows = QUERIES["market_concentration_hhi"](spark, sf_dir).collect()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    s = pd.read_parquet(f"{sf_dir}/supplier.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    li = li.assign(cents=_cents(li.l_extendedprice))
    rev = (li.groupby("l_suppkey")["cents"].sum().reset_index()
             .merge(s, left_on="l_suppkey", right_on="s_suppkey")
             .merge(n, left_on="s_nationkey", right_on="n_nationkey"))
    got = {r.n_name: (r.n_suppliers, r.hhi, r.top_share) for r in rows}
    for name, grp in rev.groupby("n_name"):
        q = int((grp.cents.astype(object) ** 2).sum())  # exact bigint²
        ssum = int(grp.cents.sum())
        hhi = float(q) * 10000.0 / float(ssum) / float(ssum)
        top = float(int(grp.cents.max())) / float(ssum)
        assert got[name] == (len(grp), hhi, top), name


def test_gini_replay(spark, sf_dir):
    rows = QUERIES["gini_revenue"](spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    n = pd.read_parquet(f"{sf_dir}/nation.parquet")
    r = pd.read_parquet(f"{sf_dir}/region.parquet")
    o = o.assign(cents=_cents(o.o_totalprice))
    rev = (o.groupby("o_custkey")["cents"].sum().reset_index()
            .merge(c, left_on="o_custkey", right_on="c_custkey")
            .merge(n, left_on="c_nationkey", right_on="n_nationkey")
            .merge(r, left_on="n_regionkey", right_on="r_regionkey"))
    got = {row.r_name: (row.n_customers, row.gini) for row in rows}
    for name, grp in rev.groupby("r_name"):
        grp = grp.sort_values(["cents", "o_custkey"])
        i = np.arange(1, len(grp) + 1, dtype=object)
        iw = int((i * grp.cents.to_numpy().astype(object)).sum())
        s = int(grp.cents.sum())
        nn = len(grp)
        gini = 2.0 * float(iw) / (nn * float(s)) - (nn + 1.0) / nn
        assert got[name] == (nn, gini), name


def test_embedding_stats_replay(spark, sf_dir):
    rows = QUERIES["embedding_stats"](spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    got = {r.label: (r.n_vectors, r.avg_norm) for r in rows}
    for label, grp in emb.groupby("label"):
        units = []
        for v in grp.embedding:
            # index-ordered fold, exactly the plan's aggregate()
            acc = 0.0
            for x in np.asarray(v, dtype=np.float64):
                acc += x * x
            units.append(int(np.round(np.sqrt(acc) * 1e6)))
        avg = float(sum(units)) / len(units) / 1e6
        assert got[label] == (len(units), avg), label


def test_neyman_allocation_replay(spark, sf_dir):
    rows = QUERIES["sample_neyman_allocation"](spark, sf_dir).collect()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j.assign(cents=_cents(j.o_totalprice))
    per = {}
    for seg, grp in j.groupby("c_mktsegment"):
        n_h = len(grp)
        sx = int(grp.cents.sum())
        sxx = int((grp.cents.astype(object) ** 2).sum())
        mean_d = float(sx) / n_h / 100.0
        sigma = np.sqrt(float(sxx) / n_h / 1e4 - mean_d * mean_d)
        # HALF_UP like the engines, not numpy's half-even
        per[seg] = (n_h, int(np.floor(n_h * sigma * 1e6 + 0.5)),
                    float(np.floor(sigma * 100 + 0.5)) / 100.0)
    tw = sum(w for _, w, _ in per.values())
    for r in rows:
        n_h, w_u, sigma = per[r.c_mktsegment]
        alloc = min(n_h, int(np.floor(1000 * float(w_u) / float(tw) + 0.5)))
        assert (r.n_h, r.sigma) == (n_h, sigma)
        # allocation: engine HALF_UP vs numpy round-half-even can part
        # exactly on a .5 draw; allow that single unit
        assert abs(r.n_alloc - alloc) <= 1
        assert r.n_alloc <= r.n_h
