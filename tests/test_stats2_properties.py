"""Property tests for the round-7 statistical-inference batch 2: each
test statistic is replayed against an independent literal-Python/numpy
computation over the raw parquet (textbook formulas — no shared code
with the Spark plans), plus the structural guarantees the designs
promise (randomization determinism, jackknife bias identity)."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_kruskal_wallis_matches_textbook_replay(spark, sf_dir):
    row = QUERIES["stats_kruskal_wallis"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_returnflag"])
    v = li.l_quantity.astype(np.int64).to_numpy()
    g = li.l_returnflag.to_numpy()
    # textbook: midranks via scipy-style average ranking
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=np.float64)
    sv = v[order]
    i = 0
    pos = 1
    tie_term = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        t = j - i
        ranks[order[i:j]] = pos + (t - 1) / 2.0
        tie_term += t ** 3 - t
        pos += t
        i = j
    n = len(v)
    h = 0.0
    for flag in "ANR":
        m = g == flag
        h += ranks[m].sum() ** 2 / m.sum()
    h = 12.0 / (n * (n + 1)) * h - 3.0 * (n + 1)
    c = 1.0 - tie_term / (n ** 3 - n)
    assert row.tie_term == tie_term
    assert abs(row.h_micro / 1e6 - h) < 1e-4
    assert abs(row.h_tie_adj_micro / 1e6 - h / c) < 1e-4


def test_brown_forsythe_matches_textbook_replay(spark, sf_dir):
    row = QUERIES["stats_levene_brown_forsythe"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    # half-away-from-zero like SQL round(), not numpy's half-even
    cents = np.floor(
        (li.l_extendedprice * (1 - li.l_discount) * 100).to_numpy() + 0.5
    ).astype(np.int64)
    g = li.l_returnflag.to_numpy()
    devs, means, ns = [], [], []
    for flag in "ANR":
        x = np.sort(cents[g == flag])
        n = len(x)
        med2 = x[(n - 1) // 2] + x[n // 2]  # lower + upper middle
        d = np.abs(2 * x - med2)
        devs.append(d)
        means.append(d.mean())
        ns.append(n)
    alld = np.concatenate(devs)
    grand = alld.mean()
    k, n_tot = 3, len(alld)
    ssb = sum(n * (m - grand) ** 2 for n, m in zip(ns, means))
    ssw = sum(((d - m) ** 2).sum() for d, m in zip(devs, means))
    f = (ssb / (k - 1)) / (ssw / (n_tot - k))
    assert row.n_groups == k and row.n_total == n_tot
    assert abs(row.f_micro / 1e6 - f) < 1e-4


def test_jackknife_ratio_matches_textbook_replay(spark, sf_dir):
    row = QUERIES["stats_jackknife_ratio"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    su = pd.read_parquet(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    j = li.merge(su, left_on="l_suppkey", right_on="s_suppkey")
    j["cents"] = np.floor(
        (j.l_extendedprice * (1 - j.l_discount) * 100) + 0.5
    ).astype(np.int64)
    j["q"] = j.l_quantity.astype(np.int64)
    per = j.groupby("s_nationkey").agg(s=("cents", "sum"), q=("q", "sum"))
    S, Q, g = per.s.sum(), per.q.sum(), len(per)
    r_i = (S - per.s) / (Q - per.q)
    var_jack = (g - 1) / g * ((r_i - r_i.mean()) ** 2).sum()
    assert row.n_groups == g
    assert row.ratio_micro == math.floor(S / Q * 1e6)
    assert abs(row.jack_se_micro / 1e6 - math.sqrt(var_jack)) < 1e-4


def test_permutation_test_is_deterministic_and_valid(spark, sf_dir):
    """Two runs give identical counts (md5 determinism), the p-value is
    the add-one-smoothed extreme fraction, and the observed difference
    replays from pandas."""
    a = QUERIES["stats_permutation_test"](spark, sf_dir).collect()[0]
    b = QUERIES["stats_permutation_test"](spark, sf_dir).collect()[0]
    assert a == b
    assert a.p_value_milli == math.floor(
        (a.n_extreme + 1) * 1000 / (a.n_reps + 1))
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    tr = o.o_orderpriority.str.startswith("1-").to_numpy()
    obs = c[tr].mean() - c[~tr].mean()
    assert a.obs_diff_micro == math.floor(obs * 1e6)
    assert 0 <= a.n_extreme <= a.n_reps == 120


def test_welch_anova_matches_textbook_replay(spark, sf_dir):
    row = QUERIES["stats_welch_anova"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = np.floor(o.o_totalprice * 100 + 0.5).astype(np.int64)
    g = o.o_orderpriority
    ns, ms, vs = [], [], []
    for name, grp in c.groupby(g):
        ns.append(len(grp))
        ms.append(grp.mean())
        vs.append(grp.var(ddof=1))
    ns, ms, vs = map(np.asarray, (ns, ms, vs))
    k = len(ns)
    w = ns / vs
    grand = (w * ms).sum() / w.sum()
    num = (w * (ms - grand) ** 2).sum() / (k - 1)
    dsum = ((1 - w / w.sum()) ** 2 / (ns - 1)).sum()
    den = 1 + 2 * (k - 2) / (k ** 2 - 1) * dsum
    f_star = num / den
    dof2 = (k ** 2 - 1) / (3 * dsum)
    assert row.n_groups == k and row.n_total == ns.sum()
    assert abs(row.f_star_micro / 1e6 - f_star) < 1e-4
    assert abs(row.dof2_milli / 1e3 - dof2) < 1e-1


def test_tombstone_gc_partitions_every_latest_delete(spark, sf_dir):
    """Eligible + retained == all latest-op deletes (pandas replay),
    and every GC-eligible day predates every retained day boundary."""
    rows = QUERIES["cdc_tombstone_gc_plan"](spark, sf_dir).collect()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    latest = ev.sort_values("event_id").groupby("user_id").tail(1)
    deletes = latest[latest.event_type == "error"]
    horizon = ev.ts.max()
    eligible = (horizon - deletes.ts).dt.total_seconds() >= 7 * 86400
    assert sum(r.n_tombstones for r in rows) == len(deletes)
    assert sum(r.n_gc_eligible for r in rows) == int(eligible.sum())
    assert all(r.n_tombstones == r.n_gc_eligible + r.n_retained
               for r in rows)


def test_skewness_kurtosis_matches_numpy_replay(spark, sf_dir):
    rows = {r.g: r for r in
            QUERIES["agg_skewness_kurtosis"](spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_returnflag"])
    v = np.floor(li.l_extendedprice + 0.5).astype(np.int64)
    for flag in "ANR":
        x = v[li.l_returnflag == flag].to_numpy().astype(np.float64)
        m2 = ((x - x.mean()) ** 2).mean()
        m3 = ((x - x.mean()) ** 3).mean()
        m4 = ((x - x.mean()) ** 4).mean()
        r = rows[flag]
        assert r.n == len(x)
        assert abs(r.skewness_micro / 1e6 - m3 / m2 ** 1.5) < 1e-4
        assert abs(r.excess_kurtosis_micro / 1e6 - (m4 / m2 ** 2 - 3)) < 1e-4


def test_effect_sizes_match_textbook_replay(spark, sf_dir):
    row = QUERIES["stats_effect_sizes"](spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_quantity", "l_returnflag"])
    li = li[li.l_returnflag.isin(["R", "N"])]
    x = li[li.l_returnflag == "R"].l_quantity.astype(int).to_numpy()
    y = li[li.l_returnflag == "N"].l_quantity.astype(int).to_numpy()
    n1, n0 = len(x), len(y)
    sp = math.sqrt(((n1 - 1) * x.var(ddof=1) + (n0 - 1) * y.var(ddof=1))
                   / (n1 + n0 - 2))
    d = (x.mean() - y.mean()) / sp
    g = d * (1 - 3 / (4 * (n1 + n0) - 9))
    # Cliff's delta by direct tie-halved pair counting (vectorized)
    gt = sum(int((y < xv).sum()) for xv in np.unique(x)
             for _ in range(int((x == xv).sum())))
    ties = sum(int((y == xv).sum()) for xv in np.unique(x)
               for _ in range(int((x == xv).sum())))
    delta = (gt + 0.5 * ties) / (n1 * n0) * 2 - 1
    assert (row.n_r, row.n_n) == (n1, n0)
    assert abs(row.cohens_d_micro / 1e6 - d) < 1e-4
    assert abs(row.hedges_g_micro / 1e6 - g) < 1e-4
    assert abs(row.cliffs_delta_micro / 1e6 - delta) < 1e-4


def test_qq_table_matches_numpy_percentile(spark, sf_dir):
    rows = QUERIES["stats_qq_table"](spark, sf_dir).collect()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_extendedprice", "l_returnflag"])
    v = np.floor(li.l_extendedprice + 0.5).astype(np.int64)
    xr = np.sort(v[li.l_returnflag == "R"].to_numpy())
    xn = np.sort(v[li.l_returnflag == "N"].to_numpy())
    assert len(rows) == 19
    for r in rows:
        p = r.p_pct / 100
        # numpy 'linear' interpolation == percentile_cont
        qr = np.percentile(xr, r.p_pct, method="linear")
        qn = np.percentile(xn, r.p_pct, method="linear")
        assert abs(r.q_r_milli / 1e3 - qr) < 2e-3, (r.p_pct, qr)
        assert abs(r.q_n_milli / 1e3 - qn) < 2e-3, (r.p_pct, qn)
        assert r.gap_milli == r.q_r_milli - r.q_n_milli
