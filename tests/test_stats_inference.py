"""Semantic invariants of the statistical-inference batch (plans/stats.py).
The DuckDB oracle checks cross-engine value equality; these check the
statistics are the RIGHT VALUES against independent pandas/numpy
recomputations on the raw fixture, plus boundary sanity."""

import math

import numpy as np
import pandas as pd
import pytest

from storagetapper_spark.plans import stats as S
from storagetapper_spark.plans.registry import QUERIES


@pytest.fixture(scope="module")
def lineitem_pdf(sf_dir):
    return pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                           columns=["l_returnflag", "l_extendedprice",
                                    "l_quantity"])


def test_ks_matches_pandas(spark, sf_dir, lineitem_pdf):
    out = QUERIES["stats_ks_two_sample"](spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    pdf = lineitem_pdf
    a = np.sort((pdf.loc[pdf.l_returnflag == "R", "l_extendedprice"]
                 * 100).round().astype("int64").values)
    b = np.sort((pdf.loc[pdf.l_returnflag == "N", "l_extendedprice"]
                 * 100).round().astype("int64").values)
    assert r.n_r == len(a) and r.n_n == len(b)
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, grid, side="right") / len(a)
    fb = np.searchsorted(b, grid, side="right") / len(b)
    d = np.abs(fa - fb).max()
    assert r.ks_d_micro == math.floor(d * 1_000_000)
    assert 0 <= r.ks_d_micro <= 1_000_000


def test_mann_whitney_matches_pandas(spark, sf_dir, lineitem_pdf):
    out = QUERIES["stats_mann_whitney"](spark, sf_dir).collect()
    r = out[0]
    pdf = lineitem_pdf[lineitem_pdf.l_returnflag.isin(["R", "N"])]
    v = pdf.l_quantity.astype("int64")
    ranks = v.rank(method="average")  # midranks, ties averaged
    r_sum = ranks[pdf.l_returnflag == "R"].sum()
    n_r = int((pdf.l_returnflag == "R").sum())
    n_n = len(pdf) - n_r
    u_x2 = int(round(2 * r_sum)) - n_r * (n_r + 1)
    assert (r.n_r, r.n_n, r.u_r_x2) == (n_r, n_n, u_x2)
    # tie term: sum over distinct values of t^3 - t
    t_counts = v.value_counts().values.astype("int64")
    assert r.tie_term == int((t_counts ** 3 - t_counts).sum())
    # z from the same integers
    n = n_r + n_n
    var = n_r * n_n / 12.0 * ((n + 1.0)
                              - r.tie_term / (n * (n - 1.0)))
    z = ((u_x2 - n_r * n_n) / 2.0) / math.sqrt(var)
    assert r.z_micro == math.floor(z * 1_000_000)


def test_chi_square_matches_pandas(spark, sf_dir):
    out = QUERIES["stats_chi_square"](spark, sf_dir).collect()
    r = out[0]
    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderpriority", "o_orderstatus"])
    ct = pd.crosstab(pdf.o_orderpriority, pdf.o_orderstatus)
    n = int(ct.values.sum())
    assert r.n_orders == n
    assert r.dof == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    # per-cell floored micros, then exact integer sum (the query's
    # order-independence contract)
    total = 0
    rows = ct.sum(axis=1).values
    cols = ct.sum(axis=0).values
    for i in range(ct.shape[0]):
        for j in range(ct.shape[1]):
            o = float(ct.values[i][j])
            if o == 0.0:
                continue  # query only has observed cells
            num = o * n - float(rows[i]) * float(cols[j])
            total += math.floor(1e6 * num * num
                                / (float(rows[i]) * float(cols[j]) * n))
    assert r.chi2_micro == total
    assert 0 <= r.cramers_v_micro <= 1_000_000


def test_sprt_decisions_cross_boundary(spark, sf_dir):
    out = QUERIES["stats_sprt_ab"](spark, sf_dir).collect()
    assert {r.arm for r in out} == {0, 1}
    for r in out:
        assert r.decision in ("accept_h0", "accept_h1", "continue")
        if r.decision == "continue":
            assert r.n_at_decision is None
            continue
        assert 1 <= r.n_at_decision <= r.n_trials
        s = r.s_at_decision
        f = r.n_at_decision - s
        llr = s * S._LA + f * S._LB
        if r.decision == "accept_h1":
            assert llr >= S._HI
        else:
            assert llr <= S._LO
        # one step earlier the walk had NOT crossed on this side
        prev_hi = (s - 1) * S._LA + f * S._LB   # last step was a success
        prev_lo = s * S._LA + (f - 1) * S._LB   # last step was a failure
        assert min(prev_hi, prev_lo) < S._HI


def test_bootstrap_ci_brackets_point_estimate(spark, sf_dir):
    out = QUERIES["stats_bootstrap_ci"](spark, sf_dir).collect()
    r = out[0]
    assert r.n_reps == 64
    assert r.ci_lo_millicents <= r.mean_millicents <= r.ci_hi_millicents
    # CI width is a few sd/sqrt(n), not degenerate and not huge
    width = r.ci_hi_millicents - r.ci_lo_millicents
    assert 0 < width < r.mean_millicents  # far narrower than the mean
    pdf = pd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_totalprice"])
    cents = (pdf.o_totalprice * 100).round().astype("int64")
    assert r.n_orders == len(cents)
    assert r.mean_millicents == math.floor(float(cents.mean()) * 1000)
    # width within an order of magnitude of the CLT prediction
    clt = 2 * 1.96 * cents.std() / math.sqrt(len(cents)) * 1000
    assert width < 4 * clt and width > clt / 4


def test_poisson_grid_thresholds_are_round_of_cdf():
    cum, p = 0.0, math.exp(-1.0)
    for k, thr in enumerate(S._POIS_T15):
        cum += p
        p /= (k + 1)
        assert thr == round(cum * 32768)


def test_kendall_tau_matches_definition(spark, sf_dir, lineitem_pdf):
    """Definitional O(grid²) recomputation: concordant/discordant from
    every ordered cell pair of the (quantity × discount) contingency."""
    pdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_quantity", "l_discount"])
    q = pdf.l_quantity.astype("int64")
    d = (pdf.l_discount * 100).round().astype("int64")
    cells = pd.DataFrame({"q": q, "d": d}).groupby(["q", "d"]).size()
    items = list(cells.items())
    conc = disc = 0
    for (qa, da), na in items:
        for (qb, db), nb in items:
            if qa < qb and da < db:
                conc += na * nb
            elif qa < qb and da > db:
                disc += na * nb
    n = int(cells.sum())
    tq2 = int(sum(v * (v - 1) for v in cells.groupby("q").sum()))
    td2 = int(sum(v * (v - 1) for v in cells.groupby("d").sum()))
    out = QUERIES["stats_kendall_tau"](spark, sf_dir).collect()[0]
    assert (out.n_items, out.concordant, out.discordant) == (n, conc, disc)
    tau = (2.0 * (conc - disc)
           / math.sqrt(float(n * (n - 1) - tq2)
                       * float(n * (n - 1) - td2)))
    assert out.tau_b_micro == math.floor(tau * 1_000_000)
    assert -1_000_000 <= out.tau_b_micro <= 1_000_000


def test_spearman_matches_pandas_midrank_pearson(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                          columns=["l_quantity", "l_discount"])
    rx = pdf.l_quantity.astype("int64").rank(method="average")
    ry = (pdf.l_discount * 100).round().astype("int64") \
        .rank(method="average")
    rho = np.corrcoef(rx.values, ry.values)[0, 1]
    out = QUERIES["stats_spearman_rho"](spark, sf_dir).collect()[0]
    assert out.n_items == len(pdf)
    # floor-micro of an independently computed double: allow 1 ulp of
    # slack at the micro boundary (different summation orders)
    assert abs(out.rho_micro - math.floor(rho * 1_000_000)) <= 1


def test_diff_in_diff_matches_pandas(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_shipdate",
                                  "l_extendedprice", "l_discount"])
    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    li = li[li.l_shipdate.dt.year.isin([1995, 1996])]
    li = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    li["treated"] = li.p_type.str.startswith("PROMO")
    li["post"] = li.l_shipdate.dt.year == 1996
    # HALF_UP like Spark's round(), not numpy's half-to-even
    li["c"] = np.floor(li.l_extendedprice * (1 - li.l_discount) * 100
                       + 0.5).astype("int64")

    def m(tr, po):
        g = li[(li.treated == tr) & (li.post == po)]
        return g.c.sum() / len(g), len(g)

    tpre, n_tp = m(True, False)
    tpost, n_tq = m(True, True)
    cpre, n_cp = m(False, False)
    cpost, n_cq = m(False, True)
    out = QUERIES["stats_diff_in_diff"](spark, sf_dir).collect()[0]
    assert (out.n_t_pre, out.n_t_post, out.n_c_pre, out.n_c_post) \
        == (n_tp, n_tq, n_cp, n_cq)
    did = (tpost - tpre) - (cpost - cpre)
    assert abs(out.did_millicents - math.floor(did * 1000)) <= 1
    # the 2x2 identity: DiD reconstructs from the four reported means
    # (up to the 4 independent floor-millicent quantizations)
    recon = ((out.t_post_millicents - out.t_pre_millicents)
             - (out.c_post_millicents - out.c_pre_millicents))
    assert abs(recon - out.did_millicents) <= 4


def test_cuped_reduces_variance_and_preserves_effect(spark, sf_dir):
    out = {r.arm: r for r in
           QUERIES["stats_cuped_adjustment"](spark, sf_dir).collect()}
    assert set(out) == {0, 1}
    r0, r1 = out[0], out[1]
    # both arms share theta and the pooled variance-reduction share
    assert r0.theta_micro == r1.theta_micro
    assert r0.var_red_micro == r1.var_red_micro
    assert 0 <= r0.var_red_micro <= 1_000_000
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type", "value"])
    ev = ev[ev.event_type.isin(["view", "purchase", "click"])]
    mid = pd.Timestamp("2024-01-16")
    cents = (ev.value * 100).round().astype("int64")
    pre = cents.where(ev.ts < mid, 0)
    post = cents.where(ev.ts >= mid, 0)
    pu = pd.DataFrame({"u": ev.user_id, "x": pre, "y": post}) \
        .groupby("u").sum()
    pu["arm"] = pu.index % 2
    x, y = pu.x.astype("float64"), pu.y.astype("float64")
    theta = (((x * y).sum() - x.sum() * y.sum() / len(pu))
             / ((x * x).sum() - x.sum() ** 2 / len(pu)))
    assert abs(r0.theta_micro - math.floor(theta * 1e6)) <= 1
    for arm in (0, 1):
        g = pu[pu.arm == arm]
        raw = g.y.sum() / len(g)
        adj = raw - theta * (g.x.sum() / len(g) - x.mean())
        assert abs(out[arm].raw_millicents
                   - math.floor(raw * 1000)) <= 1
        assert abs(out[arm].cuped_millicents
                   - math.floor(adj * 1000)) <= 1


def test_power_sample_size_formula(spark, sf_dir):
    out = QUERIES["stats_power_sample_size"](spark, sf_dir).collect()
    assert [r.lift_bp for r in out] == [100, 200, 500]
    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    ev = ev[ev.event_type.isin(["view", "purchase"])]
    s = int((ev.event_type == "purchase").sum())
    n = len(ev)
    z = S._Z_A2 + S._Z_B
    for r in out:
        p1 = s / n
        p2 = p1 + r.lift_bp / 10000.0
        req = math.ceil(z * z * (p1 * (1 - p1) + p2 * (1 - p2))
                        / (r.lift_bp / 10000.0) ** 2)
        assert r.n_required_per_arm == req
        assert r.baseline_micro == math.floor(p1 * 1e6)
        assert r.powered == (r.n_current_min_arm >= req)
    # bigger lifts need fewer samples
    reqs = [r.n_required_per_arm for r in out]
    assert reqs == sorted(reqs, reverse=True)


def test_welch_ttest_matches_pandas(spark, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])
    part = pd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    li = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    c = np.floor(li.l_extendedprice * (1 - li.l_discount) * 100
                 + 0.5).astype("int64")
    tr = li.p_type.str.startswith("PROMO").values
    a, b = c[tr].astype("float64"), c[~tr].astype("float64")
    v1, v0 = a.var(ddof=1), b.var(ddof=1)
    se1, se0 = v1 / len(a), v0 / len(b)
    tstat = (a.mean() - b.mean()) / math.sqrt(se1 + se0)
    dof = (se1 + se0) ** 2 / (se1 ** 2 / (len(a) - 1)
                              + se0 ** 2 / (len(b) - 1))
    r = QUERIES["stats_welch_ttest"](spark, sf_dir).collect()[0]
    assert (r.n_promo, r.n_other) == (len(a), len(b))
    assert abs(r.t_micro - math.floor(tstat * 1e6)) <= 1
    assert abs(r.dof_milli - math.floor(dof * 1e3)) <= 1


def test_auc_matches_numpy_rank_formula(spark, sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    score = np.floor(np.stack(pdf.embedding.values)[:, 0]
                     .astype("float64") * 1e6).astype("int64")
    pos = (pdf.label.values == 1)
    ranks = pd.Series(score).rank(method="average").values
    r1 = ranks[pos].sum()
    n1, n0 = int(pos.sum()), int((~pos).sum())
    auc = (r1 - n1 * (n1 + 1) / 2) / (n1 * n0)
    r = QUERIES["ml_auc_roc"](spark, sf_dir).collect()[0]
    assert (r.n_pos, r.n_neg) == (n1, n0)
    assert r.auc_micro == math.floor(auc * 1e6)
    assert 0 <= r.auc_micro <= 1_000_000


def test_sprt_walk_partitions_are_calendar_bounded(spark, sf_dir):
    """VERDICT r5 #5: the SPRT per-trial walk must never put a whole
    arm's trial history in one window partition.  Plan contract: every
    Window is partitioned; an arm-ONLY partition spec (1 expression) is
    allowed solely above an Aggregate (the per-day offset / candidate
    tables — calendar-bounded rows per arm); windows over raw trials
    must carry the (arm, day) two-column spec, bounding partition state
    at one day's volume."""
    from tests.test_plan_shapes import _walk_physical

    root = (QUERIES["stats_sprt_ab"](spark, sf_dir)
            ._jdf.queryExecution().executedPlan())
    saw_day_keyed = False
    for node in _walk_physical(root):
        if node.getClass().getSimpleName() != "WindowExec":
            continue
        spec = node.partitionSpec()
        assert not spec.isEmpty(), f"unpartitioned SPRT window:\n{node}"
        if spec.size() >= 2:
            saw_day_keyed = True
            continue
        has_agg_below = any(
            "Aggregate" in d.getClass().getSimpleName()
            for d in _walk_physical(node.children().apply(0)))
        assert has_agg_below, (
            "arm-only window over raw trials (unbounded partition):\n"
            f"{node}")
    assert saw_day_keyed, "expected an (arm, day)-partitioned trial walk"
