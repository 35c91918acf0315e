"""Property tests for the Nelson-Aalen / log-rank batch: estimator
identities against the already-proven Kaplan-Meier rollup, plus a
literal-Python log-rank replay."""

import math

from storagetapper_spark.plans.registry import QUERIES


def test_nelson_aalen_dominates_and_tracks_km(spark, sf_dir):
    """Classical identities: H(t) = Σd/n ≥ −ln S_KM(t) = −Σln(1−d/n)
    never (both accumulate the same (d, n) pairs; −ln(1−x) ≥ x), the
    hazard is nondecreasing, and at-risk counts match KM's exactly."""
    na = {r.duration: r for r in
          QUERIES["survival_nelson_aalen"](spark, sf_dir).collect()}
    km = {r.duration: r for r in
          QUERIES["survival_km"](spark, sf_dir).collect()}
    assert set(na) == set(km)
    prev = -1
    for t in sorted(na):
        assert na[t].n_at_risk == km[t].n_at_risk
        assert na[t].n_events == km[t].n_events
        assert na[t].cumhaz_micro >= prev
        prev = na[t].cumhaz_micro
        if km[t].survival > 0:
            # H(t) <= -ln(S(t)) with slack for the micro/1e-6 rounding
            assert (na[t].cumhaz_micro / 1e6
                    <= -math.log(km[t].survival) + 1e-4)


def test_logrank_replays_in_pure_python(spark, sf_dir):
    row = QUERIES["survival_logrank"](spark, sf_dir).collect()[0]
    # rebuild (duration, event, cohort) items from the NA/KM session
    # definition via a literal pandas sessionization
    import numpy as np
    import pandas as pd
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev.ts.astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "us", "event_id"])
    gap = ev.groupby("user_id").us.diff() / 1e6
    ev["new_sess"] = ((gap.isna()) | (gap > 1800)).astype(int)
    ev["sid"] = ev.groupby("user_id").new_sess.cumsum()
    sess = ev.groupby(["user_id", "sid"]).us.agg(["min", "max"])
    horizon = ev.us.max()
    dur = ((sess["max"] - sess["min"]) // 60000000).astype(int)
    event = (horizon - sess["max"] >= 1800 * 1000000).astype(int)
    cohort = sess.index.get_level_values(0) % 2
    items = pd.DataFrame({"t": dur.values, "e": event.values,
                          "g": cohort.values})
    o1 = e1 = v = 0.0
    n_times = 0
    for t in sorted(items.t.unique()):
        at = items[items.t >= t]
        d = int(at[at.t == t].e.sum())
        if d == 0:
            continue
        n_times += 1
        n = len(at)
        n1 = int((at.g == 1).sum())
        d1 = int(at[(at.t == t) & (at.g == 1)].e.sum())
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * ((n - n1) / n) * (n - d) / (n - 1)
    assert row.n_event_times == n_times
    assert row.observed_1 == o1
    assert abs(row.expected_1_micro / 1e6 - e1) < 1e-4
    assert abs(row.variance_micro / 1e6 - v) < 1e-4
    chi2 = (o1 - e1) ** 2 / v
    assert abs(row.chi2_micro / 1e6 - chi2) < 1e-3
