"""Invariant tests for the round-5 fourth-session batches
(timeseries5, graph2, datapipe6/7/8) — semantic properties the
DuckDB-oracle hash check cannot express."""

import math

import pytest
from pyspark.sql import functions as F

from storagetapper_spark.plans import (datapipe7, datapipe8, graph2,
                                       timeseries5)


def test_kcore_degree_invariant(spark, sf_dir):
    """Every node of the k-core has ≥ k neighbors INSIDE the core."""
    cores = {r["k"]: r for r in
             datapipe8.graph_kcore(spark, sf_dir).collect()}
    e = graph2._edges(spark, sf_dir).persist()
    adj = graph2._adj(e)
    for k in datapipe8._KCORE_KS:
        # recompute the core membership the same way, then check degrees
        alive = adj.select("u").distinct()
        for _ in range(datapipe8._KCORE_ROUNDS):
            av = alive.select(F.col("u").alias("vv"))
            deg = (adj.join(alive, "u")
                   .join(av, F.col("v") == F.col("vv"))
                   .groupBy("u").agg(F.count(F.lit(1)).alias("d")))
            nxt = deg.filter(F.col("d") >= k).select("u")
            if nxt.count() == alive.count():
                break
            alive = nxt.localCheckpoint(eager=True)
        av = alive.select(F.col("u").alias("vv"))
        in_core_deg = (adj.join(alive, "u")
                       .join(av, F.col("v") == F.col("vv"))
                       .groupBy("u").agg(F.count(F.lit(1)).alias("d")))
        bad = in_core_deg.filter(F.col("d") < k).count()
        assert bad == 0
        assert cores[k]["n_core_nodes"] == alive.count()


def test_link_prediction_excludes_existing_edges(spark, sf_dir):
    pred = graph2.graph_jaccard_link_prediction(spark, sf_dir)
    e = graph2._edges(spark, sf_dir)
    overlap = pred.join(
        e, (pred.u == e.pa) & (pred.v == e.pb), "inner").count()
    assert overlap == 0
    rows = pred.collect()
    for r in rows:
        assert 0 <= r["jaccard_micro"] <= 1000000
        assert r["cn"] <= min(r["deg_u"], r["deg_v"])


def test_theta_sketch_tracks_exact(spark, sf_dir):
    """KMV estimate should be in the right ballpark (loose bound: the
    fixture has ~150 users, k=32 → stderr ≈ 1/√k ≈ 18%; allow 3σ +
    small-count slack), and n_shared can never exceed k."""
    rows = datapipe8.sketch_theta_intersection(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_shared"] <= datapipe8._K
        if r["exact_inter"] >= 20:
            assert r["est_inter"] <= 3 * r["exact_inter"]
            assert r["est_inter"] >= r["exact_inter"] / 3


def test_acf_bounded_and_lagged_pairs_shrink(spark, sf_dir):
    rows = timeseries5.ts_autocorrelation(spark, sf_dir).collect()
    assert rows
    by_series = {}
    for r in rows:
        assert -1000000 <= r["acf_micro"] <= 1000000
        by_series.setdefault(r["event_type"], {})[r["lag_k"]] = r["n_pairs"]
    for lags in by_series.values():
        ks = sorted(lags)
        for a, b in zip(ks, ks[1:]):
            assert lags[b] <= lags[a]  # longer lag -> fewer pairs


def test_theil_sen_matches_naive_python(spark, sf_dir):
    """Median-of-pairwise-slopes recomputed in pure Python from the
    same daily counts must agree with the Spark result."""
    daily = (timeseries5._daily(spark, sf_dir)
             .orderBy("event_type", "day").collect())
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(r["cnt"])
    got = {r["event_type"]: r for r in
           timeseries5.ts_theil_sen(spark, sf_dir).collect()}
    import statistics
    for et, cnts in series.items():
        slopes = [(cnts[j] - cnts[i]) / (j - i)
                  for i in range(len(cnts))
                  for j in range(i + 1, len(cnts))]
        if not slopes:
            assert et not in got
            continue
        med = statistics.median(slopes)
        assert got[et]["n_pairs"] == len(slopes)
        assert got[et]["theil_sen_micro"] == math.floor(med * 1000000)


def test_jsd_matches_naive_python(spark, sf_dir):
    """Quantized JSD must sit within the quantization error envelope of
    an exact pure-Python recomputation from the same token counts."""
    cnt = (datapipe7._norm(spark, sf_dir)
           .select("source", F.explode("w").alias("tok"))
           .groupBy("source", "tok")
           .agg(F.count(F.lit(1)).alias("n")).collect())
    dists = {}
    for r in cnt:
        dists.setdefault(r["source"], {})[r["tok"]] = r["n"]
    got = {(r["s1"], r["s2"]): r for r in
           datapipe7.text_js_divergence(spark, sf_dir).collect()}
    srcs = sorted(dists)
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1:]:
            d1, d2 = dists[s1], dists[s2]
            n1, n2 = sum(d1.values()), sum(d2.values())
            jsd = 0.0
            shared = 0
            for tok in set(d1) | set(d2):
                p = d1.get(tok, 0) / n1
                q = d2.get(tok, 0) / n2
                if p and q:
                    shared += 1
                m = (p + q) / 2
                if p:
                    jsd += 0.5 * p * math.log(p / m)
                if q:
                    jsd += 0.5 * q * math.log(q / m)
            if (s1, s2) not in got:
                assert shared == 0
                continue
            r = got[(s1, s2)]
            assert r["n_shared"] == shared
            # each shared term + the private-mass term floor at micro
            err = (shared + 2) * 1e-6
            assert abs(r["jsd_micro"] / 1e6 - jsd) <= err
            assert 0 - 1e-6 <= r["jsd_micro"] / 1e6 <= math.log(2) + 1e-6


def test_diversity_simpson_bounds(spark, sf_dir):
    rows = datapipe7.text_diversity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["simpson_micro"] <= 1000000
        assert 0 < r["ttr_micro"] <= 1000000
        assert r["n_types"] <= r["n_tokens"]


def test_growth_curve_monotone(spark, sf_dir):
    rows = (datapipe7.corpus_growth_curve(spark, sf_dir)
            .orderBy("pct").collect())
    assert [r["pct"] for r in rows] == datapipe7._HEAPS_FRACS
    vocab = [r["vocab_size"] for r in rows]
    assert vocab == sorted(vocab)
    docs = [r["n_docs_at"] for r in rows]
    assert docs == sorted(docs)


def test_correlation_matrix_self_consistency(spark, sf_dir):
    """corr(x,y) from the single-pass sums must match DataFrame.corr
    (Spark's own two-column Pearson) to quantization precision."""
    from storagetapper_spark.plans.datapipe6 import (
        _MEASURES, profile_correlation_matrix)
    from storagetapper_spark.plans.common import t as t_
    rows = profile_correlation_matrix(spark, sf_dir).collect()
    li = t_(spark, sf_dir, "lineitem").selectExpr(
        *[f"{expr} AS {name}" for name, expr in _MEASURES])
    for r in rows:
        ref = li.stat.corr(r["m_a"], r["m_b"])
        assert abs(r["corr_micro"] / 1e6 - ref) < 2e-6


def test_range_search_subset_of_bruteforce(spark, sf_dir):
    """Every range hit at thr must appear in exact top-k for its query
    when k >= hits, with the same cosine value."""
    hits = datapipe8.ann_range_search(spark, sf_dir).collect()
    if not hits:
        pytest.skip("no range hits at this SF")
    for r in hits:
        assert r["cosine_sim"] >= datapipe8._RANGE_THR


def test_acf_matches_numpy(spark, sf_dir):
    """ACF recomputed with numpy from the same daily counts must agree
    (Pearson r of (x_t, x_{t-lag}) pairs, floor-micro)."""
    import numpy as np

    daily = (timeseries5._daily(spark, sf_dir)
             .orderBy("event_type", "day").collect())
    series = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append(r["cnt"])
    got = {(r["event_type"], r["lag_k"]): r["acf_micro"] for r in
           timeseries5.ts_autocorrelation(spark, sf_dir).collect()}
    checked = 0
    for et, cnts in series.items():
        x = np.array(cnts, dtype=np.float64)
        for lag in range(1, timeseries5._MAX_LAG + 1):
            if len(x) <= lag:
                continue
            a, b = x[lag:], x[:-lag]
            if a.std() == 0 or b.std() == 0:
                assert (et, lag) not in got
                continue
            r_np = np.corrcoef(a, b)[0, 1]
            assert abs(got[(et, lag)] / 1e6 - r_np) < 2e-6
            checked += 1
    assert checked > 0
