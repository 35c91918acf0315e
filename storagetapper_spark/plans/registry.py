"""The query registry: every implemented operator from SURVEY.md §2 as a
(spark_fn, oracle_sql) pair.  Consumed by __spark_entry__.py and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from storagetapper_spark.plans import (
    cdc,
    extensions,
    cdc2,
    cdc3,
    datapipe,
    datapipe2,
    datapipe3,
    datapipe4,
    datapipe5,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    relational9,
    relational10,
    relational11,
    relational12,
    timeseries,
    timeseries2,
    timeseries3,
    timeseries4,
    timeseries5,
    graph2,
    datapipe6,
    datapipe7,
    datapipe8,
    sketches,
    embeddings2,
    textrank,
    cdc4,
    relational13,
    relational14,
    ml,
    profile2,
    multimodal2,
    relational15,
    relational16,
    dedup2,
    layout,
    stats,
    pca,
    drift2,
    mleval,
    datapipe9,
    datapipe10,
    datapipe11,
    privacy,
    stats2,
    stats4,
    survival2,
    ml2,
    timeseries6,
    geo,
    stats3,
    recsys2,
    mleval2,
)

_ALL: dict[str, tuple[Callable, str | None]] = {}
for mod in (relational, relational2, relational3, relational4, relational5,
            relational6, relational7, relational8, relational9, relational10, relational11, relational12,
            timeseries,
            timeseries2, timeseries3, timeseries4, timeseries5, timeseries6, graph2, cdc, cdc4, relational13, relational14, ml, profile2, multimodal2, relational15, relational16, dedup2, layout, stats, pca, drift2, mleval, privacy, stats2, stats3, stats4, survival2, ml2, geo, recsys2, mleval2, cdc2, cdc3, datapipe, datapipe2,
            datapipe3, datapipe4, datapipe5, datapipe6, datapipe7, datapipe8, datapipe9, datapipe10, datapipe11, sketches, embeddings2, textrank, extensions):
    for name, pair in mod.QUERIES.items():
        assert name not in _ALL, f"duplicate query name: {name}"
        _ALL[name] = pair

# The driver's correctness harness checks a 50-query prefix of queries()
# in dict order (CORRECTNESS_r01/r02 each contain exactly the first 50
# entries).  Rounds 1-2 checked the relational surface (44 green rows);
# round 3 rotates the never-checked 47 (the whole cdc_* / dedup / ANN /
# text surface) plus the 3 queries whose oracles were fixed this round
# into the window.  Previously-green queries keep their recorded rows.
_CHECK_FIRST = [
    # Round-8 window: the 50 OLDEST of the 130 queries with no driver
    # CORRECTNESS row after r1-r7 (297/427 witnessed, all green — VERDICT
    # r7 #1).  Staged per ROADMAP's "Round-8 rotation": pre-round-7
    # deferred names only (the *_approx/*_tpr percentile twins whose exact
    # forms are long green, plus the round-6 registrations), in registry
    # order.  Computed mechanically: unwitnessed ∩ the 358-query r6-close
    # FULL_BENCH name set, first 50.  The remaining 11 pre-r7 names and
    # the 69 round-7 registrations ride rounds 9-10.  All 130 are
    # local-green at 3 SFs (CHECK_ALL.json); 37 were independently
    # re-verified by the r7 judge.
    # percentile / robust-stat approx+tpr twins (exact forms green r1-r5)
    "agg_percentiles_tpr", "agg_weighted_median",
    "price_outliers_mad_approx", "cycle_time_percentiles_approx",
    "winsorized_prices_approx", "price_outliers_mad_tpr",
    "cycle_time_percentiles_tpr", "winsorized_prices_tpr",
    # round-6 time-series / graph batch
    "ts_changepoint_mean_shift",
    "graph_jaccard_link_prediction_capped", "graph_minhash_link_prediction",
    "graph_label_propagation", "graph_hits", "graph_clustering_coefficient",
    # round-6 in-engine ML batch
    "ml_kmeans_lloyd", "ml_decision_stump", "ml_linreg_normal",
    "ml_boosted_stumps",
    # round-6 profiling / product-analytics batch
    "profile_equidepth_histogram", "events_transition_entropy",
    "multimodal_frame_plan", "multimodal_storage_report",
    "multimodal_ahash_neardup", "customer_gap_anomaly",
    "revenue_yoy_growth", "events_value_summary",
    "interval_union_coverage", "profile_tukey_fences",
    "dedup_cosine_threshold_sweep", "dedup_cross_source_matrix",
    "basket_size_histogram",
    # round-6 FDR / conformal / model-eval batch
    "stats_fdr_bh", "stats_holm_bonferroni", "ml_conformal_split",
    "ml_pr_auc", "ml_lift_gains", "ml_threshold_sweep_f1",
    # round-6 privacy / linkage batch
    "privacy_k_anonymity", "privacy_l_diversity", "linkage_fellegi_sunter",
    "privacy_t_closeness", "privacy_k_anonymity_generalization",
    # round-6 profiling / recsys / sampling / ANN batch
    "profile_histograms", "recsys_item_item_cosine", "events_hourly_heatmap",
    "sample_reservoir_stratified", "embedding_pq_assign", "ann_ivf_pq_search",
    "asof_nearest_rate", "text_ccnet_buckets",
]
assert len(_CHECK_FIRST) == 50, len(_CHECK_FIRST)
assert all(n in _ALL for n in _CHECK_FIRST), "unknown name in _CHECK_FIRST"
_ORDERED = _CHECK_FIRST + [n for n in _ALL if n not in _CHECK_FIRST]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _ALL[name][0] for name in _ORDERED
}

ORACLES: dict[str, str] = {
    name: sql for name, (_, sql) in _ALL.items() if sql is not None
}


def run_query(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    return QUERIES[name](spark, sf_dir)
