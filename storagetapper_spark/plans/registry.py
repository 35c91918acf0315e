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
    # Round-9 window (VERDICT r8 #1/#2): two re-witnesses first —
    # multimodal_frame_plan (its r8 driver row errored on an array
    # output column, now scalarized to frame_csv) and
    # sample_pack_sequences (its r6 row predates the FFD-certificate
    # oracle that replaced the rows-only check) — then 48 of the 80
    # never-witnessed names in ROADMAP's staged order: the 11
    # remaining pre-round-7 names, then the round-7 registrations
    # oldest-first (registry order).  Computed mechanically:
    # registry minus the union of CORRECTNESS_r01-r08 keys.  The 32
    # r7 names that miss this window close the backlog in round 10.
    # All 80 are local-green at 3 SFs (CHECK_ALL.json /
    # CHECK_ALL_SF0_1.json) and judge-verified at least once (r7+r8).
    "multimodal_frame_plan", "sample_pack_sequences",
    # pre-round-7 backlog (the last 11)
    "sample_negatives_contrastive", "text_span_corruption_plan",
    "text_gopher_rules", "text_feature_hashing_audit",
    "text_padding_waste", "events_bot_detection", "ann_ivf_nprobe_sweep",
    "sample_preference_pairs", "ml_knn_eval_ivf", "sketch_bloom_fp_audit",
    "text_query_expansion_prf",
    # round-7 registrations, oldest-first
    "ts_forecast_backtest_mase", "sample_time_split_folds", "ts_hurst_rs",
    "ts_period_folding", "graph_triangles_degree_oriented",
    "graph_rich_club", "graph_ktruss", "graph_modularity",
    "cdc_tombstone_gc_plan", "events_absorption_funnel",
    "events_dau_wau_stickiness", "ml_learning_curve",
    "multimodal_phash_dct", "multimodal_audio_chunk_plan",
    "agg_mode_exact", "dedup_normalized_exact", "layout_partition_advisor",
    "layout_overlap_depth", "privacy_dp_noise_calibration",
    "stats_kruskal_wallis", "stats_welch_anova",
    "stats_levene_brown_forsythe", "stats_permutation_test",
    "stats_jackknife_ratio", "agg_skewness_kurtosis", "stats_effect_sizes",
    "stats_qq_table", "agg_theil_index", "stats_cmh_test",
    "stats_overdispersion_test", "stats_mcnemar_test", "stats_cochran_q",
    "stats_friedman_test", "stats_runs_test", "ts_ljung_box",
    "ml_eb_shrinkage", "stats_dunn_posthoc",
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
