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
    timeseries7,
    graph2,
    graph3,
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
    datapipe12,
    datapipe13,
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
            timeseries2, timeseries3, timeseries4, timeseries5, timeseries6, timeseries7, graph2, graph3, cdc, cdc4, relational13, relational14, ml, profile2, multimodal2, relational15, relational16, dedup2, layout, stats, pca, drift2, mleval, privacy, stats2, stats3, stats4, survival2, ml2, geo, recsys2, mleval2, cdc2, cdc3, datapipe, datapipe2,
            datapipe3, datapipe4, datapipe5, datapipe6, datapipe7, datapipe8, datapipe9, datapipe10, datapipe11, datapipe12, datapipe13, sketches, embeddings2, textrank, extensions):
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
    # Round-10 window (VERDICT r9 #1): ALL 45 never-witnessed names —
    # the 32 computed mechanically as registry minus the union of
    # CORRECTNESS_r01-r09 keys (matches ROADMAP's round-10 rotation
    # list exactly) PLUS the 13 queries registered in round 10 itself
    # (a new registration must be witnessed by the window that ships
    # it, VERDICT r9 #2) — followed by 5 re-witness slots.  All 45 are
    # green in the full local gates (CHECK_ALL sf0.01 + sf0.1 + the
    # full local[3] sweep).  Once CORRECTNESS_r10 lands, every
    # registry query has at least one driver witness and the
    # unwitnessed backlog is 0.
    "stats_bartlett_test", "stats_anderson_darling",
    "stats_tost_equivalence", "stats_sign_test",
    "stats_wilcoxon_signed_rank", "stats_wilson_ci",
    "stats_capture_recapture", "stats_fdr_by", "agg_trimmed_mean_exact",
    "survival_nelson_aalen", "survival_logrank", "ml_survival_concordance",
    "ml_ridge_normal", "ml_target_encoding_loo", "ml_woe_iv",
    "ml_mutual_info_screen", "geo_grid_neighbors", "geo_dbscan_core",
    "recsys_als_user_step", "ml_auc_delong_ci", "ml_brier_decomposition",
    "ml_cohen_kappa", "ml_group_auc", "ml_pinball_loss",
    "ml_mcnemar_model_comparison", "ml_threshold_cost_curve",
    "ml_reliability_slope", "contamination_screen_audit",
    "sample_epoch_allocation", "embedding_quantization_error",
    "ann_mips_vs_cosine", "ann_filtered_search",
    # The 13 round-10 registrations (datapipe12 curation batch,
    # batch 13/14, holt-winters, unigram viterbi, louvain round) —
    # never driver-witnessed, so they take window slots ahead of any
    # re-witness.
    "dedup_winnowing_pairs", "events_watermark_planner",
    "graph_louvain_move_round", "ml_isotonic_calibration",
    "recsys_coverage_diversity", "sample_dsir_importance",
    "sample_pps_systematic", "stats_g_test", "text_encoding_quality",
    "text_winnowing_fingerprints", "tokenizer_fertility_by_lang",
    "tokenizer_unigram_viterbi", "ts_holt_winters_additive",
    # 5 re-witness slots (VERDICT r9 #1: "oldest r1-r3 CDC rows are
    # now 6+ rounds stale — prefer those"): the first CDC-family names
    # whose latest driver witness is round 3, registry order, plus the
    # entry() flagship cdc_snapshot_changelog_merge.
    "cdc_snapshot_scan", "cdc_snapshot_filtered",
    "cdc_decompose_updates", "cdc_latest_state",
    "cdc_snapshot_changelog_merge",
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
