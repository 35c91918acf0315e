"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Each query is executed with a count()-style materialization (collect for
small results) and wall-clock timed after a warm-up of the input scans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # relational layer
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "join_semi_anti", "agg_rollup", "window_topk_per_group",
    "window_running", "sort_limit", "conditional_agg", "sessionize",
    "window_event_time", "window_sliding", "agg_stats", "agg_percentiles",
    "agg_percentiles_approx",
    "pivot_returnflag", "string_functions2", "session_window_native",
    "asof_state_at_event", "range_join_follow_events", "rollup_two_level",
    "funnel_view_click_purchase", "retention_cohorts", "text_tfidf_search",
    "window_range_frame", "unpivot_measures", "q6_forecast_revenue",
    "q14_promo_effect", "q19_disjunctive_ranges",
    "q2_min_cost_supplier", "q8_market_share", "q9_product_profit",
    "q11_important_parts", "q12_priority_by_status",
    "q13_customer_distribution", "q15_top_supplier", "q16_supplier_counts",
    "q20_dominant_suppliers", "q21_last_shippers",
    # CDC surface
    "cdc_snapshot_scan", "cdc_decompose_updates", "cdc_latest_state",
    "cdc_latest_state_agg", "cdc_snapshot_changelog_merge", "cdc_json_roundtrip",
    "cdc_msgpack_roundtrip", "cdc_avro_prepare", "cdc_seqno_derivation",
    "snapshot_diff_changelog",
    # training-data ops
    "dedup_exact", "dedup_minhash_lsh", "dedup_minhash_lsh_star", "dedup_minhash_lsh_incr", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_corpus_summary", "dedup_embedding_cosine",
    "ann_brute_force",
    "ann_vectorized", "ann_ivf", "embedding_stats",
    "sample_deterministic", "sample_stratified", "sample_split", "sample_mixture",
    "text_lang_id", "text_quality", "text_tokens", "text_fingerprint",
    "text_pii_flags", "text_repetition", "text_ngram_freq",
    # round-4 additions
    "gapfill_daily_locf", "event_transitions", "window_distribution",
    "agg_regression", "contamination_check", "quality_gate",
    "ann_srp", "dedup_embedding_srp", "sketch_hll_union",
    "sample_reservoir_per_group", "time_weighted_avg",
    "anomaly_daily_counts", "profile_documents", "cdc_consistent_cut",
    "multimodal_manifest", "agg_salted_skew", "session_paths", "cdc_seqno_gaps", "integrity_audit", "cdc_scd2_bitemporal", "cdc_table_checksum", "feed_freshness", "ewma_daily_counts", "drift_psi",
    "dedup_ngram_containment", "dedup_survivorship",
    # warehouse-maintenance + chunking batch
    "cdc_scd2_history", "cdc_incremental_agg", "cdc_column_audit",
    "cdc_time_travel", "text_chunk_fixed", "text_chunk_tokens",
    # batch 10: fuzzy matching + distribution analytics
    "fuzzy_match_parts", "embedding_kmeans_assign", "gini_revenue",
    "benford_digits", "overlapping_orders", "price_outliers_mad",
    "ab_test_conversion", "text_lm_score", "graph_pagerank_copurchase",
    "market_basket_rules", "anomaly_cusum", "entity_resolution_parts",
    "seasonality_weekday", "ann_quantized_recall", "hybrid_search_rrf",
    "rolling_distinct_users",
    # Round-10 curation (VERDICT r9 #4): the 313-name sweep blew the
    # 480s soft budget at position ~180, leaving a COLD single-shot
    # tail whose readings produced r8/r9's phantom 2-4x regressions.
    # The curated list is now the 120-name priority head plus one-to-
    # three representatives of every remaining query family (171 names,
    # sum-of-bests ~132s at sf0.1 => best-of-2 wall ~290s quiet /
    # ~365s contended — inside the budget either way, so the whole
    # sweep stays best-of-2 and single_shot_from stays null).  Every
    # registry query still gets a per-round sf0.1 timing via
    # `bench.py --full` -> FULL_BENCH.json at round close.
    "pareto_frontier_parts", "activity_streaks", "conversion_latency",
    "vocab_coverage", "peak_concurrency", "forecast_holt", "survival_km",
    "attribution_linear", "rfm_segments", "cohort_ltv", "wow_movers",
    "abc_classification", "cycle_time_percentiles", "audience_overlap",
    "winsorized_prices", "slo_burn_rate", "single_source_parts",
    "repeat_purchase_intervals", "discount_effectiveness",
    "tokenizer_bpe_train", "corpus_budget_cut", "curation_funnel",
    "lang_confusion", "dq_expectations", "ts_stl_seasonal", "ts_theil_sen",
    "events_pattern_match", "events_user_lifecycle",
    "recsys_item_item_cosine", "sessionization_gap_sensitivity",
    "customer_segment_migration", "orders_shipping_sla", "supplier_scorecard",
    "fiscal_quarter_rollup", "priority_mix_shift", "ml_logistic_gd",
    "ml_auc_roc", "ml_classification_metrics", "revenue_yoy_growth",
    "basket_size_histogram", "layout_zone_map_pruning",
    "layout_bucketed_join", "stats_chi_square", "stats_mann_whitney",
    "interval_union_coverage", "privacy_k_anonymity",
    "linkage_fellegi_sunter", "stats_welch_ttest", "ml_ndcg_at_k",
    "sample_kfold_group_assign", "multimodal_frame_plan",
    # round-10 freeze-lift flagships (sum-of-bests ~13s; the rest of
    # the batch rides FULL_BENCH)
    "text_winnowing_fingerprints", "dedup_winnowing_pairs",
    "sample_pps_systematic", "ts_holt_winters_additive",
    "events_watermark_planner", "tokenizer_unigram_viterbi",
    "ml_isotonic_calibration",
]


def materialize(df) -> int:
    """Force FULL computation of every output column JVM-side.

    A bare ``count()`` lets Catalyst prune unreferenced expressions —
    windows, to_json/from_json, regex columns all get optimized away and
    the "benchmark" measures just the scan.  Hashing every column into
    an aggregate keeps the result tiny (1 row to the driver) while
    making every expression load-bearing."""
    from pyspark.sql import functions as F

    row = (df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("_h"))
             .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(_h)"))
             .collect()[0])
    return row.n


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from storagetapper_spark.plans.registry import QUERIES
    from storagetapper_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + file listing once so per-query numbers measure the
    # query, not session startup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    # codegen/JIT warm-up: run a join+agg+window+shuffle mix UNTIMED so
    # the first timed queries don't absorb whole-stage-codegen and JIT
    # compilation (r4: q3_shipping_priority at sweep position #2 showed
    # a 2.3x phantom regression on an unchanged, verified-correct plan;
    # best-of-2 doesn't fully wash out the first queries' cold JVM)
    for _wname in ("q3_shipping_priority", "window_topk_per_group",
                   "dedup_exact"):
        materialize(QUERIES[_wname](spark, sf_dir))
    spark.catalog.clearCache()

    # best-of-N (default 2): a single cold run folds one-time codegen
    # compilation and box-level contention noise into every number (r2
    # recorded a 7.4x phantom regression on unchanged code); the min of
    # two runs measures the steady-state plan, which is what a long-lived
    # 100 TB job actually executes
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    # soft wall-clock budget: if the sweep runs long (loaded box), drop
    # to single-shot for the remaining queries rather than risk a
    # harness timeout.  r10 (VERDICT r9 #4): raised 480 -> 900 so the
    # curated best-of-2 sweep covers the WHOLE list on this box (the r9
    # driver sweep itself ran well past 480s wall and completed, so the
    # harness ceiling is comfortably above this; a cold single-shot
    # tail is where every past phantom 2-4x "regression" came from).
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "900"))
    sweep_start = time.time()
    timings: dict[str, float] = {}
    # --full: sweep EVERY registry query (no silent caps — VERDICT r5
    # #6); the committed FULL_BENCH.json gives each registry query at
    # least one recorded sf0.1 timing.  The default sweep stays the
    # curated BENCH_QUERIES priority list so the driver's per-round
    # budget holds.
    full = "--full" in sys.argv
    names = list(QUERIES) if full else BENCH_QUERIES
    # Record where (if anywhere) the soft budget forced single-shot
    # timing: tail queries past the budget run COLD (no best-of-2), so
    # their numbers can read 2-4x high on a loaded box — round-8 found
    # a 462s curated sweep whose "movers" all sat past this point and
    # vanished on a budget-raised re-run (BENCH_NOTES.md).  The
    # artifact now says so instead of leaving the tail silently cold.
    single_shot_from: str | None = None
    for name in names:
        fn = QUERIES[name]
        eff_reps = reps if time.time() - sweep_start < budget else 1
        if eff_reps == 1 and reps > 1 and single_shot_from is None:
            single_shot_from = name
        best, n = float("inf"), 0
        for _ in range(max(1, eff_reps)):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = materialize(df)
            best = min(best, time.time() - t0)
            # drop per-query persisted intermediates so reps don't
            # accumulate cache across the 50+ query sweep
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    # BASELINE.md bench protocol: rows/s for the snapshot→encode→sink
    # path (gzip text files, _DONE manifest) — the reference's hot path.
    import shutil
    import tempfile

    from storagetapper_spark.jobs import run_snapshot_job
    from storagetapper_spark.state import Registry, TableRegistration

    tmp = tempfile.mkdtemp(prefix="bench_snap_")
    try:
        reg_store = Registry(os.path.join(tmp, "reg.json"))
        reg = reg_store.register(TableRegistration(
            service="bench", cluster="c", db="tpch", table="lineitem",
            pk_cols=["l_orderkey", "l_linenumber"]))
        src = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        # best-of-N like the query sweep: the measured path is encode+
        # write throughput, not first-run codegen/FS warmup
        # one extra rep vs the query sweep: the encode path's codegen +
        # gzip JIT warms over ~3 runs (measured 76k → 265k rows/s across
        # 4 consecutive runs); a long-lived snapshot job runs at the
        # steady-state rate, which is what best-of should capture
        snap_sec, manifest = float("inf"), None
        for r in range(max(2, reps + 1)):
            out_dir = os.path.join(tmp, f"out{r}")
            t0 = time.time()
            manifest = run_snapshot_job(spark, reg_store, reg, src, out_dir)
            snap_sec = min(snap_sec, time.time() - t0)
        snap_rows_per_sec = round(manifest["total_records"] / snap_sec)
        print(f"# snapshot_encode_sink: {round(snap_sec, 3)}s "
              f"({manifest['total_records']} rows, {snap_rows_per_sec} rows/s)",
              file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "snapshot_rows_per_sec": snap_rows_per_sec,
        "single_shot_from": single_shot_from,
    }
    # Full per-query result on disk: the driver's stdout capture keeps
    # only the LAST 2000 chars, so a 148-query JSON line gets its head
    # truncated and fails to parse (BENCH_r03.json `parsed: null`).
    artifact = "FULL_BENCH.json" if full else "BENCH_LOCAL.json"
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           artifact), "w") as f:
        json.dump(payload, f, indent=1)
    # stdout: same shape, but the queries map is budgeted (in
    # BENCH_QUERIES priority order) so the whole line fits the capture.
    shown: dict[str, float] = {}
    out = dict(payload, queries=shown, queries_total=len(timings),
               full="BENCH_LOCAL.json")
    for name, sec in timings.items():
        shown[name] = round(sec, 2)
        if len(json.dumps(out, separators=(",", ":"))) > 1800:
            del shown[name]
            break
    print(json.dumps(out, separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
