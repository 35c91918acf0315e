"""Scale probe: run headline operators at sf0.1 AND a 10x-amplified
copy (6M-row lineitem, 50k docs, 10k embeddings) and report the runtime
ratio.  Linear-ish ratios (~10x data -> <=~10x time) are the local
evidence that the plan shapes — banded LSH self-joins, map-side partial
aggs, broadcast ANN, WindowGroupLimit merges — hold under scale-up, the
question a 100 TB deployment asks.

The 10x tables are synthesized by unioning the sf0.1 fixture 10 times
with shifted keys (and perturbed text so dedup can't collapse the
copies into one cluster per doc).  Writes only under /tmp.

Usage: python tools/scale_probe.py [base_sf_dir] [out_dir]
Prints one JSON line: {"probe": {...}} and writes SCALE_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 10 by default (sf0.1 base → 6M-row lineitem); the r6 verdict's x100
# confirmation runs use SCALE_PROBE_COPIES=100 with an sf0.01 base so
# the claimed sublinearity is observed where it actually bends.
COPIES = int(os.environ.get("SCALE_PROBE_COPIES", "10"))
PROBES = [
    "q1_pricing_summary",      # hash agg over the fact table
    "q3_shipping_priority",    # 3-way join + agg + top-k
    "cdc_latest_state",        # the signature merge (WindowGroupLimit)
    "cdc_snapshot_changelog_merge",
    "dedup_exact",
    "dedup_minhash_lsh",       # banded self-join
    "dedup_minhash_lsh_star",  # star-capped: must beat plain LSH at 10x
    "dedup_minhash_lsh_incr",  # per-batch ingest shape
    "dedup_simhash",
    "ann_brute_force",         # broadcast query set
    "text_quality",            # narrow projections
    "sessionize",              # window over users
    # round-4 additions
    "q9_product_profit",       # widest dim join in the TPC-H suite
    "q21_last_shippers",       # semi+anti non-equi self-joins
    "contamination_check",     # explode + broadcast semi-probe
    "quality_gate",            # composite single-scan filter
    "ann_srp",                 # bucketed LSH serving path
    # warehouse-maintenance + chunking batch
    "cdc_scd2_history",        # full-version PK window (no group-limit)
    "cdc_incremental_agg",     # delta fold (window + final group-by)
    "text_chunk_fixed",        # narrow generator fan-out
    # batch 10
    "fuzzy_match_parts",       # blocked levenshtein self-join
    "text_lm_score",           # explode -> sparse matrix -> broadcast model
    "graph_pagerank_copurchase",  # 5-round iterative edge-list push
    "market_basket_rules",     # basket self-join + broadcast item counts
    "graph_ppr_brand",         # weighted personalized restart
    "peak_concurrency",        # two-pass sweep-line (bucketed cumsum)
    "survival_km",             # per-session rollup -> duration table
    "forecast_holt",           # per-series applyInPandas recursion
    # round-4 additions
    "window_distribution",     # two-pass rank over price buckets
    "rfm_segments",            # fused 3-metric two-pass quintiles
    "dedup_semantic",          # centroid cells -> blocked GEMM -> CC
    "text_dup_ngram_fraction",  # gram-keyed docfreq join
    "cdc_debezium_normalize",  # to_json/from_json envelope round-trip
    # round-5 corpus-analysis batch
    "text_repeated_passages",  # gram-keyed count + left join back
    "dedup_lsh_verified",      # candidate-bounded exact re-score
    "corpus_budget_cut",       # histogram cut; window only on winners
    "sample_shuffle_shard",    # md5 permutation + hash-range shards
    # round-5 second-half batch
    "join_bloom_pruned",       # scan-side bitmap prune before the join
    "asof_state_tolerance",    # union-window asof + staleness mask
    "tokenizer_bpe_merge_step",  # doc-windows islands merge + recount
    "tokenizer_bpe_train",     # 3 iterated generations (checkpointed)
    "sample_importance_weights",  # explode + 64-bucket ratio broadcast
    "text_pii_redact",         # pure regexp chain (narrow baseline)
    # round-5 third-session batch
    "ts_similarity_search",    # per-series windows + broadcast query
    "ts_discord_detection",    # within-series self-join (Σ len²)
    "sample_weighted_aes",     # per-row E-S keys + global top-k
    "corpus_source_report",    # scan + source-keyed distinct count
    "curation_funnel",         # one-scan stage flags + hash agg
    # round-5 fourth-session batch
    "ts_autocorrelation",      # lag-exploded within-series self-join
    "graph_jaccard_link_prediction",  # distance-2 wedge join
    "graph_jaccard_link_prediction_capped",  # top-K-per-center bounded wedges
    "graph_minhash_link_prediction",  # banded signature join (dedup machinery)
    "sample_reservoir_stratified",  # map-side bottom-k per stratum
    # round-9 exact-arithmetic reshapes (window-free HHI, decimal Gini
    # rank sums, quantized Neyman strata)
    "market_concentration_hhi",
    "gini_revenue",
    "sample_neyman_allocation",
    "ml_kmeans_lloyd",         # literal-centroid narrow pass + K*64 agg
    "stats_fdr_bh",            # brand moments + 25-row BH walk
    "embedding_pq_assign",     # literal-codebook narrow pass + 32-key agg
    "graph_label_propagation",  # 3 frontier joins, eager generations
    "ann_ivf_pq_search",       # probed-cell ADC lookup join
    "graph_kcore",             # iterative peel (eager generations)
    "recsys_item_item_cosine",  # basket-bounded pair fan-out
    "text_ngram_novelty",      # per-doc-distinct grams + min_by reduce
    "text_js_divergence",      # vocab-sized pair equi-join
    "sketch_theta_intersection",  # KMV: k rows per partition merge
    "sketch_cms_heavy_hitters",  # fixed 1024-cell matrix build
    # round-5 fifth-session batch
    "stats_ks_two_sample",     # value-grid cumulative window
    "stats_bootstrap_ci",      # 16-replicate-per-hash explode
    "stats_sprt_ab",           # per-arm ordered cumulative walk
    "layout_compaction_plan",  # manifest-sized cumsum binning
    "interval_union_coverage",  # per-customer gaps-and-islands
    "graph_ra_link_prediction",  # wedge join + per-center micro weights
    "embedding_pca_power_iteration",  # 3 integer-quantized matvec rounds
    "embedding_scatter_matrix",  # per-batch int64 GEMM partials
    "ts_rolling_robust_anomaly",  # offset-explode frame join (grid-sized)
    "stats_kendall_tau",       # 2-D prefix sums on the value grid
    "stats_cuped_adjustment",  # per-user moments + broadcast scalars
    "layout_zorder_pruning",   # two-pass rank over the Morton order
    "layout_bucketed_join",    # bucketed write + zero-exchange SMJ
    "drift_ks_by_feature",     # 3-feature value-grid KS
    "embedding_drift_mmd_linear",  # per-dim micro-moment diff
    "text_query_expansion_prf",  # BM25 top-k + R-set posting join
    # round-6 privacy/conformal/multimodal batch
    "privacy_k_anonymity",     # one QI hash shuffle
    "privacy_l_diversity",     # QI join + distinct-sensitive agg
    "linkage_fellegi_sunter",  # nation x $500-band blocked pair join
    "ml_conformal_split",      # two-pass-rank order statistic
    "text_ccnet_buckets",      # per-lang two-pass rank thirds
    "multimodal_ahash_neardup",  # 64-pixel explode + band join
    "graph_hits",              # 4 half-step joins, eager generations
    "ml_linreg_normal",        # nine-sum map-side reduce
    "sample_negatives_contrastive",  # broadcast pool cross + anti-join
    "text_span_corruption_plan",  # pure narrow generator
    "privacy_t_closeness",     # QI agg + 1-row broadcast EMD
    "text_gopher_rules",       # one-scan integer rule flags
    "sketch_bloom_fp_audit",   # bit-position explode + broadcast bits
    "ts_changepoint_mean_shift",  # calendar-grid prefix argmax
    "ml_pr_auc",               # score-grid trapezoid
    "ml_lift_gains",           # score-grid decile probes
    "graph_clustering_coefficient",  # oriented wedge + corner stack
    "text_feature_hashing_audit",  # vocab-bounded bucket agg
    "text_padding_waste",      # one-scan integer planner
    "ml_boosted_stumps",       # two grid-argmax boosting rounds
    "agg_weighted_median",     # weighted cumulative value grid
    "events_bot_detection",    # per-user gap window + 4-row rollup
    "ann_ivf_nprobe_sweep",    # one scoring pass serves 4 cutoffs
    "privacy_k_anonymity_generalization",  # 4-width lattice sweep
    "ml_threshold_sweep_f1",   # score-grid argmax
    "sample_preference_pairs",  # bounded-group min/max_by pairs
    "ml_knn_eval_ivf",         # IVF-path kNN label eval
    "graph_triangles_degree_oriented",  # compact-forward wedge bound
    # round-7 stats/survival/ml-features/ts/geo batch
    "stats_kruskal_wallis",    # 50-value quantity-grid rank sums
    "stats_levene_brown_forsythe",  # per-group median grid + dev agg
    "stats_permutation_test",  # 120-replicate md5 explode
    "stats_jackknife_ratio",   # 25 delete-one-group pseudo-values
    "survival_nelson_aalen",   # duration-grid hazard prefix sums
    "survival_logrank",        # two-cohort duration-grid sums
    "ml_ridge_normal",         # nine-sum map-side reduce + solve
    "ml_target_encoding_loo",  # brand-keyed counts, category output
    "ml_woe_iv",               # brand-keyed event/non-event counts
    "ts_forecast_backtest_mase",  # complete-calendar lag errors
    "geo_grid_neighbors",      # 3x3-cell blocked radius join
    "geo_dbscan_core",         # grid join + degree/border passes
    "multimodal_phash_dct",    # separable DCT + band LSH
    "stats_welch_anova",       # 5-group exact moments + solve
    "cdc_tombstone_gc_plan",   # latest-op WindowGroupLimit + day rollup
    "ml_mutual_info_screen",   # 3-feature count grids + ln terms
    "agg_skewness_kurtosis",   # DECIMAL power sums, 3-row solve
    "stats_effect_sizes",      # quantity-grid midranks + moments
    "stats_qq_table",          # integer ventile interpolation
    "recsys_als_user_step",    # per-user 2x2 closed-form ridge
    "agg_theil_index",         # per-customer entropy terms + rollup
    "contamination_screen_audit",  # 1/8 hash-sampled containment screen
    "ml_auc_delong_ci",        # score-grid structural moments
    "stats_cmh_test",          # 25-strata 2x2 cell counts
    "graph_rich_club",         # edge+degree conditional counts
    "sample_time_split_folds",  # daily-grid fold boundaries
    "ml_brier_decomposition",  # 10-bin exact moment table
    # round-7 continuation: paired/blocked stats + pipeline audits
    "stats_mcnemar_test",      # per-subject 2x2 indicator reduce
    "stats_cochran_q",         # 3-treatment indicator reduce
    "stats_friedman_test",     # within-block 3x3 self-join ranks
    "stats_runs_test",         # calendar-grid sign-change lag
    "ts_ljung_box",            # series-keyed (i-k) lag join
    "ml_eb_shrinkage",         # part-keyed counts + 1-row prior
    "embedding_quantization_error",  # 64-dim explode + broadcast scales
    "ml_cohen_kappa",          # 3x3 confusion reduce
    "dedup_normalized_exact",  # two content-hash groupBys, one scan
    "sample_epoch_allocation",  # 5-lang token totals + broadcast budget
    "graph_ktruss",            # 2 oriented-triangle peel rounds
    "stats_dunn_posthoc",      # 50-value grid rank sums, 3-pair stack
    "stats_bartlett_test",     # 3-group DECIMAL moment reduce
    "ts_hurst_rs",             # calendar grid x4 scales, block windows
    "stats_anderson_darling",  # 50-value grid midpoint AD terms
    "ann_mips_vs_cosine",      # broadcast query dots, dual rankings
    "events_absorption_funnel",  # 8 quantized chain generations
    "ml_survival_concordance",  # session rollup + 31x64 lattice suffixes
    "ts_period_folding",       # calendar-grid fold, 14-group aggs
    "agg_mode_exact",          # (group, value) agg + group-keyed rank
    "ml_learning_curve",       # one cents-grid window, 4 nested subsets
    "layout_partition_advisor",  # 3 partition-value aggs + stack
    "privacy_dp_noise_calibration",  # per-user counts + literal eps grid
    "multimodal_audio_chunk_plan",  # per-item sequence() chunk fan-out
    "graph_modularity",        # LPA generations + 2 label joins
    "stats_tost_equivalence",  # 6-integer two-group moment reduce
    "stats_sign_test",         # (cust, year) agg + 4-integer reduce
    "stats_wilcoxon_signed_rank",  # |diff| grid midrank identity
    "ml_group_auc",            # cohort-partitioned score-grid ranks
    "events_dau_wau_stickiness",  # two-level distinct rollup
    "stats_wilson_ci",         # 5-segment conditional counts
    "ml_pinball_loss",         # daily grid + 3-quantile explode
    "ann_filtered_search",     # broadcast dots, pre/post-filter ranks
    "stats_capture_recapture",  # two hash bits, 4-integer reduce
    "ml_mcnemar_model_comparison",  # broadcast dim join, 4-int reduce
    "stats_fdr_by",            # shared brand-z table + 25-row walk
    "ml_threshold_cost_curve",  # score-grid cumulative cost argmin
    "layout_overlap_depth",    # chunk zones + layout-keyed sweep line
    "agg_trimmed_mean_exact",  # cents-grid boundary-term trim
    "ml_reliability_slope",    # 10-bin exact moment regression
    "stats_overdispersion_test",  # complete-calendar count moments
    # round-10 freeze-lift batch (datapipe12)
    "text_winnowing_fingerprints",  # doc-partitioned window min
    "dedup_winnowing_pairs",   # capped fingerprint-bucket self-join
    "tokenizer_fertility_by_lang",  # one-scan regex counts, 5 groups
    "text_encoding_quality",   # one-scan regex flags, 20 groups
    "sample_pps_systematic",   # two-phase exact prefix sum
    "sample_dsir_importance",  # 4096-bucket ratio broadcast join
    "stats_g_test",            # tiny-cell contingency reduce
    "ts_holt_winters_additive",  # calendar-bounded per-entity recursion
    "events_watermark_planner",  # two-phase global running max
    "ml_isotonic_calibration",   # 100-bin grid + bounded PAVA
    "recsys_coverage_diversity",  # blocked pairs + k^2 intra-list join
    "tokenizer_unigram_viterbi",  # vocab top-k + word-bounded integer DP
    "graph_louvain_move_round",  # edge-keyed gain joins + struct argmax
]


def _amplify(spark, base: str, out: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    done_marker = os.path.join(out, "_AMPLIFIED")
    if os.path.exists(done_marker):
        return
    small = ["region", "nation", "customer", "supplier", "part"]
    for t in small:
        spark.read.parquet(f"{base}/{t}.parquet") \
             .write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    # orders amplify as a FACT: o_orderkey shifts in lockstep with
    # lineitem's l_orderkey (joins stay aligned per copy); o_custkey is
    # NOT shifted — customers stay dimension-sized and simply own 10x
    # the orders, the realistic fact/dim growth asymmetry.
    od = spark.read.parquet(f"{base}/orders.parquet")
    ods = [od.withColumn("o_orderkey",
                         F.col("o_orderkey") + F.lit(i * 100_000_000))
           for i in range(COPIES)]
    out_od = ods[0]
    for p in ods[1:]:
        out_od = out_od.unionByName(p)
    out_od.write.mode("overwrite").parquet(f"{out}/orders.parquet")

    li = spark.read.parquet(f"{base}/lineitem.parquet")
    parts = [li.withColumn("l_orderkey",
                           F.col("l_orderkey") + F.lit(i * 100_000_000))
             for i in range(COPIES)]
    out_li = parts[0]
    for p in parts[1:]:
        out_li = out_li.unionByName(p)
    out_li.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    # events: shift event_id + user_id so sessionize/windows see 10x keys
    from storagetapper_spark.plans.common import events_t
    ev = events_t(spark, base)
    evs = [ev.withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000))
             .withColumn("user_id", F.col("user_id") + F.lit(i * 1_000_000))
           for i in range(COPIES)]
    out_ev = evs[0]
    for p in evs[1:]:
        out_ev = out_ev.unionByName(p)
    out_ev.write.mode("overwrite").parquet(f"{out}/events.parquet")

    # documents: shift ids, append a distinct token per copy so copies are
    # NEAR-duplicates (realistic dedup load), not byte-identical
    docs = spark.read.parquet(f"{base}/documents.parquet")
    ds = [docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
              .withColumn("text", F.concat(F.col("text"), F.lit(f" copytag{i}")))
          for i in range(COPIES)]
    out_docs = ds[0]
    for p in ds[1:]:
        out_docs = out_docs.unionByName(p)
    out_docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{base}/embeddings.parquet")
    es = [emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000_000))
          for i in range(COPIES)]
    out_emb = es[0]
    for p in es[1:]:
        out_emb = out_emb.unionByName(p)
    out_emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    open(done_marker, "w").write("ok")


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale10"
    only = set(sys.argv[3:])  # probe a subset, merge into the artifact

    import bench
    from storagetapper_spark.plans.registry import QUERIES
    from storagetapper_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    _amplify(spark, base, out)

    art = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_PROBE.json")
    probe = {}
    if only and os.path.exists(art):
        with open(art) as f:
            probe = json.load(f).get("probe", {})
    for name in PROBES:
        if only and name not in only:
            continue
        fn = QUERIES[name]
        xl = f"x{COPIES}"
        times = {}
        for label, sf_dir in (("base", base), (xl, out)):
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                bench.materialize(fn(spark, sf_dir))
                best = min(best, time.time() - t0)
                spark.catalog.clearCache()
            times[label] = round(best, 3)
        ratio = round(times[xl] / max(times["base"], 1e-9), 2)
        rkey = "ratio" if COPIES == 10 else f"ratio_{xl}"
        # merge so an x100 confirmation run keeps the x10 entry (and
        # records its own base, which may be a different SF)
        probe[name] = {**probe.get(name, {}), **{
            ("base" if COPIES == 10 else f"base_{xl}"): times["base"],
            xl: times[xl], rkey: ratio}}
        print(f"# {name}: base={times['base']}s {xl}={times[xl]}s "
              f"ratio={ratio}", file=sys.stderr)

    # top-level "copies" describes the default x10 sweep; xN confirmation
    # runs are self-describing via their per-entry base_xN/xN/ratio_xN keys
    result = {"copies": 10 if COPIES != 10 else COPIES, "probe": probe}
    with open(art, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
