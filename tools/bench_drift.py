"""Bench-drift bisection harness (VERDICT r7 #3): re-time the 64
queries common to the driver's BENCH_r06/BENCH_r07 stdout captures
under the EXACT bench.py protocol (same session factory, same warm-up
trio, best-of-2, clearCache between reps), plus two overhead probes
that separate fixed per-query cost from execution:

- ``noop``: materialize a 1-row in-memory DataFrame — the floor cost
  of one timed iteration (scheduler + Arrow + materialize plumbing).
- ``plan_only``: construct (analyze) agg_percentiles' DataFrame
  without executing it — pure Python+Catalyst plan-build time.

Usage: python tools/bench_drift.py [run_label]
Appends one JSON line per invocation to BENCH_DRIFT.jsonl so repeated
runs accumulate evidence.  Run on a quiet box; each run is a fresh
JVM like the driver's.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COMMON_64 = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "join_semi_anti", "agg_rollup", "window_topk_per_group",
    "window_running", "sort_limit", "conditional_agg", "sessionize",
    "window_event_time", "window_sliding", "agg_stats", "agg_percentiles",
    "agg_percentiles_approx", "pivot_returnflag", "string_functions2",
    "session_window_native", "asof_state_at_event",
    "range_join_follow_events", "rollup_two_level",
    "funnel_view_click_purchase", "retention_cohorts", "text_tfidf_search",
    "window_range_frame", "unpivot_measures", "q6_forecast_revenue",
    "q14_promo_effect", "q19_disjunctive_ranges", "q2_min_cost_supplier",
    "q8_market_share", "q9_product_profit", "q11_important_parts",
    "q12_priority_by_status", "q13_customer_distribution",
    "q15_top_supplier", "q16_supplier_counts", "q20_dominant_suppliers",
    "q21_last_shippers", "cdc_snapshot_scan", "cdc_decompose_updates",
    "cdc_latest_state", "cdc_latest_state_agg",
    "cdc_snapshot_changelog_merge", "cdc_json_roundtrip",
    "cdc_msgpack_roundtrip", "cdc_avro_prepare", "cdc_seqno_derivation",
    "snapshot_diff_changelog", "dedup_exact", "dedup_minhash_lsh",
    "dedup_minhash_lsh_star", "dedup_minhash_lsh_incr",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_corpus_summary",
    "dedup_embedding_cosine", "ann_brute_force", "ann_vectorized",
    "ann_ivf", "embedding_stats", "sample_deterministic",
    "sample_stratified", "sample_split",
]


def main() -> int:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import materialize
    from storagetapper_spark.plans.registry import QUERIES
    from storagetapper_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    for _wname in ("q3_shipping_priority", "window_topk_per_group",
                   "dedup_exact"):
        materialize(QUERIES[_wname](spark, sf_dir))
    spark.catalog.clearCache()

    # fixed-overhead probes (best of 5 each)
    one_row = None
    noop = float("inf")
    for _ in range(5):
        t0 = time.time()
        one_row = spark.range(1).selectExpr("id", "id * 2 AS y")
        materialize(one_row)
        noop = min(noop, time.time() - t0)
    plan_only = float("inf")
    for _ in range(5):
        t0 = time.time()
        df = QUERIES["agg_percentiles"](spark, sf_dir)
        df.schema  # force analysis without execution
        plan_only = min(plan_only, time.time() - t0)

    timings: dict[str, float] = {}
    for name in COMMON_64:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            n = materialize(fn(spark, sf_dir))
            best = min(best, time.time() - t0)
            spark.catalog.clearCache()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr)

    payload = {
        "label": label,
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "total_64": round(sum(timings.values()), 3),
        "noop_sec": round(noop, 4),
        "plan_only_sec": round(plan_only, 4),
        "load_1m": os.getloadavg()[0],
        "queries": timings,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_DRIFT.jsonl")
    with open(out, "a") as f:
        f.write(json.dumps(payload) + "\n")
    print(json.dumps({k: payload[k] for k in
                      ("label", "total_64", "noop_sec", "plan_only_sec",
                       "load_1m")}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
