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
    datapipe,
    datapipe2,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    relational8,
    timeseries,
    timeseries2,
)

_ALL: dict[str, tuple[Callable, str | None]] = {}
for mod in (relational, relational2, relational3, relational4, relational5,
            relational6, relational7, relational8, timeseries, timeseries2,
            cdc, cdc2, datapipe, datapipe2, extensions):
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
    "cdc_snapshot_scan", "cdc_snapshot_filtered", "cdc_decompose_updates",
    "cdc_latest_state", "cdc_snapshot_changelog_merge", "cdc_json_roundtrip",
    "cdc_row_key", "cdc_sql_encoder", "cdc_sql_encoder_idempotent",
    "cdc_dedup_retransmit", "cdc_type_coercion", "cdc_avro_roundtrip",
    "cdc_seqno_derivation", "cdc_msgpack_roundtrip", "cdc_avro_prepare",
    "dedup_exact", "dedup_embedding_cosine", "dedup_clusters",
    "dedup_minhash_signature", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "ann_brute_force", "ann_vectorized", "ann_ivf",
    "embedding_stats", "text_lang_id", "text_quality", "text_tokens",
    "text_fingerprint", "text_lang_confusion", "text_pii_flags",
    "text_repetition", "udtf_shingles", "udaf_geomean",
    "sample_deterministic", "agg_decimal_exact", "training_data_pipeline",
    "asof_state_at_event", "range_join_follow_events", "rollup_two_level",
    "funnel_view_click_purchase", "retention_cohorts",
    "q14_promo_effect", "q17_small_quantity", "q22_global_sales_opportunity",
    "q19_disjunctive_ranges",
    # oracle fixes this round — need fresh rows
    "conditional_agg", "sessionize", "approx_distinct",
]
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
