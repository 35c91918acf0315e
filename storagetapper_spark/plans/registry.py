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
    timeseries,
    timeseries2,
    timeseries3,
)

_ALL: dict[str, tuple[Callable, str | None]] = {}
for mod in (relational, relational2, relational3, relational4, relational5,
            relational6, relational7, relational8, relational9, relational10,
            timeseries,
            timeseries2, timeseries3, cdc, cdc2, cdc3, datapipe, datapipe2,
            datapipe3, extensions):
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
    # Round-4 window: 50 of the 97 queries that had no driver CORRECTNESS
    # row after r1-r3 (computed mechanically per ROADMAP.md).  Priority:
    # the LLM-pipeline headliners (VERDICT.md r3 item #1) plus the three
    # scale-weak windows rewritten this round (peak_concurrency,
    # window_distribution, rfm_segments) so the fixes get driver-verified.
    # The remaining 47 rotate into round 5.
    # TPC-H stragglers
    "q14_promo_effect", "q17_small_quantity", "q19_disjunctive_ranges",
    "q22_global_sales_opportunity",
    # analytics headliners
    "attribution_linear", "survival_km", "graph_pagerank_copurchase",
    "graph_triangles", "graph_ppr_brand",
    # scale-weak windows fixed this round — fixes must hash-match
    "peak_concurrency", "window_distribution", "rfm_segments",
    # dedup family
    "dedup_exact", "dedup_embedding_cosine", "dedup_minhash_signature",
    "dedup_ngram_jaccard", "dedup_ngram_containment", "dedup_survivorship",
    "dedup_simhash", "dedup_savings",
    # ANN / embeddings
    "ann_brute_force", "ann_vectorized", "ann_ivf", "ann_quantized_recall",
    "embedding_stats", "embedding_kmeans_assign", "embedding_class_separation",
    # text analysis
    "text_lang_id", "text_quality", "text_tokens", "text_fingerprint",
    "text_pii_flags", "text_repetition", "text_lm_score",
    "text_lang_confusion", "text_length_lognormal", "text_chunk_fixed",
    "text_chunk_tokens", "vocab_coverage",
    # sampling / dataset assembly
    "sample_reservoir_per_group", "sample_neyman_allocation",
    "sample_deterministic", "sample_split", "sample_mixture",
    # pipeline composites + UDx + skew
    "multimodal_manifest", "training_data_pipeline", "udtf_shingles",
    "udaf_geomean", "agg_salted_skew", "entity_resolution_parts",
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
