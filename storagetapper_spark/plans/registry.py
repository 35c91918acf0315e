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
    # Round-11 window (ROADMAP "Round-11 rotation", VERDICT r10 #9):
    # the unwitnessed backlog is 0 after CORRECTNESS_r10, so this is a
    # PURE RE-WITNESS window — zero new registrations this round.  The
    # 13 CDC names whose last driver witness is round 3 (the stalest
    # rows in the ledger) come first, then the oldest round-2
    # relational rows in registry order fill the remaining 37 slots.
    # All 50 are green in this round's full local gates (CHECK_ALL at
    # sf0.01 + sf0.1).
    "cdc_latest_state_agg", "cdc_json_roundtrip", "cdc_row_key",
    "cdc_sql_encoder", "cdc_sql_encoder_idempotent",
    "cdc_dedup_retransmit", "cdc_type_coercion", "cdc_avro_roundtrip",
    "cdc_seqno_derivation", "cdc_msgpack_roundtrip", "cdc_avro_prepare",
    "cdc_consistent_cut", "cdc_scd2_history",
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "join_semi_anti", "join_outer", "agg_rollup", "agg_cube",
    "window_topk_per_group", "window_running", "sort_limit", "set_ops",
    "scalar_functions", "json_extract", "agg_distinct_having",
    "in_subquery", "window_event_time", "agg_stats", "agg_percentiles",
    "pivot_returnflag", "date_functions", "string_functions2",
    "null_semantics", "exists_correlated", "scalar_subquery_cross",
    "array_functions", "grouping_sets", "posexplode_words",
    "string_agg_ordered", "argmin_argmax", "bool_aggregates",
    "regexp_counting", "schema_conform", "session_window_native",
    "union_by_name_missing", "map_functions", "array_hof",
    "q7_volume_shipping",
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
