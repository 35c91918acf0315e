"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (snapshot↔changelog merge, the engine's
                 signature construct) at sf0.001.
queries()      — one entry per implemented operator from SURVEY.md §2.
oracle_sql()   — DuckDB-equivalent SQL per query (omitted only for
                 genuinely non-SQL-expressible ops, e.g. xxhash64 simhash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from storagetapper_spark.plans.registry import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: snapshot + changelog merge with max-seqno-wins and
    delete handling (reference O1/E5 semantics) on sf0.001."""
    return QUERIES["cdc_snapshot_changelog_merge"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
