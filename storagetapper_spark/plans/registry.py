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
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    relational7,
    timeseries,
    timeseries2,
)

_ALL: dict[str, tuple[Callable, str | None]] = {}
for mod in (relational, relational2, relational3, relational4, relational5,
            relational6, relational7, timeseries, timeseries2, cdc, cdc2,
            datapipe, extensions):
    for name, pair in mod.QUERIES.items():
        assert name not in _ALL, f"duplicate query name: {name}"
        _ALL[name] = pair

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: fn for name, (fn, _) in _ALL.items()
}

ORACLES: dict[str, str] = {
    name: sql for name, (_, sql) in _ALL.items() if sql is not None
}


def run_query(spark: SparkSession, name: str, sf_dir: str) -> DataFrame:
    return QUERIES[name](spark, sf_dir)
