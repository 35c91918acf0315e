"""Shared helpers for the query registry."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table (the snapshot-scan stand-in — BASELINE.md
    load protocol)."""
    if name == "events":
        return events_t(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def events_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture stores TIMESTAMP(NANOS).  Depending on the Spark
    version this surfaces as a long (with legacy nanosAsLong) or as a
    TIMESTAMP_NTZ truncated to micros; normalize either to a session-TZ
    (UTC) TimestampType so downstream epoch math matches DuckDB."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = df.schema["ts"].dataType.typeName()
    if ts_type in ("long", "bigint"):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))
