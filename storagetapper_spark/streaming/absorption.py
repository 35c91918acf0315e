"""Streaming funnel-absorption monitor: conversion probabilities over
a live event feed.

The absorbing-chain recursion (plans/relational14.absorption_from_counts)
is a pure function of the (src, dst) TRANSITION COUNT table, and
counts are LINEAR — so the live state is the fold of per-batch
transition-count deltas, the same exactly-once discipline as
streaming/agreement.py (``_batch=<id>`` dynamic-partition overwrite;
replays replace their own delta).  Per batch the write is
|types|^2 <= 25 rows regardless of batch size.

Caveat the module makes explicit: transitions are derived per batch
with a user-keyed lead(), so a user whose consecutive events straddle
a batch boundary contributes no cross-batch transition — the
conflation trade every count-based sessionizer makes (the batch query
sees those pairs; the stream==batch test therefore feeds batches
split on user_id, where the two agree bit-exactly)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.relational14 import absorption_from_counts


def batch_transitions(rows: DataFrame) -> DataFrame:
    """One batch's (src, dst, n) transition-count delta."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (rows.select(F.col("event_type").alias("src"),
                         F.lead("event_type").over(w).alias("dst"))
             .filter(F.col("dst").isNotNull()))
    return pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))


def ingest_batch(spark: SparkSession, batch: DataFrame, batch_id: int,
                 state_dir: str) -> None:
    """Write this batch's transition delta (idempotent per batch id)."""
    (batch_transitions(batch).withColumn("_batch", F.lit(batch_id))
     .write.mode("overwrite").partitionBy("_batch")
     .option("partitionOverwriteMode", "dynamic")
     .parquet(state_dir))


def current_transitions(spark: SparkSession, state_dir: str) -> DataFrame:
    """The folded (src, dst, n) table over all ingested batches."""
    return (spark.read.parquet(state_dir)
            .groupBy("src", "dst").agg(F.sum("n").alias("n")))


def current_absorption(spark: SparkSession, state_dir: str) -> DataFrame:
    """The live conversion table — the registered query's 8 quantized
    generations over the folded counts."""
    return absorption_from_counts(current_transitions(spark, state_dir))
