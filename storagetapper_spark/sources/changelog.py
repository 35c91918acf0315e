"""Changelog (CDC) source normalization (S2/S3/O3 in SURVEY.md §2).

The reference streams MySQL ROW binlog events (changelog/mysql.go:508-968):
WRITE_ROWS → insert, DELETE_ROWS → delete, UPDATE_ROWS → a delete of the
before-image followed by an insert of the after-image with consecutive
seqnos (changelog/mysql.go:530-538).  Seqno is monotonically increasing
per cluster (changelog/mysql.go:396-402).

In Spark the CDC feed is any ordered event table/stream (Kafka topic,
Debezium feed, or the driver's ``events`` fixture standing in for it).
These helpers are pure DataFrame transforms and therefore work
identically in batch and Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def events_as_changelog(events: DataFrame,
                        key_col: str = "user_id",
                        seqno_col: str = "event_id",
                        op_map: dict[str, str] | None = None,
                        op_col: str = "event_type") -> DataFrame:
    """Map a generic ordered event table onto the CDC op model.

    Default mapping for the driver's ``events`` fixture: 'signup' → insert,
    'error' → delete, everything else → update (an in-place change of the
    user's state).  Seqno is the event id (monotonic, like binlog seqno).
    """
    op_map = op_map or {"signup": "insert", "error": "delete"}
    mapping = F.lit("update")
    for src, dst in op_map.items():
        mapping = F.when(F.col(op_col) == src, F.lit(dst)).otherwise(mapping)
    return (
        events.withColumn("op", mapping)
              .withColumn("seqno", F.col(seqno_col).cast("long"))
              .withColumn("row_key", F.col(key_col).cast("string"))
    )


def decompose_updates(cdc: DataFrame, no_delete_on_update: bool = False,
                      op_col: str = "op", seqno_col: str = "seqno") -> DataFrame:
    """UPDATE → (delete(before), insert(after)) adjacent pair (S3,
    changelog/mysql.go:530-538).

    The pair shares the update's seqno slot: delete gets 2*seqno, insert
    2*seqno+1, preserving 'delete immediately precedes its insert' under
    any seqno-ordered consumer while keeping global monotonicity (the
    reference allocates two consecutive seqnos the same way).

    With ``no_delete_on_update`` (config/config.go:167, used by the
    *_idempotent output formats) updates emit only the insert half.

    Implemented as explode over a conditionally-built array — one narrow
    projection, no shuffle, streaming-safe.
    """
    halves = F.when(
        F.col(op_col) == "update",
        F.array(
            *([] if no_delete_on_update else [F.struct(
                F.lit("delete").alias("_op"),
                (F.col(seqno_col) * 2).alias("_seqno"))]),
            F.struct(F.lit("insert").alias("_op"),
                     (F.col(seqno_col) * 2 + 1).alias("_seqno")),
        ),
    ).otherwise(
        F.array(F.struct(F.col(op_col).alias("_op"),
                         (F.col(seqno_col) * 2 + 1).alias("_seqno")))
    )
    other = [c for c in cdc.columns if c not in (op_col, seqno_col)]
    return (
        cdc.withColumn("_h", F.explode(halves))
           .select(*other,
                   F.col("_h._op").alias(op_col),
                   F.col("_h._seqno").alias(seqno_col))
    )


def with_monotonic_seqno(df: DataFrame, partition_col: str, offset_col: str,
                         bits: int = 40) -> Column:
    """Derive a seqno from a (kafka partition, offset) pair — the Spark
    analog of the reference's per-cluster counter (O3): order-consistent
    per key because a key lives in exactly one partition.

    seqno = partition << bits | offset.  40 offset bits ≈ 1.1e12 messages
    per partition before rollover.
    """
    return (F.col(partition_col).cast("long") * F.lit(2 ** bits)
            + F.col(offset_col).cast("long")).alias("seqno")
