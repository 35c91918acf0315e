"""Consistent snapshot scan (S1/P1/P2/P3 in SURVEY.md §2).

Reference behavior (snapshot/mysql.go:70-346):
  ``SELECT * FROM t <row-filter> FORCE INDEX (primary)`` inside a
  REPEATABLE-READ transaction; every row becomes an 'insert' event with
  seqno = ^uint64(0) (= -1 signed) so later changelog events supersede it.

Spark-first rendition: the scan is ``spark.read.parquet`` (tests) or
``spark.read.jdbc`` with partitionColumn=pk (production — the JDBC
range-partitioned read replaces FORCE INDEX: each executor reads a PK
range, preserving key-contiguous batches).  Row filters and column
pruning are expressed declaratively so Catalyst pushes them into the
scan (PushedFilters / ReadSchema in the physical plan).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from storagetapper_spark.functions.keys import row_key_expr
from storagetapper_spark.schema.commonformat import SNAPSHOT_SEQNO


@dataclass
class RowFilter:
    """Mirror of config/config.go:171-176 (RowFilter): the per-table
    predicate list rendered into the snapshot WHERE clause
    (snapshot/snapshot.go:71-137).  ``condition`` is a comparison
    operator; ``operator`` is how multiple values combine (or/and)."""

    column: str
    values: list = field(default_factory=list)
    condition: str = "="  # =, !=, >, >=, <, <=, like
    operator: str = "or"  # how the values list combines

    def to_column(self) -> Column:
        cond = self.condition.lower()
        col = F.col(self.column)
        ops = {
            "=": lambda v: col == v, "!=": lambda v: col != v,
            ">": lambda v: col > v, ">=": lambda v: col >= v,
            "<": lambda v: col < v, "<=": lambda v: col <= v,
            "like": lambda v: col.like(v),
        }
        if cond not in ops:
            raise ValueError(f"unsupported row-filter condition: {self.condition}")
        parts = [ops[cond](v) for v in self.values]
        combine = (lambda a, b: a | b) if self.operator.lower() == "or" else (lambda a, b: a & b)
        return reduce(combine, parts)


def apply_row_filters(df: DataFrame, filters: list[RowFilter]) -> DataFrame:
    """Filters AND together (snapshot/snapshot.go:112-137); Catalyst pushes
    them down to the source scan."""
    for f in filters:
        df = df.filter(f.to_column())
    return df


def prune_columns(df: DataFrame, output_columns: list[str], pk_cols: list[str]) -> DataFrame:
    """Output-schema column pruning with PK protection: primary-key columns
    can never be pruned (encoder/json.go:344-373)."""
    keep, seen = [], set()
    for c in df.columns:
        if c in output_columns or c in pk_cols:
            if c not in seen:
                keep.append(c)
                seen.add(c)
    return df.select(*keep)


def snapshot_scan(df: DataFrame, pk_cols: list[str],
                  filters: list[RowFilter] | None = None,
                  output_columns: list[str] | None = None,
                  ts: Column | None = None) -> DataFrame:
    """Turn a table DataFrame into a snapshot event stream: every row is an
    'insert' with seqno = SNAPSHOT_SEQNO and a length-prefixed row key.

    Columns appended: op, seqno, row_key, ts (encode-time; 0 for goldens,
    matching encoder.GenTime=0 in main_test.go:494).
    """
    if filters:
        df = apply_row_filters(df, filters)
    if output_columns is not None:
        df = prune_columns(df, output_columns, pk_cols)
    return (
        df.withColumn("op", F.lit("insert"))
          .withColumn("seqno", F.lit(SNAPSHOT_SEQNO).cast("long"))
          .withColumn("row_key", row_key_expr(pk_cols))
          .withColumn("ts", (ts if ts is not None else F.lit(0)).cast("long"))
    )
