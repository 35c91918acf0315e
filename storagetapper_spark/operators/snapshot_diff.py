"""Snapshot diffing: derive a changelog from two full snapshots.

The reference re-snapshots tables on a schedule (O7,
state/state.go:74-81) and relies on downstream idempotence to absorb the
overlap.  The complementary operator — compute the MINIMAL change set
between two snapshot versions — turns periodic full snapshots into an
incremental feed when no binlog is available (the classic
"diff-based CDC" fallback).

Shape: full outer join on the PK + row-hash comparison.
  - PK only in new      → insert
  - PK only in old      → delete
  - both, hash differs  → update (emitted as the new image)
  - both, hash equal    → dropped (the common case — never leaves the
    join)

Scale: ONE sort-merge join on the PK; the row hash is computed map-side
BEFORE the shuffle, so unchanged rows ship (pk, 8-byte hash) twice and
nothing else — the payload columns of unchanged rows never cross the
network twice (old side projects hash only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame,
                  pk_cols: list[str]) -> DataFrame:
    """Minimal change set old→new: one row per changed PK with
    op ∈ {insert, update, delete}; insert/update carry the new image,
    delete carries only the PK (nulls elsewhere)."""
    data_cols = [c for c in new.columns if c not in pk_cols]
    row_hash = F.xxhash64(*[F.col(c) for c in data_cols])

    old_h = old.select(*pk_cols, row_hash.alias("_old_hash"))
    new_h = new.select(*new.columns, row_hash.alias("_new_hash"))

    j = old_h.join(new_h, on=pk_cols, how="full_outer")
    op = (F.when(F.col("_old_hash").isNull(), F.lit("insert"))
           .when(F.col("_new_hash").isNull(), F.lit("delete"))
           .when(F.col("_old_hash") != F.col("_new_hash"), F.lit("update")))
    return (j.withColumn("op", op)
             .filter(F.col("op").isNotNull())
             .select(*pk_cols, "op", *data_cols))
