"""Changelog-derived history / warehouse-maintenance operators.

The reference materializes only the *latest* state per PK (encoder
common-format + SQL MERGE — encoder/sql.go, pipe/sql.go); downstream
warehouses routinely need the other classical CDC products too:

  - ``scd2_history``: the full version history as a slowly-changing-
    dimension Type-2 table (valid_from/valid_to/is_current intervals).
  - ``delta_stream``: the changelog re-expressed as signed deltas so an
    aggregate can be maintained *incrementally* (insert-only fold)
    instead of recomputed from the latest state.
  - ``column_audit``: per-key consecutive-version diff — which tracked
    columns changed at each seqno (audit-log / change-data-capture of
    individual fields).

All three are single-window transforms: one shuffle on the PK, then
narrow projections — map-side ``WindowGroupLimit`` does not apply (we
keep every version), but nothing here is wider than the one exchange a
latest-state materialization already pays, so the operators scale the
same way ``operators/merge.latest_state`` does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(cdc: DataFrame, pk_cols: list[str],
                 seqno_col: str = "seqno", op_col: str = "op") -> DataFrame:
    """Build an SCD Type-2 history from a changelog.

    Every non-delete changelog row becomes one *version* valid over the
    seqno interval ``[valid_from, valid_to)``; ``valid_to`` is the seqno
    of the key's next change of ANY op (a delete closes the last version
    without opening a new one), NULL while the version is still open.
    ``is_current`` marks open versions — a deleted key has none.

    The ``lead`` is computed BEFORE the delete filter so deletes close
    intervals; one window over the PK is the only shuffle.
    """
    w = Window.partitionBy(*pk_cols).orderBy(F.col(seqno_col).asc(),
                                             F.col(op_col).asc())
    valid_to = F.lead(seqno_col).over(w)
    return (cdc.withColumn("valid_from", F.col(seqno_col).cast("long"))
               .withColumn("valid_to", valid_to.cast("long"))
               .where(F.col(op_col) != "delete")
               .withColumn("is_current", F.col("valid_to").isNull()))


def delta_stream(cdc: DataFrame, pk_cols: list[str], value_col: str,
                 seqno_col: str = "seqno", op_col: str = "op",
                 decimal_type: str = "decimal(18,6)") -> DataFrame:
    """Re-express a changelog as signed per-key deltas for incremental
    aggregate maintenance (IVM).

    For each key ordered by seqno the *state value* is 0 when deleted,
    else the row's value; the emitted ``value_delta`` is
    ``state - lag(state)`` and ``live_delta`` is the 0/1 liveness
    transition.  Folding the deltas with a plain SUM reproduces
    ``SUM(value)`` / ``COUNT(*)`` over the latest live state exactly —
    so a downstream materialized aggregate can be maintained by
    appending delta batches instead of re-scanning the state table.

    Deltas are computed in decimal so the fold is order-independent
    (float addition is not associative; decimal addition is exact).
    """
    w = Window.partitionBy(*pk_cols).orderBy(F.col(seqno_col).asc(),
                                             F.col(op_col).asc())
    state = F.when(F.col(op_col) == "delete", F.lit(0)) \
             .otherwise(F.coalesce(F.col(value_col), F.lit(0))) \
             .cast(decimal_type)
    live = F.when(F.col(op_col) == "delete", F.lit(0)).otherwise(F.lit(1))
    return (cdc.withColumn(
                "value_delta",
                state - F.coalesce(F.lag(state).over(w),
                                   F.lit(0).cast(decimal_type)))
               .withColumn(
                "live_delta",
                (live - F.coalesce(F.lag(live).over(w), F.lit(0)))
                .cast("long")))


def column_audit(cdc: DataFrame, pk_cols: list[str],
                 tracked_cols: list[str],
                 seqno_col: str = "seqno") -> DataFrame:
    """Field-level audit log: for each key's consecutive versions, which
    tracked columns changed (null-safe compare; a key's first row counts
    every non-null column as changed — it IS the change from absent).

    Output adds ``changed_cols`` (comma-joined tracked-column names in
    ``tracked_cols`` order) and ``n_changed``; rows where nothing
    tracked changed are dropped.
    """
    w = Window.partitionBy(*pk_cols).orderBy(seqno_col)

    def mark(c: str) -> Column:
        return ~F.col(c).eqNullSafe(F.lag(c).over(w))

    names = F.concat_ws(
        ",", *[F.when(mark(c), F.lit(c)) for c in tracked_cols])
    count = sum((mark(c).cast("int") for c in tracked_cols), F.lit(0))
    return (cdc.withColumn("changed_cols", names)
               .withColumn("n_changed", count)
               .where(F.col("n_changed") > 0))
