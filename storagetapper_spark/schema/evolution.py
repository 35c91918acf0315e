"""Schema evolution (S4, changelog/mysql.go:566-683 + schema/alter_schema.go).

The reference regex-matches ALTER/RENAME binlog statements, replays them
on a scratch table and pushes a schema event downstream.  Spark-side,
the CDC feed carries typed schema events; applying one is a pure
StructType transform, and consumers re-sync by selecting against the
new StructType (Catalyst handles missing→null via explicit projection).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: ALTER/RENAME statement matchers (4 quoting variants for ALTER, 2 for
#: RENAME in the reference, changelog/mysql.go:110-120) — collapsed to
#: quote-insensitive patterns.
_ALTER_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+[`\"]?(?:(?P<db>\w+)[`\"]?\.[`\"]?)?(?P<table>\w+)[`\"]?\s+(?P<rest>.*)$",
    re.IGNORECASE | re.DOTALL)
_RENAME_RE = re.compile(
    r"^\s*RENAME\s+TABLE\s+[`\"]?(?:(?P<db>\w+)[`\"]?\.[`\"]?)?(?P<table>\w+)[`\"]?\s+TO\s+"
    r"[`\"]?(?:(?P<new_db>\w+)[`\"]?\.[`\"]?)?(?P<new_table>\w+)[`\"]?",
    re.IGNORECASE)
_ADD_RE = re.compile(r"ADD\s+(?:COLUMN\s+)?[`\"]?(?P<col>\w+)[`\"]?\s+(?P<type>\w+(?:\(\d+(?:,\d+)?\))?)",
                     re.IGNORECASE)
_DROP_RE = re.compile(r"DROP\s+(?:COLUMN\s+)?[`\"]?(?P<col>\w+)[`\"]?", re.IGNORECASE)


@dataclass
class SchemaChange:
    kind: str  # add | drop | rename_table | noop
    table: str
    column: str | None = None
    mysql_type: str | None = None
    new_table: str | None = None


def parse_ddl(stmt: str) -> SchemaChange | None:
    """Classify a DDL statement the way the changelog reader does
    (changelog/mysql.go:566-683); FK-only ALTERs are skipped (:583-586)."""
    m = _RENAME_RE.match(stmt)
    if m:
        return SchemaChange("rename_table", m.group("table"),
                            new_table=m.group("new_table"))
    m = _ALTER_RE.match(stmt)
    if not m:
        return None
    rest = m.group("rest")
    if re.search(r"FOREIGN\s+KEY", rest, re.IGNORECASE):
        return SchemaChange("noop", m.group("table"))
    am = _ADD_RE.search(rest)
    if am:
        return SchemaChange("add", m.group("table"), column=am.group("col"),
                            mysql_type=am.group("type"))
    dm = _DROP_RE.search(rest)
    if dm:
        return SchemaChange("drop", m.group("table"), column=dm.group("col"))
    return SchemaChange("noop", m.group("table"))


def apply_change(schema: T.StructType, change: SchemaChange) -> T.StructType:
    """Replay a schema change against a StructType — the scratch-table
    replay (schema/alter_schema.go:36-74) as a pure function."""
    from storagetapper_spark.schema.mysql_types import mysql_to_spark_type

    if change.kind == "add":
        if any(f.name == change.column for f in schema.fields):
            return schema  # replay-idempotent: column already added
        base = change.mysql_type or "text"
        name = base.split("(")[0]
        prec = scale = None
        if "(" in base:
            args = base[base.index("(") + 1:-1].split(",")
            prec = int(args[0])
            scale = int(args[1]) if len(args) > 1 else None
        dt = mysql_to_spark_type(name, base, prec, scale)
        return T.StructType(list(schema.fields) + [T.StructField(change.column, dt, True)])
    if change.kind == "drop":
        return T.StructType([f for f in schema.fields if f.name != change.column])
    return schema


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project a batch onto a target schema: missing columns become
    typed nulls, extra columns are pruned, types are cast — how a
    consumer re-syncs after a schema event."""
    cols = []
    have = {f.name for f in df.schema.fields}
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def schema_diff(old: T.StructType, new: T.StructType,
                table: str = "") -> list[SchemaChange]:
    """The DDL-capture INVERSE: infer the change list from two observed
    schema versions — drift detection for feeds with no DDL events
    (parquet drops, API exports).  Emits adds, drops, and retypes (a
    retype surfaces as drop+add of the same column so ``apply_change``
    can replay it); column order is not a change (the common format is
    name-addressed, like the reference's CommonFormatEvent).

    Invariant (tested): replaying the returned changes through
    ``apply_change`` on ``old`` yields a schema equal to ``new`` up to
    field order and the mysql↔spark type mapping's granularity.
    """
    old_f = {f.name: f for f in old.fields}
    new_f = {f.name: f for f in new.fields}
    changes: list[SchemaChange] = []
    for name in old_f:
        if name not in new_f:
            changes.append(SchemaChange(kind="drop", table=table, column=name))
    for name, f in new_f.items():
        if name not in old_f:
            changes.append(SchemaChange(kind="add", table=table, column=name,
                                        mysql_type=_spark_to_mysqlish(f.dataType)))
        elif old_f[name].dataType != f.dataType:
            changes.append(SchemaChange(kind="drop", table=table, column=name))
            changes.append(SchemaChange(kind="add", table=table, column=name,
                                        mysql_type=_spark_to_mysqlish(f.dataType)))
    return changes


def _spark_to_mysqlish(dt: T.DataType) -> str:
    """Inverse-ish of mysql_to_spark_type, good enough that
    add(column, type) replays to the same Spark type."""
    if isinstance(dt, T.LongType):
        return "bigint"
    if isinstance(dt, T.IntegerType):
        return "int"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "tinyint(1)"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BinaryType):
        return "blob"
    return "text"
