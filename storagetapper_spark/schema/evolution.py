"""Schema evolution (S4, changelog/mysql.go:566-683 + schema/alter_schema.go).

The reference regex-matches ALTER/RENAME binlog statements, replays them
on a scratch table and pushes a schema event downstream.  Spark-side,
the CDC feed carries typed schema events; applying one is a pure
StructType transform, and consumers re-sync by selecting against the
new StructType (Catalyst handles missing→null via explicit projection).

Supported DDL grammar (the structural replacement for the reference's
scratch-table replay, fuzz-verified against a real DuckDB scratch table
in tests/test_ddl_replay_property.py):

  - ``ALTER TABLE [db.]tbl <action> [, <action> ...]`` with the four
    quoting variants the reference matches (changelog/mysql.go:110-120)
    where each action is one of
      ``ADD [COLUMN] col type``           (appended; no FIRST/AFTER)
      ``DROP [COLUMN] col``
      ``MODIFY [COLUMN] col type``        (in-place retype)
      ``CHANGE [COLUMN] old new type``    (in-place rename + retype)
    and any other action (ADD INDEX/KEY/CONSTRAINT, DROP PRIMARY KEY,
    …) parses to a positional ``noop``.
  - ``RENAME TABLE a TO b [, c TO d ...]`` with the two quoting
    variants (fully quoted / fully unquoted).
  - Statements mentioning FOREIGN KEY are skipped wholesale
    (mysql.go:583-586).

Out of scope (the reference's MySQL-replay is strictly more general;
these forms parse to ``noop`` or are treated structurally):

  - column POSITIONING: ``ADD ... FIRST/AFTER x`` appends instead (the
    common format is name-addressed, so order carries no meaning);
  - column ATTRIBUTES beyond the type: DEFAULT/NOT NULL/AUTO_INCREMENT/
    CHARACTER SET/COLLATE/COMMENT/ON UPDATE are ignored (nullability is
    always ``True`` downstream — the Avro union-with-null rule);
  - generated columns, partition operations (ADD/DROP/REORGANIZE
    PARTITION), FULLTEXT/SPATIAL indexes, table options (ENGINE=,
    ROW_FORMAT=), ``ALTER TABLE ... RENAME [TO]`` (only ``RENAME
    TABLE`` is matched, like the reference), and multi-schema DDL
    (CREATE/DROP TABLE are snapshot-boundary events, not evolution);
  - exotic type spellings: ``unsigned``/``zerofill`` suffixes and
    display widths beyond ``(p[,s])`` fall back to the base-name
    mapping in mysql_types.mysql_to_spark_type.
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
_TYPE = r"\w+(?:\(\d+(?:,\d+)?\))?"
_ADD_RE = re.compile(
    r"ADD\s+(?:COLUMN\s+)?[`\"]?(?P<col>\w+)[`\"]?\s+(?P<type>" + _TYPE + ")",
    re.IGNORECASE)
_DROP_RE = re.compile(r"DROP\s+(?:COLUMN\s+)?[`\"]?(?P<col>\w+)[`\"]?",
                      re.IGNORECASE)
_MODIFY_RE = re.compile(
    r"MODIFY\s+(?:COLUMN\s+)?[`\"]?(?P<col>\w+)[`\"]?\s+(?P<type>" + _TYPE + ")",
    re.IGNORECASE)
_CHANGE_RE = re.compile(
    r"CHANGE\s+(?:COLUMN\s+)?[`\"]?(?P<col>\w+)[`\"]?\s+"
    r"[`\"]?(?P<new>\w+)[`\"]?\s+(?P<type>" + _TYPE + ")",
    re.IGNORECASE)
#: action keywords that look like DROP/ADD but target table metadata,
#: not a column — they must parse to noop, not to a column change
_NON_COLUMN_WORDS = frozenset(
    {"primary", "index", "key", "constraint", "foreign", "partition",
     "fulltext", "spatial", "unique", "check"})
_RENAME_PAIR_RE = re.compile(
    r"[`\"]?(?:(?P<db>\w+)[`\"]?\.[`\"]?)?(?P<table>\w+)[`\"]?\s+TO\s+"
    r"[`\"]?(?:(?P<new_db>\w+)[`\"]?\.[`\"]?)?(?P<new_table>\w+)[`\"]?",
    re.IGNORECASE)


@dataclass
class SchemaChange:
    kind: str  # add | drop | modify | rename_col | rename_table | noop
    table: str
    column: str | None = None
    mysql_type: str | None = None
    new_table: str | None = None
    new_column: str | None = None


def _split_actions(rest: str) -> list[str]:
    """Split a multi-action ALTER body on top-level commas (commas
    inside a type's parenthesised (p,s) args don't split)."""
    parts, depth, cur = [], 0, []
    for ch in rest:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _parse_action(table: str, action: str) -> SchemaChange:
    """One comma-separated ALTER action → SchemaChange (noop for
    index/constraint/partition forms — see module docstring)."""
    first_word = action.split(None, 2)
    target = first_word[1].strip('`"').lower() if len(first_word) > 1 else ""
    if target in _NON_COLUMN_WORDS:
        return SchemaChange("noop", table)
    m = _ADD_RE.match(action)
    if m:
        return SchemaChange("add", table, column=m.group("col"),
                            mysql_type=m.group("type"))
    m = _MODIFY_RE.match(action)
    if m:
        return SchemaChange("modify", table, column=m.group("col"),
                            mysql_type=m.group("type"))
    m = _CHANGE_RE.match(action)
    if m:
        return SchemaChange("rename_col", table, column=m.group("col"),
                            new_column=m.group("new"),
                            mysql_type=m.group("type"))
    m = _DROP_RE.match(action)
    if m:
        return SchemaChange("drop", table, column=m.group("col"))
    return SchemaChange("noop", table)


def parse_ddl_actions(stmt: str) -> list[SchemaChange]:
    """Classify a DDL statement into its ordered action list — the
    structural analogue of the reference's whole-statement replay
    (schema/alter_schema.go:36-74 executes the raw ALTER, so
    comma-separated actions and MODIFY/CHANGE come for free there;
    here each action becomes one SchemaChange).  FK statements are
    skipped wholesale (changelog/mysql.go:583-586); RENAME TABLE may
    carry several comma-separated pairs (the reference's rename regex
    is repeated per pair, mysql.go:117-119)."""
    m = _RENAME_RE.match(stmt)
    if m:
        body = re.sub(r"^\s*RENAME\s+TABLE\s+", "", stmt,
                      flags=re.IGNORECASE)
        out = []
        for pair in _split_actions(body):
            pm = _RENAME_PAIR_RE.match(pair)
            if pm:
                out.append(SchemaChange("rename_table", pm.group("table"),
                                        new_table=pm.group("new_table")))
        return out
    m = _ALTER_RE.match(stmt)
    if not m:
        return []
    rest = m.group("rest")
    table = m.group("table")
    if re.search(r"FOREIGN\s+KEY", rest, re.IGNORECASE):
        return [SchemaChange("noop", table)]
    return [_parse_action(table, a) for a in _split_actions(rest)]


def parse_ddl(stmt: str) -> SchemaChange | None:
    """Classify a DDL statement the way the changelog reader does
    (changelog/mysql.go:566-683) — the single-action convenience form;
    multi-action statements return their FIRST action (use
    parse_ddl_actions for the full ordered list)."""
    actions = parse_ddl_actions(stmt)
    return actions[0] if actions else None


def _mysql_type(base: str) -> T.DataType:
    """``varchar(32)`` / ``decimal(10,2)`` / ``bigint`` → Spark type."""
    from storagetapper_spark.schema.mysql_types import mysql_to_spark_type

    name = base.split("(")[0]
    prec = scale = None
    if "(" in base:
        args = base[base.index("(") + 1:-1].split(",")
        prec = int(args[0])
        scale = int(args[1]) if len(args) > 1 else None
    return mysql_to_spark_type(name, base, prec, scale)


def apply_change(schema: T.StructType, change: SchemaChange) -> T.StructType:
    """Replay a schema change against a StructType — the scratch-table
    replay (schema/alter_schema.go:36-74) as a pure function.  ADD
    appends; MODIFY retypes in place; CHANGE renames (+retypes) in
    place — matching MySQL's positional semantics without FIRST/AFTER.
    Replay-idempotent: ADD of an existing column and MODIFY/CHANGE/DROP
    of a missing one are no-ops (a binlog replay may deliver the same
    DDL twice)."""
    if change.kind == "add":
        if any(f.name == change.column for f in schema.fields):
            return schema  # replay-idempotent: column already added
        dt = _mysql_type(change.mysql_type or "text")
        return T.StructType(list(schema.fields)
                            + [T.StructField(change.column, dt, True)])
    if change.kind == "drop":
        return T.StructType([f for f in schema.fields
                             if f.name != change.column])
    if change.kind == "modify":
        dt = _mysql_type(change.mysql_type or "text")
        return T.StructType([
            T.StructField(f.name, dt, True) if f.name == change.column else f
            for f in schema.fields])
    if change.kind == "rename_col":
        dt = (_mysql_type(change.mysql_type)
              if change.mysql_type is not None else None)
        return T.StructType([
            T.StructField(change.new_column, dt or f.dataType, True)
            if f.name == change.column else f
            for f in schema.fields])
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
