"""Property fuzz of parse_ddl_actions + apply_change against a REAL
scratch-table replay (VERDICT r9 #5).

The reference captures DDL by replaying the raw ALTER on a MySQL
scratch table and reading the resulting schema back
(schema/alter_schema.go:36-74 MutateTable).  Our engine replaces that
with a structural parse (schema/evolution.py) — this test pins the two
approaches to each other: random supported ALTER statements (ADD /
DROP / MODIFY / CHANGE, multi-action, all quoting variants the
reference's queryHandlers match, changelog/mysql.go:110-120) are

  1. rendered as MySQL-syntax DDL text and pushed through
     parse_ddl_actions -> apply_change over a StructType, and
  2. executed as equivalent DDL against a DuckDB scratch table
     (translated from the GENERATED spec, not the parsed one, so the
     parser itself is under test),

and the resulting schemas must agree in column NAMES, ORDER, and type
(through the shared MySQL->Spark / MySQL->DuckDB mappings).  The forms
the structural parser deliberately does NOT cover are documented in
schema/evolution.py's module docstring ("Out of scope").
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from storagetapper_spark.schema.evolution import (
    apply_change,
    parse_ddl,
    parse_ddl_actions,
)

# MySQL spelling -> (Spark type, DuckDB spelling).  The pool spans the
# int / float / decimal / string / temporal families the engine maps.
TYPES = {
    "bigint": (T.LongType(), "BIGINT"),
    "int": (T.IntegerType(), "INTEGER"),
    "double": (T.DoubleType(), "DOUBLE"),
    "varchar(32)": (T.StringType(), "VARCHAR"),
    "text": (T.StringType(), "VARCHAR"),
    "decimal(10,2)": (T.DecimalType(10, 2), "DECIMAL(10,2)"),
    "decimal(18,4)": (T.DecimalType(18, 4), "DECIMAL(18,4)"),
    "date": (T.DateType(), "DATE"),
    "datetime": (T.TimestampType(), "TIMESTAMP"),
}
_SPARK_TO_DUCK = {
    T.LongType(): "BIGINT", T.IntegerType(): "INTEGER",
    T.DoubleType(): "DOUBLE", T.StringType(): "VARCHAR",
    T.DecimalType(10, 2): "DECIMAL(10,2)",
    T.DecimalType(18, 4): "DECIMAL(18,4)",
    T.DateType(): "DATE", T.TimestampType(): "TIMESTAMP",
}

QUOTES = ["`{}`", "{}"]  # backtick-quoted and bare, mixed per token


@st.composite
def ddl_scripts(draw):
    """(initial columns, ordered action specs).  Actions are generated
    VALID against the evolving model (MySQL/DuckDB both error on e.g.
    dropping a missing column; the grammar's error behaviour is out of
    scope — the reference's replay would surface the MySQL error and
    skip the event)."""
    n0 = draw(st.integers(2, 5))
    cols = [(f"c{i}", draw(st.sampled_from(sorted(TYPES))))
            for i in range(n0)]
    live = [c for c, _ in cols]
    fresh = iter(f"n{i}" for i in range(50))
    actions = []
    for _ in range(draw(st.integers(1, 6))):
        # keep at least one column so DROP never empties the table
        kind = draw(st.sampled_from(
            ["add", "drop", "modify", "change", "noop_index"]
            if len(live) > 1 else ["add", "modify", "change", "noop_index"]))
        if kind == "add":
            col = next(fresh)
            actions.append(("add", col, draw(st.sampled_from(sorted(TYPES)))))
            live.append(col)
        elif kind == "drop":
            col = draw(st.sampled_from(live))
            actions.append(("drop", col, None))
            live.remove(col)
        elif kind == "modify":
            col = draw(st.sampled_from(live))
            actions.append(("modify", col,
                            draw(st.sampled_from(sorted(TYPES)))))
        elif kind == "change":
            col = draw(st.sampled_from(live))
            new = next(fresh)
            actions.append(("change", col, new,
                            draw(st.sampled_from(sorted(TYPES)))))
            live[live.index(col)] = new
        else:
            actions.append(("noop_index",))
    return cols, actions


def _mysql_text(draw_bits, table_ref: str, actions) -> str:
    """Render the spec as MySQL DDL with per-token quoting noise and a
    random split into 1..n multi-action statements."""
    rng, stmts, parts = draw_bits, [], []
    for a in actions:
        q = QUOTES[next(rng) % 2].format
        kw = "COLUMN " if next(rng) % 2 else ""
        if a[0] == "add":
            parts.append(f"ADD {kw}{q(a[1])} {a[2]}")
        elif a[0] == "drop":
            parts.append(f"DROP {kw}{q(a[1])}")
        elif a[0] == "modify":
            parts.append(f"MODIFY {kw}{q(a[1])} {a[2]}")
        elif a[0] == "change":
            parts.append(f"CHANGE {kw}{q(a[1])} {q(a[2])} {a[3]}")
        else:
            parts.append("ADD INDEX idx_x (c0)")
        if next(rng) % 2 or a is actions[-1]:
            kw2 = "alter table" if next(rng) % 2 else "ALTER TABLE"
            stmts.append(f"{kw2} {table_ref} " + ", ".join(parts))
            parts = []
    return stmts


def _duck_replay(con, actions) -> None:
    """Execute the GENERATED spec on the DuckDB scratch table."""
    for a in actions:
        if a[0] == "add":
            con.execute(f'ALTER TABLE scratch ADD COLUMN "{a[1]}" '
                        f"{TYPES[a[2]][1]}")
        elif a[0] == "drop":
            con.execute(f'ALTER TABLE scratch DROP COLUMN "{a[1]}"')
        elif a[0] == "modify":
            con.execute(f'ALTER TABLE scratch ALTER COLUMN "{a[1]}" '
                        f"SET DATA TYPE {TYPES[a[2]][1]}")
        elif a[0] == "change":
            con.execute(f'ALTER TABLE scratch RENAME COLUMN "{a[1]}" '
                        f'TO "{a[2]}"')
            con.execute(f'ALTER TABLE scratch ALTER COLUMN "{a[2]}" '
                        f"SET DATA TYPE {TYPES[a[3]][1]}")


@settings(max_examples=60, deadline=None)
@given(data=ddl_scripts(), bits=st.lists(st.integers(0, 1), min_size=40,
                                         max_size=40),
       quoting=st.integers(0, 3))
def test_structural_parse_equals_scratch_table_replay(data, bits, quoting):
    cols, actions = data
    # the four table-reference quoting variants of mysql.go:110-120
    table_ref = ["`db1`.`t1`", "`db1`.t1", "db1.`t1`", "db1.t1"][quoting]

    # engine path: DDL text -> parse_ddl_actions -> apply_change fold
    schema = T.StructType([T.StructField(c, TYPES[ty][0], True)
                           for c, ty in cols])
    for stmt in _mysql_text(iter(bits), table_ref, actions):
        parsed = parse_ddl_actions(stmt)
        assert parsed, f"unparsed supported statement: {stmt!r}"
        assert all(p.table == "t1" for p in parsed)
        for change in parsed:
            schema = apply_change(schema, change)

    # scratch path: the spec executed on a real engine's table
    con = duckdb.connect()
    con.execute("CREATE TABLE scratch ("
                + ", ".join(f'"{c}" {TYPES[ty][1]}' for c, ty in cols) + ")")
    _duck_replay(con, actions)
    duck = [(r[1], r[2]) for r in
            con.execute("PRAGMA table_info('scratch')").fetchall()]

    got = [(f.name, _SPARK_TO_DUCK[f.dataType]) for f in schema.fields]
    assert got == duck


def test_rename_table_multi_pair():
    """RENAME TABLE with several comma-separated pairs — the reference
    matches each pair (mysql.go:117-119); parse_ddl keeps returning the
    first for back-compat."""
    stmt = "RENAME TABLE db1.t1 TO db1.t9, `db2`.`t2` TO `db2`.`t8`"
    acts = parse_ddl_actions(stmt)
    assert [(a.kind, a.table, a.new_table) for a in acts] == [
        ("rename_table", "t1", "t9"), ("rename_table", "t2", "t8")]
    one = parse_ddl(stmt)
    assert (one.kind, one.table, one.new_table) == ("rename_table", "t1", "t9")


def test_multi_action_order_and_noops():
    """DROP-then-ADD of the same name must preserve action order (the
    old first-match-wins parse would have run the ADD first), and
    index/constraint actions inside a multi-action ALTER are positional
    noops."""
    base = T.StructType([T.StructField("a", T.LongType(), True),
                         T.StructField("b", T.StringType(), True)])
    stmt = ("ALTER TABLE t1 DROP COLUMN a, ADD KEY k1 (b), "
            "ADD COLUMN a varchar(32), MODIFY b bigint")
    sch = base
    for ch in parse_ddl_actions(stmt):
        sch = apply_change(sch, ch)
    assert [(f.name, type(f.dataType).__name__) for f in sch.fields] == [
        ("b", "LongType"), ("a", "StringType")]


def test_fk_statement_skipped_wholesale():
    acts = parse_ddl_actions(
        "ALTER TABLE t1 ADD COLUMN x int, "
        "ADD CONSTRAINT fk FOREIGN KEY (x) REFERENCES p(id)")
    assert [a.kind for a in acts] == ["noop"]
