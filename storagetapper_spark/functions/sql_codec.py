"""SQL-statement encoder (E4/E5, encoder/sql.go:34-314).

Row → ``INSERT INTO t (seqno, cols…) VALUES (…);`` / ``DELETE FROM t
WHERE seqno=… AND pk=…;``; schema → ``CREATE TABLE`` with an injected
``seqno BIGINT NOT NULL UNIQUE`` column (encoder/sql.go:212-214); the
idempotent variant emits ``ON DUPLICATE KEY UPDATE col=IF(seqno <
VALUES(seqno), VALUES(col), col)`` (encoder/sql.go:133-148).

Dialect quoting: mysql backtick vs ansisql double-quote
(encoder/sql.go appendStmt :240-261).

Statement strings are built with Column expressions (concat/when) —
JVM-side, no Python in the row path.  At scale the statements themselves
are only a wire format; the Spark-native sink path is df.write.jdbc /
foreachBatch MERGE (sinks.jdbc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_QUOTE = {"mysql": "`", "ansisql": '"'}
_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType, T.BooleanType)


def _q(ident: str, dialect: str) -> str:
    q = _QUOTE[dialect]
    return f"{q}{ident}{q}"


def _sql_literal(col: str, dtype: T.DataType) -> Column:
    """Render a column value as a SQL literal: numerics bare, NULL for
    null, everything else single-quoted with '' escaping
    (encoder/sql.go appendValue)."""
    c = F.col(col)
    if isinstance(dtype, _NUMERIC):
        lit = c.cast("string")
    else:
        lit = F.concat(F.lit("'"),
                       F.regexp_replace(c.cast("string"), "'", "''"),
                       F.lit("'"))
    return F.when(c.isNull(), F.lit("NULL")).otherwise(lit)


def encode_sql(df: DataFrame, table: str, pk_cols: list[str],
               dialect: str = "mysql", idempotent: bool = False,
               op_col: str = "op", seqno_col: str = "seqno") -> DataFrame:
    """Encode each event row as an executable SQL statement string."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    field_cols = [c for c in df.columns
                  if c not in (op_col, seqno_col, "ts", "row_key")]
    t = _q(table, dialect)

    col_list = ", ".join([_q(seqno_col, dialect)] + [_q(c, dialect) for c in field_cols])
    values: list[Column] = [F.col(seqno_col).cast("string")]
    for c in field_cols:
        values.append(_sql_literal(c, schema[c]))
    vals = F.concat_ws(", ", *values)
    insert = F.concat(F.lit(f"INSERT INTO {t} ({col_list}) VALUES ( "), vals, F.lit(" )"))
    if idempotent:
        # encoder/sql.go:133-148 appendSetFields — seqno-guarded LWW upsert
        sets = ", ".join(
            f"{_q(c, dialect)}=IF({_q(seqno_col, dialect)} < VALUES({_q(seqno_col, dialect)}), "
            f"VALUES({_q(c, dialect)}), {_q(c, dialect)})"
            for c in field_cols + [seqno_col]
        )
        insert = F.concat(insert, F.lit(f" ON DUPLICATE KEY UPDATE {sets}"))
    insert = F.concat(insert, F.lit(";"))

    where_parts: list[Column] = []
    for c in pk_cols:
        where_parts.append(F.concat(F.lit(f"{_q(c, dialect)}="), _sql_literal(c, schema[c])))
    where = F.concat_ws(" AND ", *where_parts)
    delete = F.concat(F.lit(f"DELETE FROM {t} WHERE "), where, F.lit(";"))

    stmt = F.when(F.col(op_col) == "delete", delete).otherwise(insert)
    return df.select(F.col(seqno_col), stmt.alias("stmt"))


_SQL_TYPE = {
    T.ByteType: "TINYINT", T.ShortType: "SMALLINT", T.IntegerType: "INT",
    T.LongType: "BIGINT", T.FloatType: "FLOAT", T.DoubleType: "DOUBLE",
    T.BooleanType: "BOOLEAN", T.StringType: "TEXT", T.BinaryType: "BLOB",
    T.DateType: "DATE", T.TimestampType: "TIMESTAMP",
}


def create_table_sql(table: str, schema: T.StructType, pk_cols: list[str],
                     dialect: str = "mysql") -> str:
    """Schema event → CREATE TABLE (encoder/sql.go appendSchema): injects
    ``seqno BIGINT NOT NULL, UNIQUE KEY(seqno)`` and the PK clause."""
    cols = [f"{_q('seqno', dialect)} BIGINT NOT NULL"]
    for f in schema.fields:
        if f.name in ("op", "seqno", "ts", "row_key"):
            continue
        if isinstance(f.dataType, T.DecimalType):
            sql_t = f"DECIMAL({f.dataType.precision},{f.dataType.scale})"
        else:
            sql_t = _SQL_TYPE.get(type(f.dataType), "TEXT")
        null = "" if f.nullable else " NOT NULL"
        cols.append(f"{_q(f.name, dialect)} {sql_t}{null}")
    pk = ", ".join(_q(c, dialect) for c in pk_cols)
    uniq = f"UNIQUE KEY({_q('seqno', dialect)})" if dialect == "mysql" else \
        f"UNIQUE({_q('seqno', dialect)})"
    return (f"CREATE TABLE {_q(table, dialect)} ({', '.join(cols)}, "
            f"{uniq}, PRIMARY KEY ({pk}));")
