"""MySQL → Spark / Avro type-fidelity mapping.

Re-expresses the reference's three conversion tables (see SURVEY.md §1.3):
  - MySQL → driver scan types:  util/util.go:223-245 (MySQLToDriverType)
  - MySQL → Avro:               schema/mysql_avro_schema_converter.go:37-77
  - post-decode narrowing:      encoder/json.go:157-204 (fixFieldType)

Semantics preserved from the reference:
  - ``tinyint(1)`` is BOOLEAN (types/const.go:36, encoder/json.go:283-292).
  - DATETIME/TIMESTAMP → Avro ``long`` epoch-milliseconds (encoder/avro.go:283).
  - Zero time '0000-00-00 00:00:00' → NULL (encoder/avro.go:236-238).
  - Every Avro field is a [null, T] union (mysql_avro_schema_converter.go:97).

Improvement over the reference (documented quirk): DECIMAL keeps
DecimalType(p, s) internally instead of the reference's lossy double;
the Avro map still emits "double" for wire compatibility.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

#: MySQL zero-time literals that map to NULL (encoder/avro.go:236-238).
ZERO_TIMES = ("0000-00-00 00:00:00", "0000-00-00")


def normalize_zero_time(col, with_fraction: bool = True):
    """Column transform: MySQL zero-time string → NULL before the
    timestamp cast (the Avro rule, encoder/avro.go:236-238; JSON keeps a
    zero-value time — callers choose).  Handles the fractional-seconds
    variants ('0000-00-00 00:00:00.000...')."""
    from pyspark.sql import functions as F

    c = col.cast("string")
    is_zero = c.startswith("0000-00-00") if with_fraction else c.isin(*ZERO_TIMES)
    return F.when(c.isNull() | is_zero, F.lit(None)).otherwise(c).cast("timestamp")

_INT_FAMILY = ("int", "integer", "mediumint", "smallint")


@dataclass
class ColumnSchema:
    """Mirror of types/schema.go:36-45 (ColumnSchema)."""

    name: str
    data_type: str  # lowercase MySQL data type, e.g. "varchar"
    column_type: str = ""  # full type, e.g. "tinyint(1)" — needed for bool
    ordinal: int = 0
    nullable: bool = True
    char_max_len: int | None = None
    numeric_precision: int | None = None
    numeric_scale: int | None = None
    key: str = ""  # "PRI" for primary-key members


@dataclass
class TableSchema:
    """Mirror of types/schema.go:28-33 (TableSchema)."""

    db: str
    table: str
    columns: list[ColumnSchema] = field(default_factory=list)

    @property
    def primary_key(self) -> list[str]:
        pk = [c for c in self.columns if c.key == "PRI"]
        pk.sort(key=lambda c: c.ordinal)
        return [c.name for c in pk]


def _is_bool(data_type: str, column_type: str) -> bool:
    # tinyint(1) is MySQL's boolean (types/const.go:36).
    return data_type == "tinyint" and column_type.replace(" unsigned", "") == "tinyint(1)"


def mysql_to_spark_type(data_type: str, column_type: str = "",
                        precision: int | None = None,
                        scale: int | None = None) -> T.DataType:
    """MySQL data type → Spark DataType (SURVEY.md §1.3 mapping)."""
    dt = data_type.lower().strip()
    ct = (column_type or dt).lower().strip()
    if _is_bool(dt, ct):
        return T.BooleanType()
    if dt == "tinyint":
        return T.ByteType()
    if dt in _INT_FAMILY:
        return T.IntegerType()
    if dt in ("bigint", "bit"):
        return T.LongType()
    if dt == "year":
        return T.IntegerType()
    if dt == "float":
        return T.FloatType()
    if dt == "double":
        return T.DoubleType()
    if dt in ("decimal", "numeric"):
        # Reference maps to double (lossy, mysql_avro_schema_converter.go:57);
        # we keep full fidelity internally.
        return T.DecimalType(precision or 10, scale or 0)
    if dt in ("char", "varchar", "text", "tinytext", "mediumtext", "longtext",
              "json", "enum", "set", "time"):
        return T.StringType()
    if dt in ("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob"):
        return T.BinaryType()
    if dt == "date":
        return T.DateType()
    if dt in ("datetime", "timestamp"):
        # timestamp is session-zone, datetime is UTC in the reference
        # (encoder/json.go:187-198); Spark stores both as UTC instants and
        # the session timezone is pinned to UTC in session.py.
        return T.TimestampType()
    return T.StringType()


def mysql_to_avro_type(data_type: str, column_type: str = "") -> str:
    """MySQL data type → Avro primitive (mysql_avro_schema_converter.go:37-77)."""
    dt = data_type.lower().strip()
    ct = (column_type or dt).lower().strip()
    if _is_bool(dt, ct):
        return "boolean"
    if dt in ("tinyint",) + _INT_FAMILY or dt == "year":
        return "int"
    if dt == "bigint" or dt == "bit":
        return "long"
    if dt == "float":
        return "float"
    if dt in ("double", "decimal", "numeric"):
        return "double"  # decimal precision lost — documented reference quirk
    if dt in ("binary", "varbinary", "blob", "tinyblob", "mediumblob", "longblob"):
        return "bytes"
    if dt in ("datetime", "timestamp"):
        return "long"  # epoch-milliseconds (encoder/avro.go:283)
    return "string"


def table_schema_to_struct(ts: TableSchema) -> T.StructType:
    """TableSchema → StructType; PK membership kept in field metadata so
    column pruning can protect PK columns (encoder/json.go:344-373)."""
    fields = []
    for c in sorted(ts.columns, key=lambda c: c.ordinal):
        fields.append(
            T.StructField(
                c.name,
                mysql_to_spark_type(c.data_type, c.column_type,
                                    c.numeric_precision, c.numeric_scale),
                nullable=c.nullable,
                metadata={"primary_key": c.key == "PRI",
                          "mysql_type": c.column_type or c.data_type},
            )
        )
    return T.StructType(fields)


def struct_to_avro_schema(ts: TableSchema, namespace: str = "storagetapper",
                          schema_version: int = 1) -> dict:
    """Build the Avro output schema dict (types/avro.go:45-62) with the
    three metadata fields the reference injects (encoder/avro.go:35):
    row_key (bytes), ref_key (long = seqno), is_deleted (boolean)."""
    fields = []
    for c in sorted(ts.columns, key=lambda c: c.ordinal):
        avro_t = mysql_to_avro_type(c.data_type, c.column_type)
        # every field is a union-with-null (mysql_avro_schema_converter.go:97)
        fields.append({"name": c.name, "type": ["null", avro_t], "default": None})
    for name, t in (("row_key", "bytes"), ("ref_key", "long"), ("is_deleted", "boolean")):
        fields.append({"name": name, "type": ["null", t], "default": None})
    return {
        "type": "record",
        "name": ts.table,
        "namespace": f"{namespace}.{ts.db}",
        "schema_version": schema_version,
        "fields": fields,
    }


def spark_type_to_mysql(dt: T.DataType) -> tuple[str, str]:
    """Spark DataType → (mysql data_type, column_type) — the inverse of
    mysql_to_spark_type, used when a registration's source is a Spark
    DataFrame (parquet snapshot) rather than a described MySQL table.
    Lossless for every type the engine emits; decimal keeps its
    precision/scale in the column_type string."""
    if isinstance(dt, T.BooleanType):
        return "tinyint", "tinyint(1)"
    if isinstance(dt, T.ByteType):
        return "tinyint", "tinyint"
    if isinstance(dt, (T.ShortType, T.IntegerType)):
        return "int", "int"
    if isinstance(dt, T.LongType):
        return "bigint", "bigint"
    if isinstance(dt, T.FloatType):
        return "float", "float"
    if isinstance(dt, T.DoubleType):
        return "double", "double"
    if isinstance(dt, T.DecimalType):
        return "decimal", f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.BinaryType):
        return "blob", "blob"
    if isinstance(dt, T.DateType):
        return "date", "date"
    if isinstance(dt, T.TimestampType):
        return "datetime", "datetime"
    return "varchar", "varchar"


def struct_to_table_schema(schema: T.StructType, db: str, table: str,
                           pk_cols: list[str]) -> TableSchema:
    """Spark StructType → TableSchema, so the Avro output schema can be
    derived for ANY registered source frame (the schema the snapshot
    path pushes before its first row, streamer/snapshot.go:231-234)."""
    cols = []
    for i, f in enumerate(schema.fields, start=1):
        data_type, column_type = spark_type_to_mysql(f.dataType)
        prec = scale = None
        if isinstance(f.dataType, T.DecimalType):
            prec, scale = f.dataType.precision, f.dataType.scale
        cols.append(ColumnSchema(
            f.name, data_type, column_type, ordinal=i, nullable=f.nullable,
            numeric_precision=prec, numeric_scale=scale,
            key="PRI" if f.name in pk_cols else ""))
    return TableSchema(db, table, cols)
