"""Type-fidelity tests over the all-types table (FIXTURES.md §F2,
encoder/encoder_test.go:114-133)."""

from pyspark.sql import types as T

from storagetapper_spark.schema.mysql_types import (
    ColumnSchema,
    TableSchema,
    mysql_to_avro_type,
    mysql_to_spark_type,
    struct_to_avro_schema,
    table_schema_to_struct,
)

# the 18-column all-MySQL-types table from encoder_test.go:114-133
ALL_TYPES = TableSchema("db1", "t2", [
    ColumnSchema("f1", "bigint", "bigint", 1, False, key="PRI"),
    ColumnSchema("f2", "char", "char(16)", 2),
    ColumnSchema("f3", "varchar", "varchar(32)", 3),
    ColumnSchema("f4", "text", "text", 4),
    ColumnSchema("f5", "timestamp", "timestamp", 5),
    ColumnSchema("f6", "date", "date", 6),
    ColumnSchema("f7", "time", "time", 7),
    ColumnSchema("f8", "year", "year(4)", 8),
    ColumnSchema("f9", "bigint", "bigint", 9),
    ColumnSchema("f10", "binary", "binary(1)", 10),
    ColumnSchema("f11", "int", "int(11)", 11),
    ColumnSchema("f12", "float", "float", 12),
    ColumnSchema("f13", "double", "double", 13),
    ColumnSchema("f14", "decimal", "decimal(10,0)", 14, numeric_precision=10, numeric_scale=0),
    ColumnSchema("f15", "numeric", "numeric(10,0)", 15, numeric_precision=10, numeric_scale=0),
    ColumnSchema("f16", "datetime", "datetime", 16),
    ColumnSchema("f17", "tinyint", "tinyint(1)", 17),
    ColumnSchema("f18", "json", "json", 18),
])


def test_spark_type_map():
    st = table_schema_to_struct(ALL_TYPES)
    got = {f.name: f.dataType for f in st.fields}
    assert got["f1"] == T.LongType()
    assert got["f2"] == T.StringType()
    assert got["f4"] == T.StringType()
    assert got["f5"] == T.TimestampType()
    assert got["f6"] == T.DateType()
    assert got["f7"] == T.StringType()       # TIME is string-typed
    assert got["f8"] == T.IntegerType()      # YEAR
    assert got["f10"] == T.BinaryType()
    assert got["f12"] == T.FloatType()
    assert got["f14"] == T.DecimalType(10, 0)  # improved over lossy double
    assert got["f17"] == T.BooleanType()     # tinyint(1) is boolean
    assert got["f18"] == T.StringType()      # json passes through as string


def test_pk_metadata_protected():
    st = table_schema_to_struct(ALL_TYPES)
    assert st["f1"].metadata["primary_key"] is True
    assert st["f2"].metadata["primary_key"] is False


def test_tinyint_widths():
    assert mysql_to_spark_type("tinyint", "tinyint(1)") == T.BooleanType()
    assert mysql_to_spark_type("tinyint", "tinyint(4)") == T.ByteType()
    assert mysql_to_spark_type("tinyint", "tinyint(1) unsigned") == T.BooleanType()


def test_avro_type_map():
    # mysql_avro_schema_converter.go:37-77
    assert mysql_to_avro_type("int") == "int"
    assert mysql_to_avro_type("bigint") == "long"
    assert mysql_to_avro_type("float") == "float"
    assert mysql_to_avro_type("double") == "double"
    assert mysql_to_avro_type("decimal") == "double"  # documented lossy quirk
    assert mysql_to_avro_type("blob") == "bytes"
    assert mysql_to_avro_type("datetime") == "long"   # epoch-ms
    assert mysql_to_avro_type("timestamp") == "long"
    assert mysql_to_avro_type("year") == "int"
    assert mysql_to_avro_type("tinyint", "tinyint(1)") == "boolean"
    assert mysql_to_avro_type("json") == "string"


def test_avro_schema_structure():
    avsc = struct_to_avro_schema(ALL_TYPES)
    names = [f["name"] for f in avsc["fields"]]
    # three injected metadata fields, in order (encoder/avro.go:35)
    assert names[-3:] == ["row_key", "ref_key", "is_deleted"]
    # every field is a [null, T] union (mysql_avro_schema_converter.go:97)
    assert all(isinstance(f["type"], list) and f["type"][0] == "null"
               for f in avsc["fields"])
    assert avsc["namespace"] == "storagetapper.db1"


def test_primary_key_ordering():
    ts = TableSchema("d", "t", [
        ColumnSchema("b", "int", "int", 2, key="PRI"),
        ColumnSchema("a", "int", "int", 1, key="PRI"),
        ColumnSchema("c", "int", "int", 3),
    ])
    assert ts.primary_key == ["a", "b"]


def test_schema_diff_replays_to_target():
    from pyspark.sql import types as T

    from storagetapper_spark.schema.evolution import apply_change, schema_diff

    old = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.IntegerType()),
        T.StructField("gone", T.DateType()),
    ])
    new = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),      # retyped
        T.StructField("added_at", T.TimestampType()),  # added
    ])
    changes = schema_diff(old, new)
    kinds = sorted((c.kind, c.column) for c in changes)
    assert ("drop", "gone") in kinds
    assert ("add", "added_at") in kinds
    assert ("drop", "score") in kinds and ("add", "score") in kinds

    cur = old
    for c in changes:
        cur = apply_change(cur, c)
    assert {f.name: f.dataType for f in cur.fields} == \
        {f.name: f.dataType for f in new.fields}


def test_schema_diff_identical_schemas_is_empty():
    from pyspark.sql import types as T

    from storagetapper_spark.schema.evolution import schema_diff

    s = T.StructType([T.StructField("a", T.LongType()),
                      T.StructField("b", T.StringType())])
    reordered = T.StructType([T.StructField("b", T.StringType()),
                              T.StructField("a", T.LongType())])
    assert schema_diff(s, s) == []
    assert schema_diff(s, reordered) == []  # order is not drift
