from storagetapper_spark.schema.mysql_types import (  # noqa: F401
    mysql_to_spark_type,
    mysql_to_avro_type,
    table_schema_to_struct,
    ColumnSchema,
    TableSchema,
)
from storagetapper_spark.schema.commonformat import (  # noqa: F401
    COMMON_FORMAT_SCHEMA,
    common_format_struct,
)
