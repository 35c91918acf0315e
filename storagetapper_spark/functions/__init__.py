from storagetapper_spark.functions.keys import row_key_expr, partition_key_expr  # noqa: F401
