from storagetapper_spark.sinks.files import write_files, read_manifest  # noqa: F401
