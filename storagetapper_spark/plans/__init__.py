from storagetapper_spark.plans.registry import QUERIES, ORACLES, run_query  # noqa: F401
