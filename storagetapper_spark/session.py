"""SparkSession factory tuned for this engine.

Defaults are chosen for the local[N] test harness but the knobs are the
same ones that matter on a 1000-executor cluster: AQE on (runtime
re-planning, skew-join splitting, partition coalescing), a shuffle
partition count sized to the cluster (here: cores), and Arrow enabled so
any Pandas-UDF path is batch-vectorized rather than row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "storagetapper-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime coalescing of shuffle partitions, skew-join handling.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # One shuffle partition per core locally; on a real cluster this is
        # sized to 2-3x total cores and AQE coalesces down.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables (region/nation/supplier/part at any SF that fits)
        # should broadcast; 64 MiB threshold covers TPC-H dims at sf<=10.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # keep managed (bucketed) tables out of the repo working dir
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark-warehouse"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict:
    """Load the driver parquet fixtures and register temp views.

    Stand-in for the reference's snapshot source (snapshot/mysql.go:70-133);
    on a real deployment this is spark.read.jdbc with partitionColumn=pk.
    """
    names = tables or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            df = spark.read.parquet(path)
            df.createOrReplaceTempView(name)
            out[name] = df
    return out
