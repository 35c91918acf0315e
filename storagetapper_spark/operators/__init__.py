from storagetapper_spark.operators.merge import (  # noqa: F401
    latest_state,
    snapshot_changelog_merge,
    idempotent_upsert,
)
