from storagetapper_spark.streaming.pipeline import (  # noqa: F401
    read_changelog_stream,
    incremental_upsert_sink,
    windowed_event_counts,
    streaming_dedup,
)
