from storagetapper_spark.sources.snapshot import (  # noqa: F401
    RowFilter,
    snapshot_scan,
    apply_row_filters,
    prune_columns,
)
from storagetapper_spark.sources.changelog import (  # noqa: F401
    events_as_changelog,
    decompose_updates,
)
