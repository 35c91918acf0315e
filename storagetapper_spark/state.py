"""Job/state registry — the reference's MySQL state DB collapsed to a
driver-side metadata store (SURVEY.md §2.5 O6-O8, state/manager.go,
state/state.go).

The reference needs 7 state tables, SELECT..FOR UPDATE work-claiming,
GET_LOCK cluster locks and a lease protocol because N independent worker
processes coordinate through MySQL.  On Spark the driver is the single
coordinator and executors are stateless, so the registry reduces to:
table registrations (user intent), per-table schema + snapshot schedule,
and stream offsets — persisted as JSON for restart survival.
Checkpointing of stream positions (the GTID analog) belongs to
Structured Streaming checkpoints, not this registry.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class TableRegistration:
    """registrations/state row analog (state/state.go:53-69): identifies
    one (service, cluster, db, table, input, output, version) stream."""

    service: str
    cluster: str
    db: str
    table: str
    input_fmt: str = "parquet"  # reference: "mysql"
    output: str = "file"
    output_format: str = "json"
    version: int = 0
    params: dict = field(default_factory=dict)
    pk_cols: list = field(default_factory=list)
    # snapshot scheduling (O7, state/state.go:74-81)
    snapshot_interval_sec: int = 0  # 0 = snapshot once
    snapshotted_at: float = 0.0
    need_snapshot: bool = True
    # schema registry (S4): current StructType as JSON + version
    schema_json: str | None = None
    schema_version: int = 0
    # stream resume point — the GTID-set persistence analog
    # (changelog/mysql.go:1019-1043): recorded BEFORE the snapshot begins
    # (streamer/streamer.go:67-103) so a RE-CREATED stream (e.g. lost
    # checkpoint) restarts from a known-safe position instead of
    # "latest", preserving the gap-free handoff.  Source-specific JSON:
    # Kafka startingOffsets, or a file-feed watermark.
    stream_start_offsets: str | None = None
    stream_started_at: float = 0.0

    @property
    def key(self) -> str:
        return f"{self.service}.{self.cluster}.{self.db}.{self.table}.v{self.version}"

    def topic(self, template: str = "{service}.{db}.{table}.v{version}") -> str:
        """Output topic/path name (config/topic.go:46-73 analog)."""
        return template.format(service=self.service, cluster=self.cluster,
                               db=self.db, table=self.table,
                               version=self.version)


class Registry:
    """JSON-file registry with the reference's lifecycle verbs:
    register/deregister (table_handler.go:245-277), snapshot scheduling
    (TimeForSnapshot/ClearNeedSnapshot, state/state.go:74-81,389-401),
    schema versioning (state/state.go:451-475)."""

    def __init__(self, path: str):
        self.path = path
        self._tables: dict[str, TableRegistration] = {}
        if os.path.exists(path):
            with open(path) as f:
                for k, v in json.load(f).items():
                    self._tables[k] = TableRegistration(**v)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({k: asdict(v) for k, v in self._tables.items()}, f, indent=1)
        os.replace(tmp, self.path)  # atomic, like the reference's txn commit

    def register(self, reg: TableRegistration) -> TableRegistration:
        """INSERT..ON DUPLICATE KEY semantics (state/state.go:633-654);
        re-registering an existing key updates it in place."""
        self._tables[reg.key] = reg
        self._save()
        return reg

    def deregister(self, key: str) -> bool:
        if key in self._tables:
            del self._tables[key]
            self._save()
            return True
        return False

    def get(self, key: str) -> TableRegistration | None:
        return self._tables.get(key)

    def list(self, service: str | None = None, db: str | None = None) -> list[TableRegistration]:
        out = [t for t in self._tables.values()
               if (service is None or t.service == service)
               and (db is None or t.db == db)]
        return sorted(out, key=lambda t: t.key)

    # --- snapshot scheduling (O7) --------------------------------------

    def tables_needing_snapshot(self, now: float | None = None) -> list[TableRegistration]:
        now = time.time() if now is None else now
        due = []
        for t in self._tables.values():
            if t.need_snapshot:
                due.append(t)
            elif t.snapshot_interval_sec and now - t.snapshotted_at >= t.snapshot_interval_sec:
                due.append(t)
        return sorted(due, key=lambda t: t.key)

    def clear_need_snapshot(self, key: str, now: float | None = None) -> None:
        """ClearNeedSnapshot analog (state/state.go:389-401)."""
        t = self._tables[key]
        t.need_snapshot = False
        t.snapshotted_at = time.time() if now is None else now
        self._save()

    # --- stream resume point (GTID analog) -----------------------------

    def record_stream_start(self, key: str, offsets_json: str,
                            now: float | None = None) -> None:
        """Persist the changelog start position (changelog/mysql.go:
        1019-1043 writes the GTID set; here, e.g. the Kafka
        ``startingOffsets`` JSON).  Call BEFORE the snapshot read — the
        ordering that makes the handoff gap-free (O1)."""
        t = self._tables[key]
        t.stream_start_offsets = offsets_json
        t.stream_started_at = time.time() if now is None else now
        self._save()

    def stream_resume_point(self, key: str) -> str | None:
        """Resume position for a re-created stream; None = no recorded
        start (fall back to 'earliest', never 'latest', to stay safe)."""
        t = self._tables.get(key)
        return t.stream_start_offsets if t else None

    # --- schema registry (S4) ------------------------------------------

    def update_schema(self, key: str, schema_json: str) -> int:
        """Persist a post-ALTER schema; bumps schema_version — the GTID
        tagging of state/state.go:451-475 collapses to this counter."""
        t = self._tables[key]
        t.schema_json = schema_json
        t.schema_version += 1
        self._save()
        return t.schema_version
