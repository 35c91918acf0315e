"""Streaming query monitoring + watchdog (O9, changelog/mysql.go:885-908).

The reference's watchdog kills a changelog reader that has made no
progress within an interval; Spark's StreamingQueryListener gives the
same signal without polling the source.  ``Watchdog`` records progress
events and stops queries that stall past the deadline — the driver
restarts them (the reference's worker loop does the same)."""

from __future__ import annotations

import time

from pyspark.sql.streaming import StreamingQueryListener

#: reference default watchdog interval (config/config.go:207)
DEFAULT_STALL_SEC = 300.0


class ProgressRecorder(StreamingQueryListener):
    """Collects per-query progress: rows/sec, batch durations, last
    activity timestamp."""

    def __init__(self):
        self.progress: dict[str, dict] = {}

    def onQueryStarted(self, event):
        self.progress[str(event.id)] = {"started_at": time.time(),
                                        "last_progress_at": time.time(),
                                        "batches": 0, "rows": 0}

    def onQueryProgress(self, event):
        p = self.progress.setdefault(str(event.progress.id),
                                     {"started_at": time.time(),
                                      "batches": 0, "rows": 0})
        p["last_progress_at"] = time.time()
        p["batches"] += 1
        p["rows"] += event.progress.numInputRows or 0
        p["input_rows_per_sec"] = event.progress.inputRowsPerSecond
        # content metrics attached via with_feed_metrics (df.observe)
        try:
            om = event.progress.observedMetrics or {}
        except Exception:  # pragma: no cover - py4j shape drift
            om = {}
        for mname, row in dict(om).items():
            agg = p.setdefault("observed", {}).setdefault(
                mname, {"rows": 0, "max_seqno": None, "deletes": 0})
            d = row.asDict()
            agg["rows"] += d.get("rows") or 0
            agg["deletes"] += d.get("deletes") or 0
            if d.get("max_seqno") is not None:
                agg["max_seqno"] = max(agg["max_seqno"] or d["max_seqno"],
                                       d["max_seqno"])
        # stateful-operator telemetry (conflation/evolution sinks):
        # state rows + memory bound the applyInPandasWithState store;
        # output/input ratio is the conflation ratio (1.0 = no benefit)
        try:
            ops = event.progress.stateOperators or []
        except Exception:  # pragma: no cover - py4j shape drift
            ops = []
        if ops:
            p["state_rows"] = sum((o.numRowsTotal or 0) for o in ops)
            p["state_memory_bytes"] = sum(
                (o.memoryUsedBytes or 0) for o in ops)
            out_rows = sum((o.numRowsUpdated or 0) for o in ops)
            if event.progress.numInputRows:
                p["conflation_ratio"] = round(
                    out_rows / event.progress.numInputRows, 4)

    def onQueryTerminated(self, event):
        p = self.progress.get(str(event.id))
        if p is not None:
            p["terminated_at"] = time.time()

    def onQueryIdle(self, event):
        p = self.progress.get(str(event.id))
        if p is not None:
            p["last_progress_at"] = time.time()


class Watchdog:
    """Stop queries that made no progress within ``stall_sec``; the
    caller's restart loop re-creates them from checkpoints."""

    def __init__(self, recorder: ProgressRecorder,
                 stall_sec: float = DEFAULT_STALL_SEC):
        self.recorder = recorder
        self.stall_sec = stall_sec

    def stalled(self, now: float | None = None) -> list[str]:
        now = time.time() if now is None else now
        out = []
        for qid, p in self.recorder.progress.items():
            if "terminated_at" in p:
                continue
            if now - p.get("last_progress_at", p["started_at"]) > self.stall_sec:
                out.append(qid)
        return out

    def enforce(self, spark, now: float | None = None) -> list[str]:
        stalled = set(self.stalled(now))
        stopped = []
        for q in spark.streams.active:
            if str(q.id) in stalled:
                q.stop()
                stopped.append(str(q.id))
        return stopped


def with_feed_metrics(stream, name: str = "feed",
                      seqno_col: str = "seqno", op_col: str = "op"):
    """Attach content-level observed metrics to a changelog stream —
    the validation half of O9 (the Watchdog checks liveness; this checks
    WHAT flowed): rows, max seqno (progress position), delete share.
    Metrics ride the micro-batch (df.observe — aggregated on executors,
    no extra pass) and surface in each progress event's observedMetrics,
    captured by ProgressRecorder."""
    from pyspark.sql import functions as F

    return stream.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.max(F.col(seqno_col)).alias("max_seqno"),
        F.sum((F.col(op_col) == "delete").cast("long")).alias("deletes"))
