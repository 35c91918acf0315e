"""MySQL GTID-set resume semantics for the changelog source — the
Spark-first analog of the reference's binlog resume bookkeeping
(changelog/mysql.go:718-752 ``incGTID`` interval maintenance,
:1019-1043 start-from-saved-set, :398-420 periodic
``SaveBinlogState(SortedGTIDString(gtidSet), seqNo)``).

The reference tracks an EXECUTED GTID SET — per server-uuid interval
lists like ``uuid:1-5:7-9`` — extends the last interval on sequential
events, opens a new interval on gaps, and resumes replication by
asking the server for everything NOT in the set.  No live binlog
exists in this environment, so the resume contract is expressed over
any changelog DataFrame carrying a ``gtid`` column of per-event
``uuid:gno`` strings (what sources/debezium.py normalizes out of
Debezium envelopes):

- :class:`GTIDSet` — the pure interval-set state (parse / add / merge
  / contains / sorted canonical string), small enough to live next to
  the stream offsets in state.Registry.record_stream_start.
- :func:`executed_intervals` — the DISTRIBUTED fold of a batch's
  GTIDs into intervals (classic gaps-and-islands: one window pass
  partitioned by uuid, then a groupBy — no driver-side per-event
  loop, so a 100 TB backfill batch folds in one shuffle and collects
  only its interval endpoints).
- :func:`fold_batch` — merge a batch's intervals into the saved set
  (the periodic-save discipline; call it from foreachBatch).
- :func:`filter_unexecuted` — the resume filter: broadcast-anti-join
  the saved set's intervals so an at-least-once redelivery of
  already-applied transactions is dropped BEFORE the sink, making
  resume idempotent by construction.  Events inside interval GAPS are
  kept — a gap means that transaction was never applied (the
  non-sequential-gtid case the reference logs at mysql.go:747).
"""

from __future__ import annotations

import logging

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class GTIDSet:
    """Executed-GTID interval set: {server_uuid: [(start, stop)], ...}
    with closed intervals, kept sorted and coalesced (the invariant
    mysql.MysqlGTIDSet maintains)."""

    sets: dict[str, list[tuple[int, int]]] = field(default_factory=dict)

    # -- construction -----------------------------------------------------
    @classmethod
    def parse(cls, s: str) -> "GTIDSet":
        """Parse the MySQL GTID-set grammar: comma-separated
        ``uuid:a-b:c:d-e`` groups (a bare ``c`` is the interval c-c)."""
        out = cls()
        for part in filter(None, (p.strip() for p in s.split(","))):
            uuid, *ranges = part.split(":")
            if not ranges:
                raise ValueError(f"GTID group without ranges: {part!r}")
            for r in ranges:
                a, _, b = r.partition("-")
                start, stop = int(a), int(b) if b else int(a)
                if stop < start:
                    raise ValueError(f"inverted GTID interval: {r!r}")
                out._insert(uuid.lower(), start, stop)
        return out

    def to_string(self) -> str:
        """Canonical sorted form (util.SortedGTIDString analog): groups
        sorted by uuid, intervals ascending, singletons collapsed."""
        groups = []
        for uuid in sorted(self.sets):
            ivs = ":".join(f"{a}-{b}" if b > a else f"{a}"
                           for a, b in self.sets[uuid])
            groups.append(f"{uuid}:{ivs}")
        return ",".join(groups)

    # -- mutation ---------------------------------------------------------
    def _insert(self, uuid: str, start: int, stop: int) -> None:
        """Insert [start, stop], keeping intervals sorted, disjoint and
        coalesced (adjacent intervals merge: 1-3 + 4-5 == 1-5)."""
        ivs = self.sets.setdefault(uuid, [])
        ivs.append((start, stop))
        ivs.sort()
        merged: list[tuple[int, int]] = []
        for a, b in ivs:
            if merged and a <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], b))
            else:
                merged.append((a, b))
        self.sets[uuid] = merged

    def add(self, uuid: str, gno: int) -> None:
        """Record one executed transaction — the incGTID step: extends
        the containing/adjacent interval or opens a new one on a gap
        (mysql.go:729-745)."""
        self._insert(uuid.lower(), gno, gno)

    def merge(self, other: "GTIDSet") -> "GTIDSet":
        """Union with another set (fold of a batch into the state)."""
        out = GTIDSet({u: list(ivs) for u, ivs in self.sets.items()})
        for uuid, ivs in other.sets.items():
            for a, b in ivs:
                out._insert(uuid, a, b)
        return out

    # -- queries ----------------------------------------------------------
    def contains(self, uuid: str, gno: int) -> bool:
        import bisect
        ivs = self.sets.get(uuid.lower(), [])
        i = bisect.bisect_right(ivs, (gno, float("inf"))) - 1
        return i >= 0 and ivs[i][0] <= gno <= ivs[i][1]

    def intervals(self) -> list[tuple[str, int, int]]:
        return [(u, a, b) for u in sorted(self.sets)
                for a, b in self.sets[u]]


def _parsed(df: DataFrame, gtid_col: str):
    uuid = F.lower(F.substring_index(F.col(gtid_col), ":", 1))
    # try_cast: a malformed gtid (no numeric ':gno' suffix) yields a
    # NULL gno for the callers to drop/count — a plain cast under ANSI
    # mode would fail the whole job on one bad event
    gno = F.substring_index(F.col(gtid_col), ":", -1).try_cast("long")
    return uuid, gno


def executed_intervals(df: DataFrame, gtid_col: str = "gtid", *,
                       malformed_marker: bool = False) -> DataFrame:
    """Distributed gaps-and-islands fold of a batch's per-event GTIDs
    into (uuid, start_gno, stop_gno) intervals: distinct (uuid, gno),
    one window pass partitioned by uuid ordered by gno (gno −
    row_number is constant within a consecutive run), then a groupBy.
    Output is one row per island — the only data that ever reaches the
    driver, bounded by the batch's gap count, not its row count.
    Malformed GTIDs (no numeric ``:gno`` suffix) parse to a NULL gno
    and are dropped here — they carry no position to track.  With
    ``malformed_marker=True`` one extra row (uuid NULL, start_gno =
    count of NULL-gno input rows, stop_gno NULL) is unioned in, so a
    caller that must account for them (fold_batch warns) gets the
    count from the SAME action instead of re-scanning the batch with
    a second count() job."""
    uuid, gno = _parsed(df, gtid_col)
    raw = df.select(uuid.alias("uuid"), gno.alias("gno"))
    pairs = raw.filter(F.col("gno").isNotNull()).distinct()
    w = Window.partitionBy("uuid").orderBy("gno")
    islands = pairs.withColumn(
        "island", F.col("gno") - F.row_number().over(w))
    out = (islands.groupBy("uuid", "island")
           .agg(F.min("gno").alias("start_gno"),
                F.max("gno").alias("stop_gno"))
           .select("uuid", "start_gno", "stop_gno"))
    if malformed_marker:
        # a key-less aggregate always yields exactly one row (0 when
        # the batch has no malformed rows)
        marker = (raw.filter(F.col("gno").isNull())
                  .agg(F.count(F.lit(1)).cast("long").alias("start_gno"))
                  .select(F.lit(None).cast("string").alias("uuid"),
                          "start_gno",
                          F.lit(None).cast("long").alias("stop_gno")))
        out = out.unionByName(marker)
    return out


def fold_batch(state: GTIDSet, batch: DataFrame,
               gtid_col: str = "gtid") -> GTIDSet:
    """Merge one applied batch's GTIDs into the saved executed set —
    the SaveBinlogState step (mysql.go:398-420); persist
    ``result.to_string()`` next to the stream offsets (e.g. via
    state.Registry.record_stream_start) after the batch's sink write
    commits, in that order, so a crash between the two replays rather
    than skips.  Rows whose GTID is malformed (NULL parsed gno) can't
    be folded into the set; they are counted and WARNED about rather
    than crashing the micro-batch — the reference's tolerance for
    non-sequential/unparseable events (mysql.go:747 logs and
    continues)."""
    add = GTIDSet()
    n_malformed = 0
    # one action: the NULL-uuid marker row carries the malformed count,
    # so the common no-malformed case costs no extra batch scan
    for r in executed_intervals(batch, gtid_col,
                                malformed_marker=True).collect():
        if r["uuid"] is None:
            n_malformed = int(r["start_gno"])
            continue
        add._insert(r["uuid"], int(r["start_gno"]), int(r["stop_gno"]))
    if n_malformed:
        logging.getLogger(__name__).warning(
            "fold_batch: %d rows carry a malformed %s (no numeric "
            "':gno' suffix) and were not folded into the executed set",
            n_malformed, gtid_col)
    return state.merge(add)


def filter_unexecuted(df: DataFrame, state: GTIDSet,
                      gtid_col: str = "gtid") -> DataFrame:
    """Drop rows whose GTID the saved set already contains — the
    resume filter that makes at-least-once redelivery idempotent.
    The set's intervals become a broadcast DataFrame; containment is a
    LEFT ANTI join on uuid + BETWEEN, so the filter is one broadcast
    hash join however large the replayed backlog is.  An empty state
    passes everything (first start: mysql.go:1026-1035 seeds from the
    master instead)."""
    ivs = state.intervals()
    if not ivs:
        return df
    spark = SparkSession.getActiveSession() or df.sparkSession
    bounds = spark.createDataFrame(
        ivs, "uuid string, start_gno long, stop_gno long")
    uuid, gno = _parsed(df, gtid_col)
    probe = df.withColumn("_g_uuid", uuid).withColumn("_g_gno", gno)
    kept = probe.join(
        F.broadcast(bounds),
        (probe["_g_uuid"] == bounds["uuid"])
        & (probe["_g_gno"] >= bounds["start_gno"])
        & (probe["_g_gno"] <= bounds["stop_gno"]),
        "left_anti")
    return kept.drop("_g_uuid", "_g_gno")
