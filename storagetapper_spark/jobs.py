"""Job lifecycle orchestration — SURVEY.md §3 entry points as functions.

Entry point A (register):   Registry.register (state.py)
Entry point B (snapshot):   run_snapshot_job below — claim → scan →
                            encode → sink → manifest → clear_need_snapshot
                            (streamer/streamer.go:313-316 collapsed)
Entry point C (changelog):  streaming.pipeline / streaming.buffered

The reference's claim/lease/lock machinery disappears: the driver owns
the registry, Spark owns distribution.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.functions.json_codec import encode_json
from storagetapper_spark.sinks.files import write_files
from storagetapper_spark.sources.snapshot import RowFilter, snapshot_scan
from storagetapper_spark.state import Registry, TableRegistration


def run_snapshot_job(spark: SparkSession, registry: Registry,
                     reg: TableRegistration, source_df: DataFrame,
                     output_root: str,
                     filters: list[RowFilter] | None = None,
                     output_columns: list[str] | None = None,
                     sort_within_files: bool = True,
                     compression: str | None = "gzip",
                     max_records_per_file: int = 0,
                     config: dict | None = None) -> dict:
    """The §3.2 snapshot path, end-to-end:

    1. snapshot scan: op='insert', seqno=-1, row_key (S1)
    2. row filters + PK-protected output-schema pruning (P1/P2)
    3. key-ordered output within files (the FORCE INDEX (primary)
       key-contiguity property, via sortWithinPartitions)
    4. common-format encode per the registration's output format
    5. file sink with rotation + _DONE manifest (F1)
    6. registry bookkeeping: ClearNeedSnapshot (O7)

    Returns the sink manifest.

    ``config``: a merged layered config (storagetapper_spark.config);
    per-table params (reg.params) are applied on top here, and the
    pipe knobs (compression, rotation bytes) override the keyword
    defaults — the config/config.go → per-registration flow.
    """
    if config is not None:
        from storagetapper_spark.config import for_table, spark_writer_options

        opts = spark_writer_options(for_table(config, reg.params))
        compression = ("gzip" if opts["compression"] == "gzip" else None)
    # encoder.Create analog (encoder/encoder.go:91-97): resolve the
    # registration's output format through the codec registry — any
    # registered format (json/avro/msgpack/plugins) snapshots.
    from storagetapper_spark.functions import registry as codecs

    codec = codecs.create(reg.output_format)
    snap = snapshot_scan(source_df, pk_cols=reg.pk_cols, filters=filters,
                         output_columns=output_columns)
    if sort_within_files:
        # Range-partition on the PK before the per-file sort: output files
        # stay globally key-clustered (the FORCE INDEX (primary) property,
        # snapshot/mysql.go:71) AND encode+gzip parallelize across all
        # cores — a small source parquet otherwise arrives as ONE input
        # split and the whole encode runs in a single task (measured
        # 48k → 85k rows/s end-to-end for 600k rows at sf0.1).
        par = snap.sparkSession.sparkContext.defaultParallelism
        snap = (snap.repartitionByRange(par, *reg.pk_cols)
                    .sortWithinPartitions(*reg.pk_cols))
    codec_kw: dict = {}
    schema_doc: str | None = None
    if codec.name == "avro":
        import json as _json

        from storagetapper_spark.schema.mysql_types import (
            struct_to_avro_schema,
            struct_to_table_schema,
        )

        data = snap.drop("op", "seqno", "ts", "row_key")
        ts_schema = struct_to_table_schema(
            data.schema, reg.db, reg.table, reg.pk_cols)
        codec_kw["avro_schema"] = struct_to_avro_schema(ts_schema)
        schema_doc = _json.dumps(codec_kw["avro_schema"], indent=1)
    elif codec.name == "msgpack":
        import json as _json

        # common-format events carry field names per record; the schema
        # doc mirrors what the reference's schema-first message conveys
        schema_doc = _json.dumps({
            "db": reg.db, "table": reg.table, "pk": reg.pk_cols,
            "columns": [{"name": f.name, "type": f.dataType.simpleString()}
                        for f in snap.drop("op", "seqno", "ts",
                                           "row_key").schema.fields]},
            indent=1)
    encoded = (encode_json(snap, pk_cols=reg.pk_cols)
               if codec.name == "json"
               else codec.encode(snap, reg.pk_cols, **codec_kw))
    out_dir = os.path.join(output_root, reg.topic())
    # json → newline text (reference file pipe shape); binary codecs →
    # parquet binary `value` column (the splittable Spark container for
    # opaque record bytes — each cell holds the exact codec wire bytes)
    manifest = write_files(encoded, out_dir,
                           fmt="text" if codec.name == "json" else "parquet",
                           compression=compression,
                           max_records_per_file=max_records_per_file,
                           write_manifest=False)
    # Schema precedes consumability (streamer/snapshot.go:231-234 pushes
    # the schema message before the first row): the _SCHEMA doc lands
    # before _DONE, so a consumer gated on the manifest always finds it.
    if schema_doc is not None:
        with open(os.path.join(out_dir, "_SCHEMA"), "w") as f:
            f.write(schema_doc)
    from storagetapper_spark.sinks.files import _write_manifest_distributed

    manifest = _write_manifest_distributed(spark, out_dir)
    registry.clear_need_snapshot(reg.key)
    return manifest


def run_table_pipeline(spark: SparkSession, registry: Registry,
                       reg: TableRegistration, source_df: DataFrame,
                       feed_path: str, feed_schema, state_dir: str,
                       checkpoint_dir: str) -> dict:
    """Entry point B+C combined — the streamer.Worker analog
    (streamer/streamer.go:313-316): consistent snapshot seeding a
    latest-state store, then the changelog stream draining over it,
    with the gap-free handoff protocol (O1) in the reference's order:

    1. RECORD THE STREAM START before reading the snapshot
       (Registry.record_stream_start, the GTID-wait collapse — any
       event from here on is guaranteed to be replayed by step 3).
    2. Snapshot with seqno = SNAPSHOT_SEQNO (-1) written as the initial
       state, so every changelog event supersedes snapshot rows.
    3. Stream the changelog feed from the recorded start through the
       seqno-guarded upsert sink; max-seqno-wins makes overlap between
       buffered events and the snapshot harmless.

    Returns {"snapshot_rows": n, "stream_id": query id}.  The stream is
    started with availableNow (drains current feed, then stops) — call
    again or run continuously for tailing.
    """
    import json as _json
    import time as _time

    from storagetapper_spark.streaming.pipeline import (
        incremental_upsert_sink,
        read_changelog_stream,
    )

    # 1. GTID analog: persist the resume point BEFORE the snapshot
    registry.record_stream_start(
        reg.key, _json.dumps({"feed": feed_path, "position": "earliest",
                              "recorded_at": _time.time()}))

    # 2. snapshot (op=insert, seqno=-1, row filters/pruning as configured)
    snap = snapshot_scan(source_df, pk_cols=reg.pk_cols)
    cur = os.path.join(state_dir, "current")
    cols = [f.name for f in feed_schema.fields]
    snap_out = snap.select(*cols)
    snap_out.write.mode("overwrite").parquet(cur)
    n_snap = spark.read.parquet(cur).count()
    registry.clear_need_snapshot(reg.key)

    # 3. drain the changelog from the recorded start over the snapshot
    q = incremental_upsert_sink(
        read_changelog_stream(spark, feed_path, feed_schema),
        state_dir, checkpoint_dir, pk_cols=reg.pk_cols)
    q.awaitTermination(600)
    return {"snapshot_rows": n_snap, "stream_id": str(q.id)}


def run_due_snapshots(spark: SparkSession, registry: Registry,
                      source_loader, output_root: str,
                      now: float | None = None) -> dict[str, dict]:
    """Periodic-snapshot driver loop (O7): snapshot every due table.
    ``source_loader(reg) -> DataFrame`` resolves a registration to its
    source frame (parquet fixture locally, JDBC in production)."""
    results = {}
    for reg in registry.tables_needing_snapshot(now=now):
        results[reg.key] = run_snapshot_job(
            spark, registry, reg, source_loader(reg), output_root)
    return results


def run_due_snapshots_parallel(spark: SparkSession, registry: Registry,
                               source_loader, output_root: str,
                               now: float | None = None,
                               max_workers: int = 8) -> dict[str, dict]:
    """Concurrent form of the snapshot loop — the reference's worker
    pool (pool/pool.go:52-96, NumCPU workers each claiming a table)
    mapped to Spark: N driver threads submit independent jobs and the
    fair scheduler interleaves their stages across executors.  Small
    tables no longer serialize behind big ones; per-table failures are
    isolated (returned as {"error": ...}, the lease-timeout analog)."""
    from concurrent.futures import ThreadPoolExecutor

    due = registry.tables_needing_snapshot(now=now)

    def one(reg):
        try:
            return reg.key, run_snapshot_job(
                spark, registry, reg, source_loader(reg), output_root)
        except Exception as e:  # noqa: BLE001 — isolate per-table failure
            return reg.key, {"error": str(e)}

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return dict(ex.map(one, due))
