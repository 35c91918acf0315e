"""SQL/JDBC sink (Q1, pipe/sql.go) and JDBC snapshot source options.

The reference executes encoder-generated INSERT/DELETE statements in
batched transactions; Spark-side the append path is ``df.write.jdbc``
and the upsert path is a foreachBatch MERGE (or, for engines without
MERGE, the statement-replay fallback using functions.sql_codec output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def jdbc_append(df: DataFrame, url: str, table: str,
                properties: dict | None = None, batch_size: int = 4096):
    """Plain append (insert-only streams).  batchsize mirrors the
    reference's max_batch_size=4096 (config/config.go:218)."""
    props = dict(properties or {})
    props.setdefault("batchsize", str(batch_size))
    return df.write.mode("append").options(**props).jdbc(url, table)


def merge_statement(table: str, staging: str, pk_cols: list[str],
                    data_cols: list[str], seqno_col: str = "seqno",
                    dialect: str = "ansi", op_col: str | None = None) -> str:
    """The seqno-guarded MERGE that replaces the reference's
    ``ON DUPLICATE KEY UPDATE IF(seqno < VALUES(seqno)...)`` upsert (E5)
    on engines with ANSI MERGE.  Executed per micro-batch in
    foreachBatch after staging the batch.

    With ``op_col`` the staged batch carries tombstones and the MERGE
    mirrors the reference SQL pipe emitting DELETE statements for delete
    events (encoder/sql.go:94,249-250): a matched row whose superseding
    event is a delete is removed, and a tombstone for an absent key is a
    no-op (never inserted)."""
    # identifier quoting per dialect (encoder/sql.go:34-60 analog: ` for
    # mysql, " for ansi) — required against Spark-created JDBC tables,
    # whose columns are quoted case-sensitive
    qc = "`" if dialect == "mysql" else '"'
    def q(c: str) -> str:
        return f"{qc}{c}{qc}"
    on = " AND ".join(f"t.{q(c)} = s.{q(c)}" for c in pk_cols)
    sets = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in data_cols + [seqno_col])
    ins_cols = ", ".join(q(c) for c in pk_cols + data_cols + [seqno_col])
    ins_vals = ", ".join(f"s.{q(c)}" for c in pk_cols + data_cols + [seqno_col])
    guard = f"s.{q(seqno_col)} > t.{q(seqno_col)}"
    if op_col is None:
        return (f"MERGE INTO {table} t USING {staging} s ON {on} "
                f"WHEN MATCHED AND {guard} THEN UPDATE SET {sets} "
                f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})")
    # CAST keeps the predicate legal when the staged op column arrives as
    # CLOB/TEXT (Spark's Derby dialect maps StringType to CLOB, and Derby
    # rejects CLOB = CHAR comparisons); COALESCE makes a NULL op behave as
    # a plain upsert instead of NULL-ing the NOT MATCHED branch away.
    cast_t = "CHAR(16)" if dialect == "mysql" else "VARCHAR(16)"
    is_del = f"COALESCE(CAST(s.{q(op_col)} AS {cast_t}), '') = 'delete'"
    return (f"MERGE INTO {table} t USING {staging} s ON {on} "
            f"WHEN MATCHED AND {guard} AND {is_del} THEN DELETE "
            f"WHEN MATCHED AND {guard} THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED AND NOT {is_del} "
            f"THEN INSERT ({ins_cols}) VALUES ({ins_vals})")


def jdbc_upsert_sink(cdc_stream: DataFrame, url: str, table: str,
                     pk_cols: list[str], data_cols: list[str],
                     checkpoint_dir: str, seqno_col: str = "seqno",
                     op_col: str = "op", dialect: str = "ansi",
                     trigger_available_now: bool = True):
    """Streaming upsert into a SQL database: per micro-batch, resolve to
    one row per PK (max seqno) INCLUDING tombstones, stage via
    ``df.write.jdbc``, MERGE with the seqno guard (delete branch for
    tombstones), drop the staging table.

    Exactly the reference streamer→SQL-pipe path (pipe/sql.go:177-207 +
    encoder/sql.go idempotent upsert + DELETE for delete events,
    encoder/sql.go:249-250) with Spark checkpointing replacing the offset
    store: a replayed batch re-runs the same guarded MERGE and converges
    (seqno-idempotence, SURVEY §4.3)."""
    from storagetapper_spark.operators.merge import latest_state

    spark = cdc_stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # keep tombstones: a PK whose latest event is a delete must reach
        # the MERGE so the stale target row is removed
        resolved = latest_state(batch_df, pk_cols, seqno_col=seqno_col,
                                op_col=op_col, drop_deleted=False)
        staging = f"{table}_stage_{batch_id}"
        # overwrite: a replayed batch (crash after stage, before MERGE)
        # must not append into a leftover staging table and double rows;
        # VARCHAR(16) keeps op comparable on dialects that map StringType
        # to CLOB/TEXT (Derby)
        (resolved.select(*pk_cols, *data_cols, seqno_col, op_col)
         .write.mode("overwrite")
         .option("createTableColumnTypes", f"{op_col} VARCHAR(16)")
         .option("batchsize", "4096")
         .jdbc(url, staging))
        conn = spark._jvm.java.sql.DriverManager.getConnection(url)
        try:
            st = conn.createStatement()
            try:
                st.execute(merge_statement(table, staging, pk_cols,
                                           data_cols, seqno_col=seqno_col,
                                           dialect=dialect, op_col=op_col))
            finally:
                # staging must not outlive the batch even when the MERGE
                # throws — a leftover table would shadow the next attempt
                try:
                    st.execute(f"DROP TABLE {staging}")
                except Exception:
                    pass
                st.close()
        finally:
            conn.close()

    writer = (cdc_stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def jdbc_snapshot_options(url: str, table: str, pk_col: str,
                          lower: int, upper: int,
                          num_partitions: int = 32,
                          fetch_size: int = 10000) -> dict:
    """Partitioned JDBC snapshot read — the production replacement for
    FORCE INDEX (primary) full scans (snapshot/mysql.go:71): each
    executor reads one PK range, preserving key-contiguous output, with
    predicate pushdown into each range query."""
    return {
        "url": url, "dbtable": table,
        "partitionColumn": pk_col,
        "lowerBound": str(lower), "upperBound": str(upper),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetch_size),
    }
