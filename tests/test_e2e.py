"""End-to-end golden test — the TestBasic analog (main_test.go:490-526,
FIXTURES.md §F1): scripted workload over e2e_basic(f1 PK, f3, f4 [, f2
added/dropped mid-stream]) through snapshot + changelog + schema
evolution + encode + file sink + decode + latest-state materialization.
"""

import gzip
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.functions.json_codec import decode_json, encode_json, restore_columns
from storagetapper_spark.operators.merge import snapshot_changelog_merge
from storagetapper_spark.schema.evolution import apply_change, conform, parse_ddl
from storagetapper_spark.sinks.files import read_manifest, write_files
from storagetapper_spark.sources.changelog import decompose_updates
from storagetapper_spark.sources.snapshot import snapshot_scan

BASE = T.StructType([
    T.StructField("f1", T.IntegerType(), False),
    T.StructField("f3", T.IntegerType(), False),
    T.StructField("f4", T.IntegerType(), True),
])


def test_e2e_basic_workload(spark, tmp_path):
    # --- source state at snapshot time: 10 rows -------------------------
    snap_src = spark.createDataFrame([(i, i * 10, i % 3) for i in range(10)], BASE)
    snapshot = snapshot_scan(snap_src, pk_cols=["f1"])

    # --- changelog: 10 inserts (seqno 1..10) ----------------------------
    log1 = spark.createDataFrame(
        [(i, i * 10, i % 3, "insert", i - 9) for i in range(10, 20)],
        "f1 int, f3 int, f4 int, op string, seqno long")

    # --- ALTER ADD f2: schema evolves; 10 two-column inserts ------------
    change = parse_ddl("ALTER TABLE e2e_test_table1 ADD f2 varchar(32)")
    evolved = apply_change(BASE, change)
    assert [f.name for f in evolved.fields] == ["f1", "f3", "f4", "f2"]
    log2 = spark.createDataFrame(
        [(i, i * 10, i % 3, f"s{i}", "insert", i + 1) for i in range(20, 30)],
        "f1 int, f3 int, f4 int, f2 string, op string, seqno long")

    # --- ALTER DROP f2; bulk UPDATE of rows 0-9 → delete+insert pairs ---
    dropped = apply_change(evolved, parse_ddl("ALTER TABLE e2e_test_table1 DROP f2"))
    assert [f.name for f in dropped.fields] == ["f1", "f3", "f4"]
    updates = spark.createDataFrame(
        [(i, i * 100, None, "update", 31 + i) for i in range(10)],
        "f1 int, f3 int, f4 int, op string, seqno long")
    log3 = decompose_updates(updates)

    # --- unify changelog on the current schema and merge ----------------
    cols = ["f1", "f3", "f4", "op", "seqno"]
    log = (log1.select(*cols)
           .unionByName(log2.select(*cols))       # f2 pruned by projection
           .unionByName(log3.select(*cols)))

    merged = snapshot_changelog_merge(
        snapshot.select("f1", "f3", "f4", "op", "seqno"), log, pk_cols=["f1"])

    got = {r.f1: (r.f3, r.f4) for r in merged.collect()}
    # rows 0-9 updated to f3=i*100/f4=NULL; 10-29 inserted once
    assert len(got) == 30
    for i in range(10):
        assert got[i] == (i * 100, None)
    for i in range(10, 30):
        assert got[i] == (i * 10, i % 3)

    # --- encode full event stream, sink to files, decode back ----------
    events = snapshot.select(*cols).unionByName(log)
    encoded = encode_json(events, pk_cols=["f1"])
    out = str(tmp_path / "e2e_out")
    manifest = write_files(encoded, out, fmt="text", compression="gzip")
    assert manifest["total_records"] == events.count() == 50  # 10+10+10+20

    # read the files back as a consumer would (S5: re-read own output)
    lines = []
    for rel in manifest["files"]:
        with gzip.open(os.path.join(out, rel), "rt") as f:
            lines += [json.loads(line) for line in f]
    assert len(lines) == 50
    # per-key seqno ordering: update pairs are delete-then-insert
    by_key = {}
    for ev in lines:
        by_key.setdefault(ev["Key"][0], []).append(ev)
    for k, evs in by_key.items():
        evs.sort(key=lambda e: e["SeqNo"])
        kinds = [e["Type"] for e in evs]
        if int(k) < 10:  # snapshot + update pair
            assert kinds == ["insert", "delete", "insert"]
            assert evs[0]["SeqNo"] == -1
            assert evs[1]["SeqNo"] + 1 == evs[2]["SeqNo"]
            assert evs[1]["Fields"] is None  # delete carries key only

    # decode → restore → matches the merged state for a sample key
    decoded = restore_columns(decode_json(spark.createDataFrame(
        [(line,) for line in (json.dumps(x) for x in lines)], "value string")),
        dropped)
    final = {r.f1: (r.f3, r.f4)
             for r in snapshot_changelog_merge(
                 decoded.filter("seqno = -1"),
                 decoded.filter("seqno >= 0"), pk_cols=["f1"]).collect()}
    assert final == got


def test_e2e_format_matrix(spark):
    """TestBasic's cross-format claim (main_test.go:490-526 runs every
    encoder over the same workload and compares golden outputs): the
    same CDC event stream encoded through JSON, MsgPack and the Avro
    binary codec decodes to the IDENTICAL canonical row set."""
    from storagetapper_spark.functions.avro_codec import (
        avro_decode_record,
        avro_encode_record,
    )
    from storagetapper_spark.functions.msgpack_codec import (
        decode_msgpack,
        encode_msgpack,
    )
    from storagetapper_spark.schema.commonformat import common_format_struct

    src = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 11), (3, None, 12)],
        "pk int, val string, seqno long")
    cdc = src.select("pk", "val", "seqno",
                     F.lit("insert").alias("op"), F.lit(0).cast("long").alias("ts"))

    def canon(rows):
        return sorted((r["pk"], r["val"], r["seqno"]) for r in rows)

    # JSON path
    enc_j = encode_json(cdc, pk_cols=["pk"], field_cols=["pk", "val"],
                        seqno_col="seqno")
    dec_j = restore_columns(
        decode_json(enc_j),
        T.StructType([T.StructField("pk", T.IntegerType()),
                      T.StructField("val", T.StringType())]))
    json_rows = canon(r.asDict() for r in
                      dec_j.select("pk", "val", "seqno").collect())

    # MsgPack path
    ev = common_format_struct(F.col("op"), ["pk"], F.col("seqno"),
                              F.col("ts"), ["pk", "val"])
    dec_m = restore_columns(
        decode_msgpack(encode_msgpack(cdc.select(ev.alias("ev")), F.col("ev"))),
        T.StructType([T.StructField("pk", T.IntegerType()),
                      T.StructField("val", T.StringType())]))
    mp_rows = canon(r.asDict() for r in
                    dec_m.select("pk", "val", "seqno").collect())

    # Avro binary path (driver-side codec over the same records)
    fields = [{"name": "pk", "type": "int"}, {"name": "val", "type": "string"},
              {"name": "seqno", "type": "long"}]
    av_rows = canon(
        avro_decode_record(
            avro_encode_record({"pk": r.pk, "val": r.val, "seqno": r.seqno},
                               fields), fields)
        for r in cdc.collect())

    assert json_rows == mp_rows == av_rows
    assert len(json_rows) == 3 and json_rows[2][1] is None  # null survives
