"""Buffered two-stage pipeline (O2): write → envelope → read back →
passthrough routing, ordering preserved via header seqno."""

import json

from storagetapper_spark.streaming.buffered import (
    read_buffer,
    stream_from_buffer,
    write_buffer,
)


def test_buffer_roundtrip(spark, tmp_path):
    buf = str(tmp_path / "buffer")
    cdc = spark.createDataFrame(
        [(1, "a", "insert", 1), (2, "b", "insert", 2), (1, None, "delete", 3)],
        "pk long, val string, op string, seqno long")
    write_buffer(cdc, ["pk"], buf)

    # headers readable without decoding payloads
    hdrs = {r.header.SeqNo: r.header for r in read_buffer(spark, buf).collect()}
    assert set(hdrs) == {1, 2, 3}
    assert hdrs[1].Type == "json" and hdrs[1].Key == ["11"]

    # stage 2: json→json = passthrough; payload is valid common-format
    out = {r.seqno: r for r in stream_from_buffer(spark, buf, "json").collect()}
    assert all(r.passthrough for r in out.values())
    ev = json.loads(out[3].value)
    assert ev["Type"] == "delete" and ev["Fields"] is None
    ev1 = json.loads(out[1].value)
    assert {f["Name"]: f["Value"] for f in ev1["Fields"]} == {"pk": "1", "val": "a"}

    # a second append interleaves; per-key order = seqno order
    more = spark.createDataFrame([(1, "a2", "insert", 4)],
                                 "pk long, val string, op string, seqno long")
    write_buffer(more, ["pk"], buf)
    seq = [r.seqno for r in stream_from_buffer(spark, buf, "json")
           .filter("key = '11'").orderBy("seqno").collect()]
    assert seq == [1, 3, 4]

    # avro target: nothing is passthrough (re-encode branch)
    assert not any(r.passthrough for r in
                   stream_from_buffer(spark, buf, "avro").collect())


def test_buffer_cross_format_reencode(spark, tmp_path):
    """A msgpack-format buffer drained to a json output must decode +
    re-encode (streamer/buffer.go:88-99), producing events identical to
    a json-format buffer of the same workload; and the reverse direction
    round-trips through the msgpack binary."""
    from storagetapper_spark.functions.msgpack_codec import msgpack_unpack

    cdc = spark.createDataFrame(
        [(1, "a", "insert", 1), (2, None, "insert", 2), (1, None, "delete", 3)],
        "pk long, val string, op string, seqno long")

    buf_j = str(tmp_path / "buf_json")
    buf_m = str(tmp_path / "buf_mp")
    write_buffer(cdc, ["pk"], buf_j, buffer_format="json")
    write_buffer(cdc, ["pk"], buf_m, buffer_format="msgpack")

    # msgpack buffer -> json output: every row re-encoded
    out_m2j = {r.seqno: r for r in
               stream_from_buffer(spark, buf_m, "json").collect()}
    assert not any(r.passthrough for r in out_m2j.values())
    out_j2j = {r.seqno: r for r in
               stream_from_buffer(spark, buf_j, "json").collect()}
    assert all(r.passthrough for r in out_j2j.values())

    for s in (1, 2, 3):
        assert json.loads(out_m2j[s].value) == json.loads(out_j2j[s].value)

    # json buffer -> msgpack output: binary value decodes to the event
    out_j2m = {r.seqno: r for r in
               stream_from_buffer(spark, buf_j, "msgpack").collect()}
    ev = msgpack_unpack(bytes(out_j2m[3].value))
    assert ev["Type"] == "delete" and ev["SeqNo"] == 3 and ev["Fields"] is None
