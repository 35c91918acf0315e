"""Kafka frame preparation and MERGE statement generation (connector
jars absent — the DataFrame-side contract is what's testable here)."""

from storagetapper_spark.sinks.jdbc import jdbc_snapshot_options, merge_statement
from storagetapper_spark.sinks.kafka import prepare_kafka_frame


def test_prepare_kafka_frame(spark):
    df = spark.createDataFrame([(12, 3, "payload")], "a long, b long, value string")
    out = prepare_kafka_frame(df, pk_cols=["a", "b"])
    assert out.columns == ["key", "value"]
    r = out.collect()[0]
    assert bytes(r.key) == b"21213"     # len('12')+'12'+len('3')+'3'
    assert bytes(r.value) == b"payload"


def test_merge_statement():
    m = merge_statement("tgt", "stg", ["pk"], ["v1", "v2"])
    assert m == ('MERGE INTO tgt t USING stg s ON t."pk" = s."pk" '
                 'WHEN MATCHED AND s."seqno" > t."seqno" THEN UPDATE SET '
                 't."v1" = s."v1", t."v2" = s."v2", t."seqno" = s."seqno" '
                 'WHEN NOT MATCHED THEN INSERT ("pk", "v1", "v2", "seqno") '
                 'VALUES (s."pk", s."v1", s."v2", s."seqno")')
    # mysql dialect: backtick quoting (encoder/sql.go:34-60)
    m2 = merge_statement("tgt", "stg", ["pk"], ["v1"], dialect="mysql")
    assert "t.`pk` = s.`pk`" in m2 and '"' not in m2


def test_jdbc_snapshot_options():
    opts = jdbc_snapshot_options("jdbc:mysql://h/db", "t1", "id", 0, 1000,
                                 num_partitions=16)
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"
