"""storagetapper_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of uber/storagetapper, re-expressed
Spark-first.

The reference (uber/storagetapper, Go) is a MySQL CDC / logical-backup
service: consistent snapshot scan + binlog changelog stream, pluggable
encoders (JSON common-format, Avro, MsgPack, SQL), pluggable pipes
(Kafka, files/HDFS/S3, SQL), with a per-primary-key total-order
invariant (max-seqno wins).  This package rebuilds that surface on the
Spark DataFrame / SQL / Structured Streaming stack and adds the
standard relational operator layer plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis).

Layout:
  schema/     — MySQL→Spark type fidelity map, common-format event model
  sources/    — snapshot scan, changelog normalization (CDC feed)
  operators/  — merge/upsert materialization, dedup, similarity, text
  functions/  — row-key extraction, JSON/SQL/Avro codecs
  sinks/      — file sink (rotation/compression/manifest), Kafka, JDBC
  streaming/  — Structured Streaming pipelines (watermark, stateful)
  plans/      — the query registry consumed by __spark_entry__.py
"""

__version__ = "0.1.0"
