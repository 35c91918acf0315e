"""Row-key extraction (encoder/encoder.go:99-126 GetRowKey).

The reference concatenates primary-key fields as length-prefixed strings
``len(v) + v`` per column; the key is the Kafka message key and therefore
the unit of ordering (pipe/kafka.go:627-629, SURVEY.md §4.3).

Pure Column expressions — stays inside whole-stage codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def row_key_expr(pk_cols: list[str | Column]) -> Column:
    """length-prefixed concat of PK columns: '3abc5hello' for ('abc','hello').

    Accepts column names or Column expressions (e.g. fields of a struct,
    ``F.col("_img.id")``) so every changelog producer — snapshot scan,
    events adapter, Debezium envelope — derives the identical key and
    rows can match across sources.  Length-prefixing keeps composite
    keys collision-free: ('ab','c') → '2ab1c' vs ('a','bc') → '1a2bc'.
    """
    parts = []
    for c in pk_cols:
        s = (F.col(c) if isinstance(c, str) else c).cast("string")
        parts.append(F.concat(F.length(s).cast("string"), s))
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def partition_key_expr(pk_cols: list[str]) -> Column:
    """Partition key == row key for Kafka routing; files route by stream
    name instead (pipe/file.go:768-773) — see sinks.files."""
    return row_key_expr(pk_cols)
