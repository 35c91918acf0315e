"""Multi-table changelog fan-out (changelog/mysql.go:313-392 reloadState
+ addNewTable).

The reference's changelog reader serves many tables from one binlog
stream: a nested registry db→table→service→[]version with one
producer+encoder per output version; tables without a PK are refused
(changelog/mysql.go:224-227).

Spark rendition: one pass over the mixed CDC stream, routed by
(db, table) to each registration's encoder, written under the
registration's topic path.  One job, N outputs — the scan is shared,
the writes are independent (at scale: partitionBy((db, table)) keeps
each output a contiguous partition write).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storagetapper_spark.functions.json_codec import encode_json
from storagetapper_spark.sinks.files import write_files
from storagetapper_spark.state import Registry, TableRegistration


def route_cdc(mixed: DataFrame, regs: list[TableRegistration],
              db_col: str = "db", table_col: str = "tbl") -> dict[str, DataFrame]:
    """Split a mixed CDC frame into one frame per registration (all
    versions of a table share the rows — one encoder each downstream).
    Registrations without pk_cols are refused, like the reference."""
    out: dict[str, DataFrame] = {}
    for reg in regs:
        if not reg.pk_cols:
            raise ValueError(f"table {reg.key} has no primary key — refused "
                             "(changelog/mysql.go:224-227)")
        out[reg.key] = (mixed.filter((F.col(db_col) == reg.db)
                                     & (F.col(table_col) == reg.table))
                             .drop(db_col, table_col))
    return out


def fanout_to_files(mixed: DataFrame, registry: Registry, output_root: str,
                    db_col: str = "db", table_col: str = "tbl") -> dict[str, dict]:
    """Encode and write every registered table's slice of the stream to
    its own topic directory; returns manifests per registration key."""
    results = {}
    for key, df in route_cdc(mixed, registry.list(), db_col, table_col).items():
        reg = registry.get(key)
        if reg.output_format != "json":
            raise NotImplementedError(f"output format {reg.output_format!r}")
        encoded = encode_json(df, pk_cols=reg.pk_cols)
        results[key] = write_files(
            encoded, os.path.join(output_root, reg.topic()), fmt="text",
            compression="gzip")
    return results
