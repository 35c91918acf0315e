"""Storage-layout operators: Z-order clustering and small-file
compaction.

At 100 TB the scan is the dominant cost, and the only scan a query
should pay for is the files its predicates can't rule out.  Parquet
row-group/file min-max statistics give that pruning for free — IF the
writer clustered the data so each file covers a small region of the
predicate space.  Z-ordering (bit-interleaving the normalized
dimensions, then range-partitioning by the interleaved value) is the
standard multi-dimensional clustering used by Delta OPTIMIZE ZORDER BY
and friends; here it is a pure Column expression + repartitionByRange,
so the whole rewrite is one shuffle and stays JVM-side.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bounds: list[tuple[float, float]],
           bits: int = 16) -> Column:
    """Interleave ``bits`` bits of each normalized dimension into one
    LONG Morton (Z-curve) value.  ``bounds`` holds (min, max) per
    column — at scale these come from table statistics, not a scan.
    d·bits must fit in 63 bits (4 dims × 16 bits is the droid you're
    looking for).  Pure shift/and/or expressions — codegen'd, no UDF.
    """
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} dims × {bits} bits exceeds a signed long")
    scale = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for i, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        span = float(hi) - float(lo) or 1.0
        q = F.least(F.lit(scale), F.greatest(F.lit(0), F.floor(
            (c.cast("double") - float(lo)) / span * scale).cast("long")))
        for b in range(bits):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * d + i))
    return z


def zorder_write(df: DataFrame, cols: list[str],
                 bounds: list[tuple[float, float]], out_dir: str,
                 n_files: int = 8, bits: int = 16) -> None:
    """Cluster ``df`` on the Z-curve of ``cols`` and write ``n_files``
    parquet files whose min-max footers are tight boxes in the
    clustered dimensions.  Range partitioning by z-value keeps the
    shuffle balanced (contiguous z-ranges ≈ equal row counts via
    sampled range bounds); the within-partition sort makes row-group
    stats monotone so even intra-file pruning works."""
    zcol = zvalue([F.col(c) for c in cols], bounds, bits)
    (df.withColumn("_z", zcol)
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(out_dir))


def file_ranges(spark: SparkSession, path: str,
                cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` from the parquet footers (what a
    stats-based planner prunes with) — the verification surface for
    layout quality."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        rng = {}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    continue
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            rng[c] = (lo, hi)
        out.append({"file": name, "ranges": rng,
                    "rows": md.num_rows})
    return out


def files_pruned(ranges: list[dict], col: str, lo, hi) -> tuple[int, int]:
    """How many files a [lo, hi] predicate on ``col`` can skip using the
    footer stats: returns (skippable, total)."""
    total = len(ranges)
    hit = sum(1 for r in ranges
              if r["ranges"][col][0] is not None
              and not (r["ranges"][col][1] < lo or r["ranges"][col][0] > hi))
    return total - hit, total


def compact_small_files(spark: SparkSession, src_dir: str, out_dir: str,
                        target_rows_per_file: int = 1_000_000) -> int:
    """Rewrite a directory of many small parquet files into
    ceil(rows/target) right-sized files (the maintenance job every
    streaming sink needs — micro-batches leave a file per trigger per
    partition, and scan cost degrades with file count).  Returns the
    output file count.  Writes to a NEW directory: swapping is the
    caller's atomic-rename step, matching the reference's
    write-then-rename file-pipe discipline."""
    df = spark.read.parquet(src_dir)
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    df.repartition(n_files).write.mode("overwrite").parquet(out_dir)
    return len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
