"""End-to-end corpus curation job: gate → dedup → pack, one command.

Reads the documents table from a fixture dir, runs the batch curation
cascade (the same code path as the streaming pipeline's foreachBatch
body — streaming/curation.curate_batch), packs the accepted docs into
contiguous context windows (operators/sampling.pack_contiguous), and
writes:

    <out>/curated/            accepted documents (parquet)
    <out>/accepted_hashes/    the dedup state table
    <out>/pack_manifest/      (doc_id, start_token, first/last window)

Prints ONE JSON summary line (funnel counts + packing totals) — the
operational artifact a 100 TB curation run would emit per partition of
work.  Usage: python tools/curate.py [sf_dir] [out_dir] [window].
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curate_")
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 2048

    from pyspark.sql import functions as F

    from storagetapper_spark.operators.sampling import pack_contiguous
    from storagetapper_spark.session import get_spark
    from storagetapper_spark.streaming.curation import curate_batch

    spark = get_spark("curate")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .select("doc_id", "text", "lang"))
    stats = curate_batch(spark, docs, 0, out)

    curated = (spark.read.parquet(f"{out}/curated")
               .select("doc_id",
                       F.size(F.split(F.col("text"), " ")).cast("long")
                        .alias("n_tokens")))
    manifest = pack_contiguous(curated, window=window)
    manifest.write.mode("overwrite").parquet(f"{out}/pack_manifest")

    m = spark.read.parquet(f"{out}/pack_manifest")
    agg = m.agg(F.sum("n_tokens").alias("total_tokens"),
                (F.max("last_window") + 1).alias("n_windows")).collect()[0]
    summary = dict(stats, total_tokens=int(agg["total_tokens"] or 0),
                   n_windows=int(agg["n_windows"] or 0),
                   window=window, out=out)
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
