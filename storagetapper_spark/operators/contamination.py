"""Benchmark-contamination detection for training corpora.

Before training, every serious data pipeline checks the corpus against
held-out evaluation benchmarks: a document that shares a large fraction
of its word n-grams with a benchmark item leaks eval data into
training.  The standard method (n-gram overlap, e.g. the 13-gram
checks popularized by GPT-3/PaLM data cards) is a set-intersection
problem, which Spark expresses as an explode + semi-join — never a
row-to-row document comparison.

Scale shape: the benchmark side is small by construction (eval sets are
thousands of items vs a 100 TB corpus), so its distinct shingle set is
BROADCAST; the corpus is scanned once, its exploded shingles never
shuffle (the contamination join is map-side against the broadcast),
and the only wide operation is the per-doc count aggregation, which is
partial-aggregated map-side.  Threshold membership uses integer
cross-multiplication, so flag boundaries cannot flip on float rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storagetapper_spark.operators.text import normalize_text


def shingle_set(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", shingle_n: int = 3,
                extra_cols: list[str] | None = None) -> DataFrame:
    """Distinct word n-gram shingles per document — the same JVM-side
    lookahead-regex pass as ``dedup.minhash_signature`` (one regex,
    zero Python, short docs contribute their whole normalized text).
    Output: (id_col, *extra_cols, sh)."""
    extra = list(extra_cols or [])
    norm = normalize_text(F.col(text_col))
    pat = "(?<!\\S)(?=(" + " ".join(["\\S+"] * shingle_n) + "))"
    grams = df.select(
        F.col(id_col), *[F.col(c) for c in extra],
        F.explode(F.regexp_extract_all(norm, F.lit(pat), 1)).alias("sh"))
    shorts = (df.select(F.col(id_col), *[F.col(c) for c in extra],
                        norm.alias("sh"))
                .filter(F.size(F.split("sh", " ")) < shingle_n))
    return grams.unionByName(shorts).distinct()


def contamination_check(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_n: int = 3,
                        threshold_num: int = 1, threshold_den: int = 5,
                        ) -> DataFrame:
    """Flag corpus documents whose shingle overlap with the benchmark
    set reaches ``threshold_num/threshold_den`` of their own shingles.

    Per corpus document: ``n_shingles`` (distinct own shingles),
    ``n_shared`` (of those, how many appear ANYWHERE in the benchmark),
    ``contam_ratio`` = shared/total (rounded for display), and
    ``contaminated`` = den·shared ≥ num·total (exact integer test).

    The benchmark shingle set is deduplicated then broadcast — at 100 TB
    the corpus-side explode feeds a broadcast-hash semi-probe, so no
    corpus shingle ever crosses the network.
    """
    bench_sh = (shingle_set(benchmark, text_col, id_col, shingle_n)
                .select("sh").distinct())
    corpus_sh = shingle_set(corpus, text_col, id_col, shingle_n)
    shared = (corpus_sh
              .join(F.broadcast(bench_sh), "sh", "left_semi")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_shared")))
    totals = corpus_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"))
    return (totals.join(shared, id_col, "left")
                  .withColumn("n_shared",
                              F.coalesce(F.col("n_shared"), F.lit(0)))
                  .select(
                      id_col, "n_shingles", "n_shared",
                      F.round(F.col("n_shared") / F.col("n_shingles"), 4)
                       .alias("contam_ratio"),
                      (F.col("n_shared") * threshold_den
                       >= F.col("n_shingles") * threshold_num)
                      .alias("contaminated")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  shingle_n: int = 3,
                  threshold_num: int = 1, threshold_den: int = 5,
                  ) -> DataFrame:
    """Drop contaminated documents (the action form of the check):
    anti-join the corpus against the flagged id set.  Keeps the corpus
    schema unchanged so it composes with downstream dedup/filter
    stages."""
    flagged = (contamination_check(corpus, benchmark, text_col, id_col,
                                   shingle_n, threshold_num, threshold_den)
               .filter(F.col("contaminated"))
               .select(id_col))
    return corpus.join(flagged, id_col, "left_anti")
