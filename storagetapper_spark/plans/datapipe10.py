"""Round-6 training-data pipeline batch 2: CCNet-style per-language
quality bucketing — the head/middle/tail split a web-scale corpus
pipeline applies before sampling (CCNet, Wenzek et al. 2020, uses
per-language LM-perplexity thirds; the deterministic stand-in score
here is chars-per-token in exact micro-units).

House rules: exact integer score (integer `div`, no float), the
per-language thirds computed with the two-pass rank + arithmetic
ntile (operators/ranks.py) — never a per-language window funneling a
whole language through one task — and an oracle that replays the
ntile split bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.operators.ranks import ntile_from_rank, two_pass_rank
from storagetapper_spark.operators.text import word_count
from storagetapper_spark.plans.common import t

QUERIES: dict = {}


def text_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language head/middle/tail corpus split by a deterministic
    quality score (chars-per-token, micro-units): rank docs within
    each language by (score, doc_id), cut into exact ntile thirds,
    and report per (lang, bucket) the doc count, char budget, and
    score range — the CCNet sampling manifest."""
    docs = t(spark, sf, "documents").select(
        "doc_id", "lang", "n_chars",
        word_count(F.col("text")).alias("ws"))
    scored = docs.select(
        "doc_id", "lang", "n_chars",
        F.expr("(n_chars * 1000000) div greatest(ws, 1)")
        .alias("score_micro"))
    ranked = two_pass_rank(
        scored, order=[F.col("score_micro"), F.col("doc_id")],
        bucket=F.floor(F.col("score_micro") / 250000).cast("long"),
        partition=["lang"])
    tile = ntile_from_rank(F.col("_rank"), F.col("_n"), 3)
    bucket = (F.when(tile == 1, F.lit("head"))
              .when(tile == 2, F.lit("middle"))
              .otherwise(F.lit("tail")))
    return (ranked.select("lang", bucket.alias("bucket"), "n_chars",
                          "score_micro")
            .groupBy("lang", "bucket")
            .agg(F.count(F.lit(1)).alias("docs"),
                 F.sum("n_chars").alias("chars_total"),
                 F.min("score_micro").alias("min_score"),
                 F.max("score_micro").alias("max_score"))
            .orderBy("lang", "bucket"))


CCNET_BUCKETS_SQL = """
WITH scored AS (
  SELECT doc_id, lang, n_chars,
         (n_chars * 1000000) // greatest(
           CASE WHEN length(trim(regexp_replace(text, '\\s+', ' ', 'g'))) = 0
                THEN 0
                ELSE length(trim(regexp_replace(text, '\\s+', ' ', 'g')))
                     - length(replace(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ', ''))
                     + 1
           END, 1) AS score_micro
  FROM documents
),
tiled AS (
  SELECT lang, n_chars, score_micro,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY score_micro, doc_id) AS tile
  FROM scored
)
SELECT lang,
       CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*) AS docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       min(score_micro) AS min_score,
       max(score_micro) AS max_score
FROM tiled
GROUP BY 1, 2
ORDER BY lang, bucket
"""


QUERIES["text_ccnet_buckets"] = (text_ccnet_buckets, CCNET_BUCKETS_SQL)
