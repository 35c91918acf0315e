"""Training-data pipeline batch 11: the token-budget planning step —
given per-language corpus sizes and a rebalance-to-uniform target, how
many epochs of each language does the next run repeat (capped at the
4-epoch repeat ceiling the data-constrained-scaling literature
recommends), and how many tokens does that realize.

All arithmetic is exact integers: the token count is the space count
+ 1 (a length difference, never a regex split whose empty-token
semantics diverge across engines), and the epoch fraction is kept in
milli-epochs via integer division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_EPOCH_CAP_MILLI = 4000  # 4 epochs — the repeat ceiling


def sample_epoch_allocation(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language epoch allocation under a rebalance-to-uniform token
    budget: each language's target is total_tokens / n_langs; it reruns
    its corpus target/tokens times (milli-epoch integer division),
    capped at 4 epochs.  Languages at the cap are flagged with their
    unmet deficit — the signal to go collect more of that language
    rather than repeat a 5th time.

    Scale: one scan computing a per-row integer token count, one
    groupBy(lang) (5-row domain, map-side combined), a 1-row total
    broadcast back — nothing row-scaled ever reaches the driver."""
    docs = t(spark, sf, "documents")
    tokens = (F.length("text")
              - F.length(F.regexp_replace(F.col("text"), " ", ""))
              + 1).cast("long")
    per_lang = (docs.groupBy("lang")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum(tokens).alias("tokens")))
    tot = per_lang.agg(F.sum("tokens").alias("total"),
                       F.count(F.lit(1)).alias("k"))
    j = per_lang.crossJoin(F.broadcast(tot))
    target = F.expr("total div k")
    epochs = F.least(F.lit(_EPOCH_CAP_MILLI),
                     F.expr("(total div k) * 1000 div tokens"))
    realized = F.expr(
        f"tokens * least({_EPOCH_CAP_MILLI}, "
        "(total div k) * 1000 div tokens) div 1000")
    return (j.select(
        "lang", "n_docs", "tokens",
        target.alias("target_tokens"),
        epochs.cast("long").alias("epochs_milli"),
        realized.cast("long").alias("realized_tokens"),
        (epochs == _EPOCH_CAP_MILLI).alias("capped"),
        F.greatest(F.lit(0), target - realized).cast("long")
        .alias("deficit_tokens"))
        .orderBy("lang"))


EPOCH_ALLOC_SQL = f"""
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(length(text) - length(replace(text, ' ', '')) + 1)
              AS BIGINT) AS tokens
  FROM documents GROUP BY lang
),
tot AS (
  SELECT CAST(sum(tokens) AS BIGINT) AS total, count(*) AS k FROM per_lang
),
j AS (
  SELECT p.*, t.total // t.k AS target_tokens,
         least({_EPOCH_CAP_MILLI},
               (t.total // t.k) * 1000 // p.tokens) AS epochs_milli
  FROM per_lang p CROSS JOIN tot t
)
SELECT lang, n_docs, tokens, target_tokens,
       CAST(epochs_milli AS BIGINT) AS epochs_milli,
       CAST(tokens * epochs_milli // 1000 AS BIGINT) AS realized_tokens,
       epochs_milli = {_EPOCH_CAP_MILLI} AS capped,
       CAST(greatest(0, target_tokens - tokens * epochs_milli // 1000)
            AS BIGINT) AS deficit_tokens
FROM j
ORDER BY lang
"""


QUERIES = {
    "sample_epoch_allocation": (sample_epoch_allocation, EPOCH_ALLOC_SQL),
}
