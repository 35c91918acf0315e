"""Round-6 training-data pipeline batch: stratified reservoir
sampling, minhash-over-adjacency link prediction support, FDR
correction, and product-quantization assignment — the sampling /
multiple-testing / vector-compression layer of a large-scale data
pipeline (SURVEY.md §2.7 addendum).

All queries follow the house rules: exact integers at rounding
boundaries (micro-units + floor), salted-md5 determinism instead of
RNG, per-key windows with map-side group limits, oracles that replay
every cap and hash bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t

_RES_K = 50
_RES_SALT = "r6"


def sample_reservoir_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-k uniform sample per language stratum via the
    deterministic bottom-k sketch (operators/sampling.
    stratified_reservoir): rank docs by salted md5, keep the 50
    smallest per lang.  Equivalent to per-stratum reservoir sampling
    but order-free and mergeable — the property the streaming fold
    (streaming/reservoir.py) and map-side WindowGroupLimit both
    exploit; at 100 TB each task ships ≤ k rows per stratum into the
    one shuffle."""
    from storagetapper_spark.operators.sampling import stratified_reservoir

    docs = t(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    return (stratified_reservoir(docs, ["lang"], _RES_K,
                                 salt=_RES_SALT)
            .select("lang", "rk", "doc_id", "n_chars")
            .orderBy("lang", "rk"))


SAMPLE_RESERVOIR_SQL = f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         md5('{_RES_SALT}' || '|' || CAST(doc_id AS VARCHAR)) AS sort_key
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY sort_key, doc_id) AS rk
  FROM keyed
)
SELECT lang, rk, doc_id, n_chars
FROM ranked WHERE rk <= {_RES_K}
ORDER BY lang, rk
"""


QUERIES = {
    "sample_reservoir_stratified":
        (sample_reservoir_stratified, SAMPLE_RESERVOIR_SQL),
}
