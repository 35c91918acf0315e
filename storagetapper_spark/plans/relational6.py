"""Query batch 6: RANGE-frame windows, unpivot (wide→long reshaping),
stratified deterministic sampling — §2.6 window-frame surface plus
training-data sampling as oracle-checked queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from storagetapper_spark.plans.common import t


# --- RANGE frame (value-based window, vs the ROWS frames elsewhere) -----

def window_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    """Per-supplier sliding value-range sum: all line items whose
    quantity is within 5.0 below the current row's.  RANGE frames
    include peer ties wholly, so the result is deterministic without a
    unique ordering — exactly why this frame type exists.  Partitioning
    by l_suppkey (not the 3-value returnflag) keeps window partitions
    ~|lineitem|/|supplier| rows at any scale."""
    li = t(spark, sf, "lineitem")
    # fractional RANGE bounds aren't expressible via Window.rangeBetween
    # (int-only API); the SQL expression form is the same Catalyst plan
    return li.selectExpr(
        "l_orderkey", "l_linenumber", "l_suppkey", "l_quantity",
        "sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_quantity"
        " RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW) AS qty_range_sum")


RANGE_FRAME_SQL = """
SELECT l_orderkey, l_linenumber, l_suppkey, l_quantity,
       sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_quantity
                             RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW)
         AS qty_range_sum
FROM lineitem
"""


# --- unpivot / melt -----------------------------------------------------

def unpivot_measures(spark: SparkSession, sf: str) -> DataFrame:
    """Wide→long reshape of the lineitem measures via the native
    ``unpivot`` (Expand under the hood: no shuffle, no UDF)."""
    li = t(spark, sf, "lineitem")
    return (li.unpivot(
                ["l_orderkey", "l_linenumber"],
                ["l_quantity", "l_extendedprice", "l_discount"],
                "measure", "value")
              .replace({"l_quantity": "qty", "l_extendedprice": "price",
                        "l_discount": "disc"}, subset=["measure"]))


UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'qty' AS measure, l_quantity AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'disc', l_discount FROM lineitem
"""


# --- stratified deterministic sampling ----------------------------------

_RATES = {"en": 0.5, "zh": 0.2}
_DEFAULT_RATE = 0.05


def sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language sampling rates (downsample dominant languages,
    keep the tail) with content-hash determinism — ``sampleBy`` without
    the RNG, so the same docs are picked on every engine and run."""
    from storagetapper_spark.operators.sampling import stratified_hash_sample

    docs = t(spark, sf, "documents")
    return (stratified_hash_sample(docs, _RATES, "lang", "doc_id",
                                   default_rate=_DEFAULT_RATE)
            .select("doc_id", "lang", "source"))


STRATIFIED_SQL = f"""
SELECT doc_id, lang, source
FROM documents
WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      / 1152921504606846976.0
      < CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.2 ELSE 0.05 END
"""


QUERIES = {
    "window_range_frame": (window_range_frame, RANGE_FRAME_SQL),
    "unpivot_measures": (unpivot_measures, UNPIVOT_SQL),
    "sample_stratified": (sample_stratified, STRATIFIED_SQL),
}
