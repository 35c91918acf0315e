"""Relational layer, batch 3: grouping sets, generator (posexplode),
ordered string aggregation, argmin/argmax, boolean aggregates,
regexp counting, schema-conform projection."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.plans.common import t


def grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    t(spark, sf, "part").createOrReplaceTempView("_part_gs")
    return spark.sql("""
        SELECT p_brand, p_type, count(*) AS n, round(sum(p_retailprice), 2) AS total
        FROM _part_gs
        GROUP BY GROUPING SETS ((p_brand), (p_type), ())
    """)


GROUPING_SETS_SQL = """
SELECT p_brand, p_type, count(*) AS n, round(sum(p_retailprice), 2) AS total
FROM part GROUP BY GROUPING SETS ((p_brand), (p_type), ())
"""


def posexplode_words(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    return (
        p.select("p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word"))
         .select("p_partkey", F.col("pos").cast("long").alias("pos"), "word")
    )


POSEXPLODE_SQL = """
WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS ws FROM part),
ex AS (SELECT p_partkey,
              unnest(list_transform(range(len(ws)), i -> {'pos': i, 'word': ws[i+1]})) AS u
       FROM w)
SELECT p_partkey, u.pos AS pos, u.word AS word FROM ex
"""


def string_agg_ordered(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    pre = F.expr("left(p_name, 3)")
    return (
        p.groupBy("p_brand")
         .agg(F.array_join(F.array_sort(F.collect_set(pre)), ",").alias("prefixes"),
              F.count(F.lit(1)).alias("n"))
    )


STRING_AGG_SQL = """
SELECT p_brand,
       string_agg(DISTINCT left(p_name, 3), ',' ORDER BY left(p_name, 3)) AS prefixes,
       count(*) AS n
FROM part GROUP BY p_brand
"""


def argmin_argmax(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    # tie-proof ordering key: unique per row (price then partkey)
    key = F.col("p_retailprice") * 1000000 + F.col("p_partkey")
    return (
        p.groupBy("p_brand")
         .agg(F.min_by("p_name", key).alias("cheapest_part"),
              F.max_by("p_name", key).alias("priciest_part"),
              F.round(F.min("p_retailprice"), 2).alias("min_price"),
              F.round(F.max("p_retailprice"), 2).alias("max_price"))
    )


ARGMINMAX_SQL = """
SELECT p_brand,
       min_by(p_name, p_retailprice * 1000000 + p_partkey) AS cheapest_part,
       max_by(p_name, p_retailprice * 1000000 + p_partkey) AS priciest_part,
       round(min(p_retailprice), 2) AS min_price,
       round(max(p_retailprice), 2) AS max_price
FROM part GROUP BY p_brand
"""


def bool_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    o = t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey")
         .agg(F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
              F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
              F.count(F.lit(1)).alias("n_orders"))
    )


BOOL_AGG_SQL = """
SELECT o_custkey,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderstatus = 'F') AS any_final,
       count(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


def regexp_counting(spark: SparkSession, sf: str) -> DataFrame:
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_count(F.col("p_name"), F.lit("[aeiou]")).alias("n_vowels"),
        F.regexp_count(F.col("p_type"), F.lit("[A-Z]+")).alias("n_upper_runs"),
        # joined to a string: the correctness harness canonicalizes by sorting
        # column values, and python lists are unhashable there
        F.array_join(
            F.regexp_extract_all(F.col("p_name"), F.lit("([a-z]{4,})"), 1), " "
        ).alias("long_words"),
    )


REGEXP_COUNT_SQL = """
SELECT p_partkey,
       len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
       len(regexp_extract_all(p_type, '[A-Z]+')) AS n_upper_runs,
       coalesce(array_to_string(regexp_extract_all(p_name, '([a-z]{4,})', 1), ' '), '') AS long_words
FROM part
"""


def schema_conform(spark: SparkSession, sf: str) -> DataFrame:
    """S4 consumer re-sync: project a batch onto an evolved schema
    (added nullable column, dropped column, widened type)."""
    from storagetapper_spark.schema.evolution import conform

    nation = t(spark, sf, "nation")
    target = T.StructType([
        T.StructField("n_nationkey", T.LongType()),   # widened int→long
        T.StructField("n_name", T.StringType()),
        T.StructField("n_comment", T.StringType()),   # added (null-filled)
    ])                                                # n_regionkey dropped
    return conform(nation, target)


SCHEMA_CONFORM_SQL = """
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
       CAST(NULL AS VARCHAR) AS n_comment
FROM nation
"""


QUERIES = {
    "grouping_sets": (grouping_sets, GROUPING_SETS_SQL),
    "posexplode_words": (posexplode_words, POSEXPLODE_SQL),
    "string_agg_ordered": (string_agg_ordered, STRING_AGG_SQL),
    "argmin_argmax": (argmin_argmax, ARGMINMAX_SQL),
    "bool_aggregates": (bool_aggregates, BOOL_AGG_SQL),
    "regexp_counting": (regexp_counting, REGEXP_COUNT_SQL),
    "schema_conform": (schema_conform, SCHEMA_CONFORM_SQL),
}
