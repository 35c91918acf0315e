"""User-extension surface (§2.6 UDF/UDAF/UDTF row): the reference's
extension points are plugin registries for encoders/pipes/readers
(encoder/encoder.go:42-47, pipe/pipe.go:84-89); a query engine adds
user FUNCTIONS — scalar (pandas_udf), aggregate (grouped-agg
pandas_udf) and table-valued (Python UDTF, Spark 4) — shown here as
oracle-checked queries."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


# --- Python UDTF: table-valued shingle generator -------------------------
# (decorated lazily: pandas_udf/udtf returnType parsing needs an active
# SparkSession, and plan modules import before any session exists)

class ShingleUDTF:
    """3-word shingles with positions — a table function the SQL layer
    can LATERAL-join (arrow-batched per input row; the distributed
    equivalent of a generator plugin)."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract
        if text is None:
            return
        words = text.split(" ")
        for i in range(max(len(words) - 2, 0)):
            yield " ".join(words[i:i + 3]), i


def udtf_shingles(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    # useArrow: rows cross the Python boundary in Arrow batches instead
    # of pickled one-at-a-time — removes the plan's only row-Python stage
    spark.udtf.register("shingles3",
                        udtf(ShingleUDTF, returnType="shingle: string, pos: int",
                             useArrow=True))
    t(spark, sf, "documents").createOrReplaceTempView("docs_v")
    return spark.sql("""
        SELECT doc_id, s.shingle, s.pos
        FROM docs_v, LATERAL shingles3(text) s
        WHERE doc_id < 20
    """)


UDTF_SHINGLES_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 20
)
SELECT doc_id,
       array_to_string(w[i + 1 : i + 3], ' ') AS shingle,
       CAST(i AS INT) AS pos
FROM d, UNNEST(range(0, greatest(len(w) - 2, 0))) AS u(i)
"""


# --- grouped-agg pandas UDF: user-defined aggregate ----------------------

def _make_geo_mean():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        """Geometric mean — an aggregate Spark lacks natively;
        grouped-agg pandas UDFs are the Python UDAF surface (one Arrow
        batch per group)."""
        import numpy as np

        pos = v[v > 0]
        return float(np.exp(np.log(pos).mean()))

    return geo_mean


def udaf_geomean(spark: SparkSession, sf: str) -> DataFrame:
    li = t(spark, sf, "lineitem")
    geo_mean = _make_geo_mean()
    return (li.groupBy("l_returnflag")
              .agg(F.round(geo_mean("l_extendedprice"), 4)
                    .alias("geo_mean_price"))
              .orderBy("l_returnflag"))


UDAF_GEOMEAN_SQL = """
SELECT l_returnflag,
       round(exp(avg(ln(l_extendedprice))), 4) AS geo_mean_price
FROM lineitem
WHERE l_extendedprice > 0
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


QUERIES = {
    "udtf_shingles": (udtf_shingles, UDTF_SHINGLES_SQL),
    "udaf_geomean": (udaf_geomean, UDAF_GEOMEAN_SQL),
}
