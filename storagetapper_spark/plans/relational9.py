"""Query batch 9: mergeable HLL sketches (Datasketches), deterministic
per-group reservoir sampling, and time-weighted averages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t


# --- mergeable HLL: per-partition sketches unioned to a global ----------

def sketch_hll_union(spark: SparkSession, sf: str) -> DataFrame:
    """The mergeable-sketch architecture every 100 TB rollup needs:
    build one Datasketches HLL per source partition (here per
    o_orderpriority), then UNION the sketches to answer the global
    question without re-scanning — estimate(union(sketches)) vs a
    second pass.  Sketch bytes are engine-specific, so the checkable
    contract mirrors approx_distinct: exact counts + self-consistency
    flags that (a) each partial estimate and (b) the union-of-partials
    estimate land within 5% of Spark's own exact counts (Spark HLL is
    deterministic)."""
    orders = t(spark, sf, "orders")
    per_group = (orders.groupBy("o_orderpriority")
                       .agg(F.countDistinct("o_custkey").alias("exact_custs"),
                            F.hll_sketch_agg("o_custkey").alias("_sk")))
    partials = per_group.select(
        "o_orderpriority", "exact_custs",
        (F.abs(F.hll_sketch_estimate("_sk") - F.col("exact_custs"))
         <= 0.05 * F.col("exact_custs")).alias("partial_within_5pct"))
    global_row = (per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_union_est"))
        .crossJoin(orders.agg(
            F.countDistinct("o_custkey").alias("exact_custs"))))
    union_ok = global_row.select(
        F.lit("__union__").alias("o_orderpriority"),
        F.col("exact_custs"),
        (F.abs(F.col("_union_est") - F.col("exact_custs"))
         <= 0.05 * F.col("exact_custs")).alias("partial_within_5pct"))
    return partials.unionByName(union_ok).orderBy("o_orderpriority")


SKETCH_HLL_SQL = """
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_custs,
       TRUE AS partial_within_5pct
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT '__union__', CAST(count(DISTINCT o_custkey) AS BIGINT), TRUE
FROM orders
ORDER BY o_orderpriority
"""


# --- deterministic per-group reservoir (exact-k samples) ----------------

def sample_reservoir_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly k documents per language, chosen by content-hash order —
    the reproducible analog of per-group reservoir sampling (same k
    rows on every run, every engine, any partitioning).  One window
    per group; at scale the rank is a per-partition top-k
    (WindowGroupLimit pushes the k limit map-side)."""
    docs = t(spark, sf, "documents")
    rk = F.md5(F.concat_ws("|", F.lit("rsv"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(rk.asc(), F.col("doc_id").asc())
    return (docs.select("doc_id", "lang", "source", "n_chars")
                .withColumn("pick_rank", F.row_number().over(w))
                .filter(F.col("pick_rank") <= 10)
                .orderBy("lang", "pick_rank"))


SAMPLE_RESERVOIR_SQL = """
SELECT doc_id, lang, source, n_chars, pick_rank
FROM (SELECT doc_id, lang, source, n_chars,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('rsv|' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS pick_rank
      FROM documents)
WHERE pick_rank <= 10
ORDER BY lang, pick_rank
"""


# --- time-weighted average (irregular samples → honest mean) ------------

def time_weighted_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average of ``value`` per user (each sample weighted
    by how long it was current — the honest mean for irregularly-spaced
    series, timescale's time_weight('LOCF')).  One lead window per
    user; the last sample of each user carries zero weight (nothing it
    was current for)."""
    ev = t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    # exact integer accumulation (q1 idiom): value is cents-exact, dt
    # is integer µs, so cents×dt is an exact unit; the per-user sums
    # are order-free (units ride a decimal(38,0) sum — cents×µs
    # overflows int64 on year-long spans) and the quotient is ONE
    # shared double expression in both engines.
    weighted = (ev.select("user_id", "ts", "event_id", "value")
                  .withColumn("dt", dt)
                  .filter(F.col("dt").isNotNull())
                  .withColumn("units",
                              # cast BEFORE the multiply so the product
                              # is decimal (cents×µs can pass int64)
                              (F.expr("CAST(round(value * 100) AS BIGINT)")
                               .cast("decimal(19,0)") * F.col("dt"))
                              .cast("decimal(38,0)")))
    return (weighted.groupBy("user_id")
                    .agg((F.sum("units").cast("double")
                          / F.sum("dt").cast("double") / 100.0)
                         .alias("twa_value"),
                         F.count(F.lit(1)).alias("n_intervals"))
                    .orderBy("user_id"))


TIME_WEIGHTED_SQL = """
WITH seq AS (
  SELECT user_id,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT user_id,
       CAST(sum(CAST(CAST(cents AS HUGEINT) * dt AS DECIMAL(38,0))) AS DOUBLE)
         / CAST(sum(dt) AS DOUBLE) / 100.0 AS twa_value,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM seq WHERE dt IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "sketch_hll_union": (sketch_hll_union, SKETCH_HLL_SQL),
    "sample_reservoir_per_group": (sample_reservoir_per_group,
                                   SAMPLE_RESERVOIR_SQL),
    "time_weighted_avg": (time_weighted_avg, TIME_WEIGHTED_SQL),
}


def integrity_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit across the star schema — the
    validation half of the reference's watchdog (streaming/monitor.py
    checks liveness; this checks CONTENT): orphaned FKs and childless
    parents per relationship, one row per (relationship, issue)."""
    li = t(spark, sf, "lineitem")
    o = t(spark, sf, "orders")
    c = t(spark, sf, "customer")
    checks = [
        ("lineitem->orders", "orphan_child",
         li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")),
        ("orders->lineitem", "childless_parent",
         o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")),
        ("orders->customer", "orphan_child",
         o.join(c, o.o_custkey == c.c_custkey, "left_anti")),
        ("customer->orders", "childless_parent",
         c.join(o, c.c_custkey == o.o_custkey, "left_anti")),
    ]
    out = None
    for rel, issue, df in checks:
        row = df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(rel).alias("relationship"), F.lit(issue).alias("issue"),
            "n_rows")
        out = row if out is None else out.unionByName(row)
    return out


INTEGRITY_SQL = """
SELECT 'lineitem->orders' AS relationship, 'orphan_child' AS issue,
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_rows
UNION ALL
SELECT 'orders->lineitem', 'childless_parent',
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
UNION ALL
SELECT 'orders->customer', 'orphan_child',
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer->orders', 'childless_parent',
       (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
"""

QUERIES["integrity_audit"] = (integrity_audit, INTEGRITY_SQL)
