"""Profiling batch 2: equi-depth histogram (the quantile-bucket twin
of the equi-width profile_histograms) and the transition entropy of the
event stream.

The equi-depth histogram runs on the scale-safe two-pass global rank
(operators/ranks.py) — no single-task window ever sees the fact table —
with ntile derived arithmetically from the rank (hypothesis-proven
bit-identical to the window ntile in test_ranks properties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storagetapper_spark.plans.common import events_t, t

_NTILES = 16


def profile_equidepth_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """16 equi-depth buckets of lineitem extended price: per bucket the
    row count (≈ n/16 by construction) and exact min/max cents — the
    quantile profile an optimizer's histogram stats want.  Total order
    ties break on (orderkey, linenumber) so both engines assign the
    identical tile to every row."""
    from storagetapper_spark.operators.ranks import (ntile_from_rank,
                                                     two_pass_rank)

    li = t(spark, sf, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long")
        .alias("cents"),
        "l_orderkey", "l_linenumber")
    ranked = two_pass_rank(
        li, [F.col("cents"), F.col("l_orderkey"), F.col("l_linenumber")],
        F.floor(F.col("cents") / 65536))
    tiled = ranked.select(
        "cents",
        ntile_from_rank(F.col("_rank"), F.col("_n"), _NTILES)
        .alias("tile"))
    return (tiled.groupBy("tile")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("cents").alias("min_cents"),
                 F.max("cents").alias("max_cents"))
            .orderBy("tile"))


EQUIDEPTH_SQL = f"""
WITH v AS (
  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         ntile({_NTILES}) OVER (ORDER BY
             CAST(round(l_extendedprice * 100) AS BIGINT),
             l_orderkey, l_linenumber) AS tile
  FROM lineitem
)
SELECT tile, count(*) AS n,
       min(cents) AS min_cents, max(cents) AS max_cents
FROM v
GROUP BY tile
ORDER BY tile
"""


QUERIES = {
    "profile_equidepth_histogram":
        (profile_equidepth_histogram, EQUIDEPTH_SQL),
}


def events_transition_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source-state conditional entropy of the next event type
    (H(next|cur) in micro-nats) plus each state's share of transitions
    — how predictable is each point of the journey?  One user-keyed
    window for the pairs, then everything runs on the |types|² cell
    table; per-cell entropy terms are micro-floored and integer-summed
    (no float accumulation)."""
    ev = events_t(spark, sf)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select(F.col("event_type").alias("src"),
                       F.lead("event_type").over(w).alias("dst"))
             .filter(F.col("dst").isNotNull()))
    cells = pairs.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    rs = cells.groupBy("src").agg(F.sum("n").alias("rs"))
    tot = rs.agg(F.sum("rs").alias("t"))
    term = F.floor(
        -(F.col("n").cast("double") / F.col("rs").cast("double"))
        * F.log(F.col("n").cast("double") / F.col("rs").cast("double"))
        * 1000000).cast("long")
    return (cells.join(F.broadcast(rs), "src")
            .select("src", "rs", term.alias("tm"))
            .groupBy("src", "rs")
            .agg(F.sum("tm").alias("entropy_micro_nats"))
            .crossJoin(F.broadcast(tot))
            .select("src",
                    F.col("rs").alias("n_transitions"),
                    "entropy_micro_nats",
                    F.floor(F.col("rs") * 1000000 / F.col("t"))
                    .cast("long").alias("share_micro"))
            .orderBy("src"))


TRANSITION_ENTROPY_SQL = """
WITH pairs AS (
  SELECT src, dst FROM (
    SELECT event_type AS src,
           lead(event_type) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS dst
    FROM events
  ) WHERE dst IS NOT NULL
),
cells AS (SELECT src, dst, count(*) AS n FROM pairs GROUP BY 1, 2),
rs AS (SELECT src, CAST(sum(n) AS BIGINT) AS rs FROM cells GROUP BY src),
tot AS (SELECT CAST(sum(rs) AS BIGINT) AS t FROM rs)
SELECT c.src, r.rs AS n_transitions,
       CAST(sum(CAST(floor(
           -(CAST(c.n AS DOUBLE) / r.rs)
           * ln(CAST(c.n AS DOUBLE) / r.rs) * 1000000) AS BIGINT))
            AS BIGINT) AS entropy_micro_nats,
       CAST(floor(r.rs * 1000000 / t.t) AS BIGINT) AS share_micro
FROM cells c JOIN rs r ON r.src = c.src CROSS JOIN tot t
GROUP BY c.src, r.rs, t.t
ORDER BY c.src
"""


QUERIES["events_transition_entropy"] = (events_transition_entropy,
                                        TRANSITION_ENTROPY_SQL)
