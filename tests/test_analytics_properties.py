"""Property-based invariants for the episode-attribution and
Kaplan-Meier constructions over RANDOM inputs (hypothesis drives the
data; pure-Python reference models check).  Few examples — each runs
Spark jobs."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# random per-user event streams: (user, seconds-offset, type, value)
streams = st.lists(
    st.tuples(st.integers(0, 2),                     # user
              st.integers(0, 50000),                 # ts offset sec
              st.sampled_from(["view", "click", "purchase"]),
              st.integers(1, 500)),                  # value (exact int)
    min_size=1, max_size=30, unique_by=lambda r: (r[0], r[1]))


def _attribution_spark(spark, rows):
    df = spark.createDataFrame(
        [(u, i, et, float(ts), float(v))
         for i, (u, ts, et, v) in enumerate(rows)],
        "user_id long, event_id long, event_type string, "
        "ts double, value double")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    ep = df.withColumn(
        "p_idx",
        F.coalesce(F.sum(F.when(F.col("event_type") == "purchase", 1)
                         .otherwise(0)).over(w), F.lit(0)))
    touches = (ep.filter(F.col("event_type") != "purchase")
               .groupBy("user_id", "p_idx")
               .agg(F.count(F.lit(1)).alias("n_touches")))
    purchases = (ep.filter(F.col("event_type") == "purchase")
                 .select("user_id", "p_idx",
                         F.col("value").alias("pv")))
    credited = (ep.filter(F.col("event_type") != "purchase")
                .join(purchases, ["user_id", "p_idx"])
                .join(touches, ["user_id", "p_idx"])
                .select("event_type",
                        (F.col("pv") / F.col("n_touches")).alias("credit")))
    direct = (purchases.join(touches, ["user_id", "p_idx"], "left")
              .filter(F.col("n_touches").isNull())
              .select(F.lit("(direct)").alias("event_type"),
                      F.col("pv").alias("credit")))
    return (credited.unionByName(direct)
            .groupBy("event_type").agg(F.sum("credit").alias("v")).collect())


@given(streams)
@settings(max_examples=8, deadline=None)
def test_attribution_conserves_value_random(spark, rows):
    out = _attribution_spark(spark, rows)
    total_attributed = sum(r.v for r in out)
    total_purchases = sum(v for (_, _, et, v) in rows if et == "purchase")
    assert math.isclose(total_attributed, total_purchases,
                        rel_tol=1e-9, abs_tol=1e-9)


# random lifetimes: (duration, censored?)
lifetimes = st.lists(st.tuples(st.integers(0, 10), st.booleans()),
                     min_size=1, max_size=40)


def _km_reference(items):
    from collections import Counter
    deaths = Counter(d for d, cens in items if not cens)
    counts = Counter(d for d, _ in items)
    n = len(items)
    out, s = {}, 1.0
    for t in sorted(counts):
        d = deaths.get(t, 0)
        if d:
            s *= 1.0 - d / n
            out[t] = s
        n -= counts[t]
    return out


def _km_spark(spark, items):
    df = spark.createDataFrame(
        [(i, d, 0 if cens else 1) for i, (d, cens) in enumerate(items)],
        "id long, duration long, event int")
    per_t = df.groupBy("duration").agg(F.sum("event").alias("d"),
                                       F.count(F.lit(1)).alias("c"))
    total = df.count()
    wb = (Window.orderBy("duration")
          .rowsBetween(Window.unboundedPreceding, -1))
    wc = (Window.orderBy("duration")
          .rowsBetween(Window.unboundedPreceding, 0))
    at_risk = per_t.withColumn(
        "n_risk", F.lit(total) - F.coalesce(F.sum("c").over(wb), F.lit(0)))
    term = F.when(F.col("d") < F.col("n_risk"),
                  F.log(1.0 - F.col("d") / F.col("n_risk")))
    dead = F.max(F.when(F.col("d") >= F.col("n_risk"), 1)
                 .otherwise(0)).over(wc)
    surv = at_risk.withColumn(
        "survival",
        F.when(dead == 1, F.lit(0.0)).otherwise(
            F.exp(F.coalesce(F.sum(term).over(wc), F.lit(0.0)))))
    return {r.duration: r.survival
            for r in surv.filter(F.col("d") > 0).collect()}


@given(lifetimes)
@settings(max_examples=8, deadline=None)
def test_km_matches_reference_random(spark, items):
    got = _km_spark(spark, items)
    want = _km_reference(items)
    assert set(got) == set(want)
    for t in want:
        assert math.isclose(got[t], want[t], rel_tol=1e-9, abs_tol=1e-12)
