"""Skew and co-location machinery — the partitioning levers that decide
whether a plan survives a 1000-executor, 100 TB run.

- ``salted_join``: explicit key-salting for joins where one side has hot
  keys AQE can't split (e.g. the build side must replicate).  The hot
  side gets a random-ish-but-deterministic salt; the other side explodes
  over all salt values for the affected keys.
- ``salted_agg``: two-phase aggregation for hot grouping keys — partial
  aggregate on (key, salt), final aggregate on key.  Only combinable
  aggregates (sum/count/min/max) qualify.
- ``write_bucketed`` / ``bucketed_join_ready``: persist both sides of a
  recurring join bucketed+sorted on the key so the join is co-located
  (no Exchange in the plan) — the Spark analog of the reference's "one
  Kafka partition per key range" layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(left: DataFrame, right: DataFrame, key: str,
                n_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join with the LEFT side salted (use when left's key
    distribution is skewed and right is too large to broadcast).

    left rows get salt = hash(full row key) % n_salts — deterministic;
    right rows are replicated across all salts.  The shuffle key becomes
    (key, salt): a hot key now spreads over n_salts reducers instead of
    one.  Cost: right side is written n_salts×; choose n_salts ≈ the
    observed hot-key multiplier."""
    lsalt = (F.abs(F.xxhash64(*left.columns)) % n_salts).alias("_salt")
    l = left.select("*", lsalt)
    r = right.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt"))
    out = l.join(r, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def salted_agg(df: DataFrame, key_cols: list[str], aggs: dict[str, str],
               n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation for skewed keys: phase 1 aggregates
    (key, salt) partitions, phase 2 merges per key.

    ``aggs`` maps column → one of sum|count|min|max (combinable only;
    avg must be decomposed to sum+count by the caller).  Note Spark's
    hash aggregate already does map-side partial aggregation — explicit
    salting only helps when a single reduce key overflows one task even
    after partials (e.g. extreme cardinality-1 groups with collect-like
    state).  Provided for those cases; measure before using."""
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in df.columns])) % n_salts).alias("_salt")
    phase1_aggs = []
    for col, fn in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(f"_p_{col}"))
        elif fn in ("sum", "min", "max"):
            phase1_aggs.append(getattr(F, fn)(col).alias(f"_p_{col}"))
        else:
            raise ValueError(f"non-combinable aggregate: {fn}")
    p1 = df.select("*", salt).groupBy(*key_cols, "_salt").agg(*phase1_aggs)
    phase2_aggs = []
    for col, fn in aggs.items():
        merge = "sum" if fn in ("count", "sum") else fn
        phase2_aggs.append(getattr(F, merge)(f"_p_{col}").alias(f"{fn}_{col}"))
    return p1.groupBy(*key_cols).agg(*phase2_aggs)


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 32, sort: bool = True) -> None:
    """Persist bucketed+sorted by the join/merge key.  Two tables
    bucketed the same way join with zero Exchange — the co-located-join
    layout for recurring snapshot↔changelog merges."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table_name)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges in the physical plan — the metric the
    bucketing layout is meant to drive to zero (used by tests)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
