"""As-of join and time-range join — time-series operators Spark lacks as
built-ins, composed from existing DataFrame ops (no UDFs).

As-of join (backward): for each left row, the latest right row with
``right.ts <= left.ts`` within the same key — the "state as of T" query
a CDC consumer asks of the changelog (what did row K look like when
event E happened?).

Implementation is the scalable union trick, not a range join: tag both
sides, union, and run ``last_value(ignorenulls)`` over a
(key)-partitioned, ts-ordered window.  One shuffle on the key, linear
state, no quadratic candidate set — survives 100 TB where a naive
``l.ts >= r.ts`` theta-join would explode.

Time-range join: pairs within [lower, upper) of each other, bucketed by
time so each row joins only its own and neighboring buckets —
Σ(bucket²) instead of n², same blocking idea as the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import MapType


def _with_tiebreak(right: DataFrame, by: list[str], right_ts: str,
                   right_cols: list[str]) -> DataFrame:
    """Stable right-side tiebreak (ADVICE r6): when several right rows
    share (key, ts), the window fills below would otherwise pick an
    unspecified one — nondeterministic across runs/partitionings.
    xxhash64 over the row's own content is deterministic everywhere
    (unlike monotonically_increasing_id, which depends on the physical
    partitioning), so ordering the fill window by it makes the winner
    the max-hash row: arbitrary but REPEATABLE.  Map-typed payload
    columns are skipped (not hashable); two rows differing only in a
    map column remain tied, which is then harmless for every hashable
    column."""
    src = [c for c in dict.fromkeys([*by, right_ts, *right_cols])
           if not isinstance(right.schema[c].dataType, MapType)]
    return right.withColumn("_asof_tie", F.xxhash64(*src))


def asof_join(left: DataFrame, right: DataFrame, by: list[str],
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              suffix: str = "_asof",
              tolerance_sec: float | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join.  Right payload columns arrive as ``<col><suffix>``;
    left rows with no matching right row get nulls.

    ``direction='backward'`` (default): latest right row with
    ``right.ts <= left.ts``; ``'forward'``: earliest right row with
    ``right.ts >= left.ts`` (pandas ``merge_asof`` semantics, same
    single-window plan with the sort reversed).

    ``direction='nearest'``: whichever of the backward/forward matches
    is closer in time (ties → backward, pandas ``merge_asof`` rule).
    Both fills run over the SAME key-partitioned union — one shuffle,
    two sorts — and the per-row winner is chosen by comparing the two
    carried match timestamps, so "nearest" costs one extra window, not
    a join of two asof results.

    ``tolerance_sec``: maximum staleness (backward) / lookahead
    (forward) / absolute distance (nearest) — matches further than the
    bound come back as nulls, exactly pandas' ``tolerance``.
    Implemented by carrying the matched right timestamp through the
    window fill and null-masking after, so it adds zero extra
    shuffles."""
    if direction == "nearest":
        return _asof_nearest(left, right, by, left_ts, right_ts,
                             right_cols, suffix, tolerance_sec)
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}")
    right_cols = right_cols or [c for c in right.columns
                                if c not in by and c != right_ts]
    right = _with_tiebreak(right, by, right_ts, right_cols)
    # tolerance needs the matched right timestamp to survive the fill —
    # carry it as one more payload column, mask, then drop
    fill_cols = list(right_cols)
    if tolerance_sec is not None:
        fill_cols.append("_asof_rt")
        right = right.withColumn("_asof_rt", F.col(right_ts))
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_r__asof_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in fill_cols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.col("_asof_tie").alias("_r__asof_tie"),
        *[F.col(c).alias(f"_r_{c}") for c in fill_cols],
    ).select(*l_tag.columns)  # align column order
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts (_is_left asc) so the
    # inclusive <=/>= semantics hold; forward = the same scan over
    # reversed time, so "latest prior" becomes "earliest later"; the
    # content-hash tiebreak makes the pick among equal-ts right rows
    # repeatable across runs/partitionings
    order = [F.col("_t") if direction == "backward" else F.col("_t").desc(),
             F.col("_is_left"), F.col("_r__asof_tie").asc_nulls_first()]
    w = (Window.partitionBy(*by).orderBy(*order)
               .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "*", *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
               for c in fill_cols])
    out = filled.filter(F.col("_is_left") == 1)
    if tolerance_sec is not None:
        lag = (F.col("_t").cast("double")
               - F.col(f"_asof_rt{suffix}").cast("double"))
        if direction == "forward":
            lag = -lag
        in_tol = lag <= F.lit(float(tolerance_sec))
        out = out.select(
            *[c for c in out.columns
              if not (c.startswith("_r_") or c == f"_asof_rt{suffix}"
                      or c in ("_t", "_is_left"))
              and not (c[:-len(suffix)] in right_cols and c.endswith(suffix))],
            *[F.when(in_tol, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
              for c in right_cols])
        return out
    return out.drop("_t", "_is_left", "_r__asof_tie",
                    *[f"_r_{c}" for c in fill_cols])


def _asof_nearest(left: DataFrame, right: DataFrame, by: list[str],
                  left_ts: str, right_ts: str,
                  right_cols: list[str] | None, suffix: str,
                  tolerance_sec: float | None) -> DataFrame:
    """direction='nearest': one key-shuffled union, a backward and a
    forward last_value fill (two sorts, same exchange), winner by
    smaller |Δt| with ties to backward (pandas merge_asof)."""
    right_cols = right_cols or [c for c in right.columns
                                if c not in by and c != right_ts]
    right = _with_tiebreak(right, by, right_ts, right_cols)
    fill_cols = list(right_cols) + ["_asof_rt"]
    right = right.withColumn("_asof_rt", F.col(right_ts))
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast("long").alias("_r__asof_tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in fill_cols],
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in by],
        *[F.col(c) for c in by],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.col("_asof_tie").alias("_r__asof_tie"),
        *[F.col(c).alias(f"_r_{c}") for c in fill_cols],
    ).select(*l_tag.columns)
    unioned = l_tag.unionByName(r_tag)
    tie = F.col("_r__asof_tie").asc_nulls_first()
    wb = (Window.partitionBy(*by)
          .orderBy(F.col("_t"), F.col("_is_left"), tie)
          .rowsBetween(Window.unboundedPreceding, 0))
    wf = (Window.partitionBy(*by)
          .orderBy(F.col("_t").desc(), F.col("_is_left"), tie)
          .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "*",
        *[F.last(f"_r_{c}", ignorenulls=True).over(wb).alias(f"_b_{c}")
          for c in fill_cols],
        *[F.last(f"_r_{c}", ignorenulls=True).over(wf).alias(f"_f_{c}")
          for c in fill_cols])
    out = filled.filter(F.col("_is_left") == 1)
    t = F.col("_t").cast("double")
    lag_b = t - F.col("_b__asof_rt").cast("double")
    lag_f = F.col("_f__asof_rt").cast("double") - t
    if tolerance_sec is not None:
        tol = F.lit(float(tolerance_sec))
        b_ok = F.col("_b__asof_rt").isNotNull() & (lag_b <= tol)
        f_ok = F.col("_f__asof_rt").isNotNull() & (lag_f <= tol)
    else:
        b_ok = F.col("_b__asof_rt").isNotNull()
        f_ok = F.col("_f__asof_rt").isNotNull()
    # backward wins ties (lag_b <= lag_f), and whenever forward is out
    use_b = b_ok & (~f_ok | (lag_b <= lag_f))
    use_f = f_ok & ~use_b
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        *[F.when(use_b, F.col(f"_b_{c}"))
           .when(use_f, F.col(f"_f_{c}"))
           .alias(f"{c}{suffix}")
          for c in right_cols])


def time_range_join(left: DataFrame, right: DataFrame, by: list[str],
                    left_ts: str = "ts", right_ts: str = "rts",
                    lower_sec: float = 0.0, upper_sec: float = 3600.0) -> DataFrame:
    """Pairs with ``left.ts + lower <= right.ts < left.ts + upper`` within
    the same key.  Bucketing by ``upper - lower`` bounds the join fan-in:
    each left row meets only candidates in its bucket and the next one.
    """
    width = upper_sec - lower_sec
    assert width > 0
    l_epoch = F.col(left_ts).cast("double")
    r_epoch = F.col(right_ts).cast("double")
    l_b = left.withColumn("_e", l_epoch + F.lit(lower_sec)) \
              .withColumn("_bkt", F.explode(F.array(
                  F.floor((l_epoch + lower_sec) / width).cast("long"),
                  F.floor((l_epoch + lower_sec) / width).cast("long") + 1)))
    r_b = right.withColumn("_re", r_epoch) \
               .withColumn("_bkt", F.floor(r_epoch / width).cast("long"))
    # a (left, right) pair can match in at most one bucket (right lives in
    # exactly one; left's two candidate buckets are distinct) — no dedup
    return (l_b.join(r_b, on=[*by, "_bkt"])
               .filter((F.col("_re") >= F.col("_e"))
                       & (F.col("_re") < F.col("_e") + F.lit(width)))
               .drop("_bkt", "_e", "_re"))
