"""Generalized N-step funnel: ordered sequence matching per user.

The 3-step SQL form (plans/timeseries2.py) chains one min-aggregation
per step — fine for fixed small N, clumsy for parameterized funnels.
This operator does greedy earliest-match per user in one
``applyInPandas`` pass: sort the user's (step-relevant) events once,
walk the step list forward.  Greedy-earliest is equivalent to the
min-agg chain (each step takes the first qualifying event after the
previous step), which the DuckDB-oracle-matched 3-step query pins down
— the equivalence is asserted in tests.

Scale: events filter to the step types BEFORE the shuffle; one hash
shuffle on user_id; per-user state is that user's step events only.
Skew = one hyperactive user, bounded by their own event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def funnel(events: DataFrame, steps: list[str],
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts", horizon_seconds: int | None = None) -> DataFrame:
    """Per-user funnel progress: (user, steps_completed, ts of each
    completed step).  ``horizon_seconds`` bounds the whole sequence
    relative to the step-1 event."""
    n = len(steps)
    out_schema = T.StructType([
        events.schema[user_col],
        T.StructField("steps_completed", T.IntegerType()),
        T.StructField("step_ts", T.ArrayType(T.TimestampType())),
    ])
    step_index = {s: i for i, s in enumerate(steps)}

    def walk(pdf):
        import pandas as pd
        # secondary sort on step order so an event at the SAME timestamp
        # as the previous step still qualifies (>= semantics of the SQL
        # min-agg chain)
        pdf = pdf.assign(_ord=pdf[type_col].map(step_index)) \
                 .sort_values([ts_col, "_ord"], kind="mergesort")
        reached = 0
        ts_list = []
        deadline = None
        for ev_type, ev_ts in zip(pdf[type_col], pdf[ts_col]):
            if reached >= n:
                break
            if step_index.get(ev_type) != reached:
                continue
            if reached == 0:
                if horizon_seconds is not None:
                    deadline = ev_ts + pd.Timedelta(seconds=horizon_seconds)
            elif deadline is not None and ev_ts > deadline:
                continue
            ts_list.append(ev_ts)
            reached += 1
        return pd.DataFrame({
            user_col: [pdf[user_col].iloc[0]],
            "steps_completed": [reached],
            "step_ts": [ts_list],
        })

    relevant = events.filter(F.col(type_col).isin(steps)) \
                     .select(user_col, type_col, ts_col)
    return relevant.groupBy(user_col).applyInPandas(walk, out_schema)


def funnel_counts(funnel_df: DataFrame, n_steps: int) -> DataFrame:
    """Collapse per-user progress to the classic funnel report: users
    reaching step ≥ i for each i."""
    aggs = [F.sum((F.col("steps_completed") >= i).cast("long"))
             .alias(f"step{i}")
            for i in range(1, n_steps + 1)]
    return funnel_df.agg(*aggs)
