"""Streaming multi-touch attribution.

The streaming form of plans/relational10.attribution_linear: per-user
episode state (the count of each channel's touches since the user's
last purchase) is carried across micro-batches in a tiny per-user
state table; each purchase closes the episode, splitting its value
equally across the open touches (or crediting '(direct)' when there
are none), and the per-channel credit totals fold into a running
aggregate — write-new + swap, the house state protocol.

Because attribution is sequential per user, folding ORDERED batches on
top of the carried state equals the one-shot batch computation exactly
(tested), the same invariant the SCD2/IVM/CUSUM sinks prove.  State IO
is user-cardinality sized; the raw event stream only feeds the
per-user Arrow batches.
"""

from __future__ import annotations


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from storagetapper_spark.statefs import exists, join_uri

_CHANNELS = ["view", "click"]


def fold_attribution_batch(state: DataFrame | None, batch: DataFrame,
                           ) -> tuple[DataFrame, DataFrame]:
    """Fold one batch of raw events (user_id, event_id, event_type, ts,
    value) into the episode state.

    Returns (new_state, credits): new_state has one row per user with
    open touch counts; credits holds this batch's per-channel credit
    increments (channel, credit, n_credits).  Pure batch form — the
    sink wraps it."""
    spark = batch.sparkSession
    ev = batch.select("user_id", "event_id", "event_type", "ts", "value")
    if state is not None:
        seeded_state = state
    else:
        seeded_state = spark.createDataFrame(
            [], "user_id long, n_view long, n_click long")
    joined = (ev.join(F.broadcast(seeded_state), "user_id", "left"))

    out_schema = ("user_id long, kind string, channel string, "
                  "credit double, n long, n_view long, n_click long")

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        uid = int(pdf.user_id.iloc[0])
        nv = int(pdf.n_view.iloc[0]) if pd.notna(pdf.n_view.iloc[0]) else 0
        nc = int(pdf.n_click.iloc[0]) if pd.notna(pdf.n_click.iloc[0]) else 0
        credits: dict = {}
        n_credits: dict = {}
        for _, row in pdf.iterrows():
            et = row.event_type
            if et == "view":
                nv += 1
            elif et == "click":
                nc += 1
            elif et == "purchase":
                total = nv + nc
                if total == 0:
                    credits["(direct)"] = (credits.get("(direct)", 0.0)
                                           + float(row.value))
                    n_credits["(direct)"] = n_credits.get("(direct)", 0) + 1
                else:
                    share = float(row.value) / total
                    if nv:
                        credits["view"] = credits.get("view", 0.0) + share * nv
                        n_credits["view"] = n_credits.get("view", 0) + nv
                    if nc:
                        credits["click"] = (credits.get("click", 0.0)
                                            + share * nc)
                        n_credits["click"] = n_credits.get("click", 0) + nc
                nv = nc = 0
        rows = [{"user_id": uid, "kind": "state", "channel": None,
                 "credit": None, "n": None, "n_view": nv, "n_click": nc}]
        for ch, v in credits.items():
            rows.append({"user_id": uid, "kind": "credit", "channel": ch,
                         "credit": v, "n": n_credits[ch],
                         "n_view": None, "n_click": None})
        return pd.DataFrame(rows)

    folded = joined.groupBy("user_id").applyInPandas(fold, out_schema)
    folded = folded.persist()
    folded.count()
    new_state_rows = (folded.filter(F.col("kind") == "state")
                      .select("user_id", "n_view", "n_click"))
    if state is not None:
        untouched = state.join(new_state_rows.select("user_id"),
                               "user_id", "left_anti")
        new_state = new_state_rows.unionByName(untouched)
    else:
        new_state = new_state_rows
    credits = (folded.filter(F.col("kind") == "credit")
               .groupBy("channel")
               .agg(F.sum("credit").alias("credit"),
                    F.sum("n").alias("n_credits")))
    return new_state, credits


def attribution_sink(event_stream: DataFrame, state_dir: str,
                     checkpoint_dir: str,
                     trigger_available_now: bool = True):
    """foreachBatch attribution: carried episode state + running
    per-channel credit totals, write-new + swap both."""
    spark = event_stream.sparkSession

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # use the MICRO-BATCH's session for state reads: joining a
        # foreachBatch frame against a DataFrame from the outer session
        # can silently miss the broadcast seed (observed: episodes
        # closed as '(direct)' despite recorded open touches)
        bspark = batch_df.sparkSession
        st_cur = join_uri(state_dir, "episodes", "current")
        cr_cur = join_uri(state_dir, "credits", "current")
        st_v = st_cur.replace("current", f"v{batch_id}")
        cr_v = cr_cur.replace("current", f"v{batch_id}")
        cr_done = exists(join_uri(cr_v, "_SUCCESS"))
        st_done = exists(join_uri(st_v, "_SUCCESS"))
        # Replay guard (foreachBatch is at-least-once, ADVICE r3): a
        # completed v{batch_id} already contains this batch folded in —
        # re-folding on top of 'current' would double-count credits and
        # re-advance episode state.  Republishing the stored version is
        # idempotent whichever side of the swap the crash hit.
        if cr_done and st_done:
            bspark.read.parquet(cr_v).write.mode("overwrite").parquet(cr_cur)
            bspark.read.parquet(st_v).write.mode("overwrite").parquet(st_cur)
            return
        if cr_done:
            # crash landed between the credit publish and the state
            # write: cr_cur may ALREADY include this batch, so never
            # re-accumulate credits — republish cr_v, and redo only the
            # state fold (st_cur is still pre-batch).
            bspark.read.parquet(cr_v).write.mode("overwrite").parquet(cr_cur)
            state = (bspark.read.parquet(st_cur)
                     if exists(st_cur) else None)
            new_state, _ = fold_attribution_batch(state, batch_df)
            new_state.write.mode("overwrite").parquet(st_v)
            bspark.read.parquet(st_v).write.mode("overwrite").parquet(st_cur)
            return
        state = (bspark.read.parquet(st_cur)
                 if exists(st_cur) else None)
        new_state, credits = fold_attribution_batch(state, batch_df)
        if exists(cr_cur):
            prev = bspark.read.parquet(cr_cur)
            credits = (prev.unionByName(credits)
                       .groupBy("channel")
                       .agg(F.sum("credit").alias("credit"),
                            F.sum("n_credits").alias("n_credits")))
        # WRITE ORDER MATTERS: credits first.  Overwriting the episode
        # state path invalidates every cached plan that read it (Spark
        # refreshes caches by path on insert), so a credits lineage
        # executed AFTER the state swap would recompute against the NEW
        # state and mis-credit closed episodes as '(direct)' (observed).
        # Writing each df to its versioned path first pins its value
        # while all inputs are still the pre-batch files.
        for df, cur in ((credits, cr_cur), (new_state, st_cur)):
            nxt = cur.replace("current", f"v{batch_id}")
            df.write.mode("overwrite").parquet(nxt)
            bspark.read.parquet(nxt).write.mode("overwrite").parquet(cur)

    writer = (event_stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("update"))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_credits(spark, state_dir: str) -> DataFrame:
    return spark.read.parquet(join_uri(state_dir, "credits", "current"))
