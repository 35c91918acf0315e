"""Replays for the round-7 continuation batch G: partition-key
advisor, DP noise calibration, and the overlapping audio-chunk plan —
literal pandas replays plus the structural invariants each plan
promises."""

import math

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_partition_advisor_replay(spark, sf_dir):
    rows = {(r.candidate_key, r.workload): r
            for r in QUERIES["layout_partition_advisor"](spark,
                                                         sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    day = pd.to_datetime(o.o_orderdate).dt.strftime("%Y-%m-%d")
    month = pd.to_datetime(o.o_orderdate).dt.strftime("%Y-%m")
    prio = o.o_orderpriority
    n = len(o)
    expect = {
        ("day", "month_eq"): int(day.str.startswith("1997-03").sum()),
        ("month", "month_eq"): int((month == "1997-03").sum()),
        ("priority", "month_eq"): n,
        ("day", "day_range"): int(((day >= "1996-06-10")
                                   & (day < "1996-07-10")).sum()),
        ("month", "day_range"): int(month.isin(["1996-06",
                                                "1996-07"]).sum()),
        ("priority", "day_range"): n,
        ("day", "priority_eq"): n,
        ("month", "priority_eq"): n,
        ("priority", "priority_eq"): int((prio == "1-URGENT").sum()),
    }
    nparts = {"day": day.nunique(), "month": month.nunique(),
              "priority": prio.nunique()}
    assert len(rows) == 9
    for (cand, wl), want in expect.items():
        r = rows[(cand, wl)]
        assert r.scanned_rows == want, (cand, wl)
        assert r.total_rows == n
        assert r.n_partitions == nparts[cand]
        assert r.scan_ppm == want * 1_000_000 // n
    # the aligned key always scans no more than a misaligned one
    assert rows[("month", "month_eq")].scanned_rows \
        <= rows[("priority", "month_eq")].scanned_rows
    assert rows[("day", "day_range")].scanned_rows \
        <= rows[("month", "day_range")].scanned_rows


def test_dp_calibration_replay(spark, sf_dir):
    rows = {r.eps_milli: r
            for r in QUERIES["privacy_dp_noise_calibration"](
                spark, sf_dir).collect()}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")[
        ["c_custkey", "c_nationkey"]]
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    per_cust = j.groupby("o_custkey").agg(
        k=("o_orderkey", "size"), nat=("c_nationkey", "max"))
    sens = int(per_cust.k.max())
    per_nation = per_cust.groupby("nat").k.sum()
    min_count, n_groups = int(per_nation.min()), len(per_nation)
    for eps_milli in (100, 500, 1000, 2000):
        b = sens / (eps_milli / 1000.0)
        r = rows[eps_milli]
        assert r.sensitivity == sens
        assert (r.min_count, r.n_groups) == (min_count, n_groups)
        assert r.laplace_scale_milli == math.floor(b * 1000.0)
        assert r.worst_rel_err_ppm == math.floor(b / min_count * 1e6)
    # scale is inversely proportional to epsilon (20x across the grid)
    assert rows[100].laplace_scale_milli \
        == 20 * rows[2000].laplace_scale_milli


def test_audio_chunk_plan_replay(spark, sf_dir):
    rows = {r.doc_id: r
            for r in QUERIES["multimodal_audio_chunk_plan"](
                spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    auds = docs[docs.doc_id % 3 == 1]
    W, S = 30000, 25000
    assert set(rows) == set(auds.doc_id)
    for _, it in auds.iterrows():
        dur = len(it.text.encode("utf-8"))
        nch = 1 if dur <= W else 1 + math.ceil((dur - W) / S)
        covered = padded = 0
        for i in range(nch):
            start = i * S
            end = min(start + W, dur)
            covered += end - start
            padded += W - (end - start)
        r = rows[it.doc_id]
        assert r.dur_ms == dur
        assert r.n_chunks == nch
        assert r.padded_ms == padded
        assert r.overlap_ms == covered - dur
        # every ms of audio is covered at least once: overlap >= 0 and
        # chunks span [0, dur)
        assert r.overlap_ms >= 0
        assert (nch - 1) * S + W >= dur
