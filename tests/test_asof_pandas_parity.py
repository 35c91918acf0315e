"""Property test: asof_join == pandas.merge_asof on arbitrary inputs.

pandas' merge_asof is the de-facto semantics reference for as-of joins
(backward/forward, inclusive matching, tolerance).  Hypothesis drives
random key/timestamp/payload frames through both implementations and
requires identical match results — including the tie (equal-timestamp)
and boundary (staleness exactly == tolerance) cases that hand-written
examples tend to miss.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from storagetapper_spark.operators.asof import asof_join

_BASE = dt.datetime(2024, 1, 1)


def _frames(draw):
    keys = ["a", "b"]
    n_left = draw(st.integers(1, 8))
    n_right = draw(st.integers(0, 8))
    left = [(draw(st.sampled_from(keys)),
             _BASE + dt.timedelta(seconds=draw(st.integers(0, 50))),
             i)
            for i in range(n_left)]
    right_seen = set()
    right = []
    for _ in range(n_right):
        k = draw(st.sampled_from(keys))
        ts = _BASE + dt.timedelta(seconds=draw(st.integers(0, 50)))
        if (k, ts) in right_seen:  # unique (key, ts) → deterministic match
            continue
        right_seen.add((k, ts))
        right.append((k, ts, float(len(right))))
    return left, right


@st.composite
def asof_case(draw):
    left, right = _frames(draw)
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    tolerance = draw(st.one_of(st.none(), st.integers(0, 30)))
    return left, right, direction, tolerance


@settings(max_examples=25, deadline=None)
@given(asof_case())
def test_matches_pandas_merge_asof(spark, case):
    left, right, direction, tolerance = case
    ldf = spark.createDataFrame(left, "k string, ts timestamp, lid int")
    rdf = spark.createDataFrame(
        right, "k string, ts timestamp, v double") if right else \
        spark.createDataFrame([], "k string, ts timestamp, v double")
    got_rows = asof_join(
        ldf, rdf, by=["k"], direction=direction,
        tolerance_sec=tolerance).collect()
    got = {r.lid: r.v_asof for r in got_rows}

    lpd = (pd.DataFrame(left, columns=["k", "ts", "lid"])
           .sort_values("ts", kind="stable"))
    rpd = (pd.DataFrame(right, columns=["k", "ts", "v"])
           .sort_values("ts", kind="stable"))
    if rpd.empty:
        expected = {lid: None for _, _, lid in left}
    else:
        merged = pd.merge_asof(
            lpd, rpd, on="ts", by="k", direction=direction,
            tolerance=(pd.Timedelta(seconds=tolerance)
                       if tolerance is not None else None))
        expected = {int(r.lid): (None if pd.isna(r.v) else float(r.v))
                    for r in merged.itertuples()}
    assert got == expected, (left, right, direction, tolerance)
