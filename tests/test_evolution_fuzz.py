"""Property fuzz of the evolving-batch pipeline: random interleavings of
row events and ADD/DROP DDL, random batch splits — the materialized
state must equal an independent driver-side replay model."""

import json
import shutil

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from storagetapper_spark.state import Registry, TableRegistration
from storagetapper_spark.streaming.evolution import (
    EVOLVING_CDC_SCHEMA,
    apply_evolving_batch,
)

BASE = T.StructType([T.StructField("f2", T.StringType())])
EXTRA_COLS = ["x1", "x2"]


@st.composite
def scripts(draw):
    """A seqno-ordered event script: inserts/deletes on a few keys with
    occasional ADD/DROP of x1/x2, plus 1-3 batch split points."""
    n = draw(st.integers(8, 24))
    events = []
    live = []                       # extra columns live at this point
    for seqno in range(1, n + 1):
        kind = draw(st.sampled_from(["ins", "ins", "ins", "del", "ddl"]))
        if kind == "ddl":
            col = draw(st.sampled_from(EXTRA_COLS))
            if col in live:
                live.remove(col)
                events.append(("ddl", seqno, f"ALTER TABLE t1 DROP COLUMN {col}"))
            else:
                live.append(col)
                events.append(("ddl", seqno, f"ALTER TABLE t1 ADD COLUMN {col} bigint"))
        else:
            pk = draw(st.integers(0, 4))
            if kind == "del":
                events.append(("del", seqno, pk, list(live)))
            else:
                events.append(("ins", seqno, pk, list(live)))
    n_splits = draw(st.integers(0, 2))
    splits = sorted(draw(st.lists(st.integers(1, n), min_size=n_splits,
                                  max_size=n_splits, unique=True)))
    return events, splits


def _model(events):
    """Driver-side replay: per-key latest image, reshaped by DDL order."""
    cols = ["f2"]
    state: dict[int, dict] = {}
    op: dict[int, str] = {}
    for ev in events:
        if ev[0] == "ddl":
            stmt = ev[2]
            col = stmt.split()[-2] if "ADD" in stmt else stmt.split()[-1]
            if "ADD" in stmt:
                cols.append(col)
                for img in state.values():
                    img.setdefault(col, None)
            else:
                cols.remove(col)
                for img in state.values():
                    img.pop(col, None)
        else:
            _, seqno, pk, live = ev
            img = {"f2": f"s{seqno}"}
            for c in cols[1:]:
                img[c] = seqno if c in live else None
            state[pk] = img
            op[pk] = "delete" if ev[0] == "del" else "insert"
    return cols, {pk: img for pk, img in state.items() if op[pk] != "delete"}


def _wire(events):
    out = []
    for ev in events:
        if ev[0] == "ddl":
            out.append({"pk": 0, "op": "schema", "seqno": ev[1],
                        "ddl": ev[2], "payload": None})
        else:
            _, seqno, pk, live = ev
            payload = {"f2": f"s{seqno}"}
            for c in live:
                payload[c] = seqno
            out.append({"pk": pk, "op": "delete" if ev[0] == "del" else "insert",
                        "seqno": seqno, "ddl": None,
                        "payload": json.dumps(payload)})
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(script=scripts())
def test_evolving_batches_match_replay_model(spark, tmp_path_factory, script):
    events, splits = script
    d = tmp_path_factory.mktemp("evofuzz")
    state = str(d / "state")
    registry = Registry(str(d / "reg.json"))
    registry.register(TableRegistration(
        service="s", cluster="c", db="d", table="t1",
        pk_cols=["pk"], schema_json=BASE.json()))

    wire = _wire(events)
    bounds = [0] + splits + [len(events) + 1]
    for i in range(len(bounds) - 1):
        chunk = [w for w in wire if bounds[i] < w["seqno"] <= bounds[i + 1]]
        if not chunk:
            continue
        batch = spark.createDataFrame(
            [(w["pk"], w["op"], w["seqno"], w["ddl"], w["payload"])
             for w in chunk], EVOLVING_CDC_SCHEMA)
        apply_evolving_batch(spark, batch, registry, "s.c.d.t1.v0",
                             state, ["pk"])

    cols, model = _model(events)
    cur = (spark.read.parquet(f"{state}/current")
           .filter("op <> 'delete'").collect())
    got_cols = [f.name for f in
                spark.read.parquet(f"{state}/current").schema.fields]
    assert got_cols == ["pk", "op", "seqno"] + cols
    got = {r.pk: {c: getattr(r, c) for c in cols} for r in cur}
    want = {pk: {c: img.get(c) for c in cols} for pk, img in model.items()}
    assert got == want
    shutil.rmtree(str(d), ignore_errors=True)
