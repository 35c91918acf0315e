"""Property-based invariants of the history operators over RANDOM
changelogs (hypothesis drives the data; Spark computes; pure-Python
reference models check).  Few examples — each runs Spark jobs."""

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storagetapper_spark.operators.history import delta_stream, scd2_history
from storagetapper_spark.streaming.history import scd2_apply_batch

SCHEMA = T.StructType([
    T.StructField("pk", T.LongType()),
    T.StructField("val", T.DoubleType()),
    T.StructField("op", T.StringType()),
    T.StructField("seqno", T.LongType()),
])

# a random changelog: per-key unique seqnos, ops from the CDC alphabet
changelogs = st.lists(
    st.tuples(st.integers(0, 4),                      # pk
              st.integers(0, 999),                    # value cents
              st.sampled_from(["insert", "update", "delete"])),
    min_size=1, max_size=25,
).map(lambda rows: [
    {"pk": pk, "val": cents / 100.0, "op": op, "seqno": i}
    for i, (pk, cents, op) in enumerate(rows)])


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


@given(changelogs, st.integers(1, 24))
@settings(max_examples=12, deadline=None)
def test_scd2_incremental_equals_full_random(spark, cl, cut):
    full = scd2_history(_df(spark, cl), ["pk"])
    b1 = [r for r in cl if r["seqno"] < cut]
    b2 = [r for r in cl if r["seqno"] >= cut]
    state = None
    for b in (b1, b2):
        if b:
            state = scd2_apply_batch(state, _df(spark, b), ["pk"])
    key = lambda r: (r.pk, r.valid_from, r.valid_to, r.is_current, r.val)  # noqa: E731
    assert sorted(map(key, state.collect())) == sorted(map(key, full.collect()))


@given(changelogs)
@settings(max_examples=12, deadline=None)
def test_delta_fold_equals_python_model(spark, cl):
    """SUM of deltas per key == the reference model's final live value."""
    d = delta_stream(_df(spark, cl), ["pk"], "val",
                     decimal_type="decimal(18,2)")
    folded = {r.pk: r.s for r in
              d.groupBy("pk").agg(F.sum("value_delta").alias("s")).collect()}
    # python model: last state per key (0 when deleted)
    model: dict = {}
    for r in sorted(cl, key=lambda r: r["seqno"]):
        model[r["pk"]] = Decimal("0") if r["op"] == "delete" \
            else Decimal(f"{r['val']:.2f}")
    for pk, want in model.items():
        assert folded[pk] == want, (pk, folded[pk], want)


@given(changelogs)
@settings(max_examples=8, deadline=None)
def test_scd2_versions_partition_seqno_space(spark, cl):
    """Per key: versions are disjoint, ordered, and every non-delete
    event opens exactly one version."""
    hist = scd2_history(_df(spark, cl), ["pk"]).collect()
    n_versions = sum(1 for r in cl if r["op"] != "delete")
    assert len(hist) == n_versions
    by = {}
    for r in hist:
        by.setdefault(r.pk, []).append(r)
    for pk, vs in by.items():
        vs.sort(key=lambda r: r.valid_from)
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to is not None and a.valid_to <= b.valid_from
        assert sum(1 for v in vs if v.is_current) <= 1
