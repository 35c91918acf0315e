"""schema/compat.classify: registry-semantics compatibility verdicts."""

from pyspark.sql import types as T

from storagetapper_spark.schema.compat import classify


def _s(*fields):
    return T.StructType([T.StructField(n, t, nullable) for n, t, nullable
                         in fields])


BASE = _s(("id", T.LongType(), False), ("v", T.StringType(), True))


def test_no_change_is_none():
    assert classify(BASE, BASE).level == "NONE"


def test_add_nullable_is_full():
    new = _s(("id", T.LongType(), False), ("v", T.StringType(), True),
             ("extra", T.StringType(), True))
    rep = classify(BASE, new)
    assert rep.level == "FULL" and rep.backward and rep.forward


def test_add_required_is_forward_only():
    new = _s(("id", T.LongType(), False), ("v", T.StringType(), True),
             ("extra", T.StringType(), False))
    rep = classify(BASE, new)
    assert rep.level == "FORWARD" and not rep.backward


def test_drop_nullable_is_full_drop_required_is_backward():
    dropped_v = _s(("id", T.LongType(), False))
    assert classify(BASE, dropped_v).level == "FULL"
    dropped_id = _s(("v", T.StringType(), True))
    rep = classify(BASE, dropped_id)
    assert rep.level == "BACKWARD" and not rep.forward


def test_widen_is_backward_narrow_is_forward():
    widened = _s(("id", T.LongType(), False), ("v", T.StringType(), True),
                 ("n", T.LongType(), True))
    base_n = _s(("id", T.LongType(), False), ("v", T.StringType(), True),
                ("n", T.IntegerType(), True))
    assert classify(base_n, widened).level == "BACKWARD"
    assert classify(widened, base_n).level == "FORWARD"


def test_incompatible_retype_breaks():
    retyped = _s(("id", T.LongType(), False), ("v", T.DoubleType(), True))
    rep = classify(BASE, retyped)
    assert rep.level == "BREAKING"
    assert not rep.backward and not rep.forward
    assert any(f.verdict == "breaking" for f in rep.findings)


def test_mixed_changes_intersect():
    # full-safe add + backward-only widen → BACKWARD overall
    new = _s(("id", T.LongType(), False), ("v", T.StringType(), True),
             ("n", T.LongType(), True), ("extra", T.StringType(), True))
    base_n = _s(("id", T.LongType(), False), ("v", T.StringType(), True),
                ("n", T.IntegerType(), True))
    assert classify(base_n, new).level == "BACKWARD"
    # backward-only + forward-only in one transition → BREAKING
    new2 = _s(("v", T.StringType(), True),          # drop required id
              ("extra", T.StringType(), False))     # add required
    assert classify(BASE, new2).level == "BREAKING"
