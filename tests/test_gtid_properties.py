"""Property tests for sources/gtid.GTIDSet against the obvious model —
a plain set of integers per uuid.  Interval bookkeeping (sorted,
disjoint, coalesced) must be observationally equal to the model under
any add/merge/parse sequence."""

from hypothesis import given, settings
from hypothesis import strategies as st

from storagetapper_spark.sources.gtid import GTIDSet

U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
U2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"

gnos = st.lists(st.integers(min_value=1, max_value=200), min_size=0,
                max_size=60)


def _model_string(uuid: str, s: set[int]) -> str:
    if not s:
        return ""
    xs = sorted(s)
    runs, start = [], xs[0]
    for a, b in zip(xs, xs[1:] + [None]):
        if b != a + 1:
            runs.append((start, a))
            start = b
    return uuid + ":" + ":".join(f"{a}-{b}" if b > a else f"{a}"
                                 for a, b in runs)


@settings(max_examples=200, deadline=None)
@given(gnos)
def test_add_matches_set_model(xs):
    g, model = GTIDSet(), set()
    for x in xs:
        g.add(U1, x)
        model.add(x)
    assert g.to_string() == _model_string(U1, model)
    for probe in range(0, 202):
        assert g.contains(U1, probe) == (probe in model)


@settings(max_examples=200, deadline=None)
@given(gnos, gnos)
def test_merge_is_set_union(xs, ys):
    a, b = GTIDSet(), GTIDSet()
    for x in xs:
        a.add(U1, x)
    for y in ys:
        b.add(U1, y)
    assert a.merge(b).to_string() == _model_string(U1, set(xs) | set(ys))
    # merge is symmetric and leaves its operands untouched
    assert b.merge(a).to_string() == a.merge(b).to_string()
    assert a.to_string() == _model_string(U1, set(xs))


@settings(max_examples=200, deadline=None)
@given(gnos, gnos)
def test_parse_roundtrip(xs, ys):
    g = GTIDSet()
    for x in xs:
        g.add(U1, x)
    for y in ys:
        g.add(U2, y)
    assert GTIDSet.parse(g.to_string()).to_string() == g.to_string()
