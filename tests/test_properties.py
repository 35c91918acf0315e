"""Property-based tests (hypothesis) for the pure codec/key layers —
the reference has no property testing; this strengthens §5."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from storagetapper_spark.functions.avro_codec import (
    avro_decode_record,
    avro_encode_record,
)
from storagetapper_spark.functions.envelope import unwrap, wrap
from storagetapper_spark.functions.msgpack_codec import msgpack_pack, msgpack_unpack

# msgpack value universe: scalars + nested containers
scalars = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1),
    st.floats(allow_nan=False),
    st.text(max_size=200), st.binary(max_size=200),
)
values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=8),
        st.dictionaries(st.text(max_size=20), children, max_size=8)),
    max_leaves=25)


@given(values)
@settings(max_examples=300, deadline=None)
def test_msgpack_roundtrip_property(v):
    assert msgpack_unpack(msgpack_pack(v)) == v


avro_fields = [
    {"name": "a", "type": ["null", "long"]},
    {"name": "b", "type": ["null", "string"]},
    {"name": "c", "type": ["null", "bytes"]},
    {"name": "d", "type": ["null", "double"]},
    {"name": "e", "type": ["null", "boolean"]},
]
avro_rec = st.fixed_dictionaries({
    "a": st.one_of(st.none(), st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1)),
    "b": st.one_of(st.none(), st.text(max_size=300)),
    "c": st.one_of(st.none(), st.binary(max_size=300)),
    "d": st.one_of(st.none(), st.floats(allow_nan=False)),
    "e": st.one_of(st.none(), st.booleans()),
})


@given(avro_rec)
@settings(max_examples=300, deadline=None)
def test_avro_roundtrip_property(rec):
    assert avro_decode_record(avro_encode_record(rec, avro_fields), avro_fields) == rec


@given(st.binary(max_size=500), st.text(max_size=30),
       st.lists(st.text(max_size=20), min_size=1, max_size=4),
       st.integers(min_value=-(1 << 62), max_value=(1 << 62)))
@settings(max_examples=200, deadline=None)
def test_envelope_roundtrip_property(payload, fmt, key, seqno):
    header, out = unwrap(wrap(payload, fmt, key, seqno))
    assert out == payload
    assert header["Type"] == fmt and header["Key"] == key
    assert header["SeqNo"] == seqno


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 1000),
                          st.sampled_from(["insert", "delete"])),
                min_size=1, max_size=60))
@settings(max_examples=100, deadline=None)
def test_latest_state_model_property(events):
    """Model check of max-seqno-wins: the window-dedup result must equal
    a sequential replay of events in seqno order (ties: insert wins,
    matching the operator's tie-break)."""
    # deterministic python model
    best: dict[int, tuple] = {}
    for pk, seqno, op in events:
        cur = best.get(pk)
        if cur is None or (seqno, op) >= (cur[0], cur[1]):
            best[pk] = (seqno, op)
    expected = {pk for pk, (s, op) in best.items() if op != "delete"}

    # operator model (pure python mirror of the window expression)
    import itertools
    got = set()
    for pk, evs in itertools.groupby(sorted(events, key=lambda e: e[0]),
                                     key=lambda e: e[0]):
        top = max(evs, key=lambda e: (e[1], e[2]))
        if top[2] != "delete":
            got.add(pk)
    assert got == expected
