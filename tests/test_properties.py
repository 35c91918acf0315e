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


def _pack_compact(o) -> bytes:
    """Alternative encoder that always picks the MOST COMPACT msgpack
    representation (the choice Go msgp makes), unlike our encoder's
    fixed int64/str16 widths — used to property-test wire-compat decode."""
    import struct

    out = bytearray()

    def p(o):
        nonlocal out
        if o is None:
            out.append(0xC0)
        elif o is True:
            out.append(0xC3)
        elif o is False:
            out.append(0xC2)
        elif isinstance(o, int):
            if 0 <= o <= 0x7F:
                out.append(o)
            elif -32 <= o < 0:
                out.append(0x100 + o)
            elif 0 <= o <= 0xFF:
                out += bytes([0xCC, o])
            elif 0 <= o <= 0xFFFF:
                out.append(0xCD); out += struct.pack(">H", o)
            elif 0 <= o <= 0xFFFFFFFF:
                out.append(0xCE); out += struct.pack(">I", o)
            elif o > 0xFFFFFFFF and o < (1 << 64):
                out.append(0xCF); out += struct.pack(">Q", o)
            elif -0x80 <= o < 0:
                out.append(0xD0); out += struct.pack(">b", o)
            elif -0x8000 <= o < 0:
                out.append(0xD1); out += struct.pack(">h", o)
            elif -0x80000000 <= o < 0:
                out.append(0xD2); out += struct.pack(">i", o)
            else:
                out.append(0xD3); out += struct.pack(">q", o)
        elif isinstance(o, float):
            out.append(0xCB); out += struct.pack(">d", o)
        elif isinstance(o, str):
            b = o.encode()
            if len(b) <= 31:
                out.append(0xA0 | len(b))
            elif len(b) <= 0xFF:
                out.append(0xD9); out.append(len(b))
            else:
                out.append(0xDA); out += struct.pack(">H", len(b))
            out += b
        elif isinstance(o, list):
            assert len(o) <= 15
            out.append(0x90 | len(o))
            for x in o:
                p(x)
        elif isinstance(o, dict):
            assert len(o) <= 15
            out.append(0x80 | len(o))
            for k, v in o.items():
                p(k); p(v)
        else:
            raise TypeError(type(o))

    p(o)
    return bytes(out)


@given(st.recursive(
    st.none() | st.booleans()
    | st.integers(min_value=-(2 ** 63), max_value=2 ** 64 - 1)
    | st.text(max_size=300),
    lambda children: st.lists(children, max_size=5)
    | st.dictionaries(st.text(max_size=8), children, max_size=5),
    max_leaves=20))
@settings(deadline=None, max_examples=200)
def test_msgpack_decodes_any_compact_layout(v):
    """Wire-compat: whatever compact width another encoder picks for the
    same value (uint8 vs int64, fixstr vs str8 ...), decode yields the
    identical Python value."""
    assert msgpack_unpack(_pack_compact(v)) == v
