"""pq_encode_np (operators/similarity): the r10 Arrow/numpy rewrite of
the PQ + coarse-cell encoder must reproduce the exact-int64 argmin the
expression form computed — including tie-breaks to the LOWEST code/cell
(the array_min struct(d, k) convention) — on adversarial inputs with
deliberate distance ties.
"""

from __future__ import annotations

import random

from storagetapper_spark.operators.similarity import pq_encode_np

SUBS, SUBDIM = 4, 4
DIM = SUBS * SUBDIM
K, CELLS = 3, 3


def _py_encode(vec, cb, coarse):
    """Reference: exact int L2² argmin, first-minimum tie-break."""
    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cell = min(range(len(coarse)), key=lambda k: (d2(vec, coarse[k]), k))
    out = []
    for s in range(SUBS):
        sv = vec[s * SUBDIM:(s + 1) * SUBDIM]
        code = min(range(len(cb)),
                   key=lambda k: (d2(sv, cb[k][s * SUBDIM:(s + 1) * SUBDIM]),
                                  k))
        out.append((s, code, d2(sv, cb[code][s * SUBDIM:(s + 1) * SUBDIM])))
    return cell, out


def test_pq_encode_np_matches_reference_with_ties(spark):
    rng = random.Random(7)
    # tiny value range forces frequent exact-distance ties
    vecs = [[rng.randint(-2, 2) for _ in range(DIM)] for _ in range(60)]
    cb = {k: [rng.randint(-2, 2) for _ in range(DIM)] for k in range(K)}
    coarse = {k: [rng.randint(-2, 2) for _ in range(DIM)]
              for k in range(CELLS)}
    # duplicate codebook entries: every argmin on them is a pure tie
    cb[2] = list(cb[0])
    coarse[1] = list(coarse[0])

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, xq array<long>")
    got = {(r.vec_id, r.sub): (r.cell, r.code, r.d)
           for r in pq_encode_np(df, cb, SUBS, SUBDIM, coarse=coarse,
                                 with_dist=True).collect()}
    assert len(got) == len(vecs) * SUBS
    for i, v in enumerate(vecs):
        cell, subs = _py_encode(v, cb, coarse)
        for s, code, d in subs:
            assert got[(i, s)] == (cell, code, d), (i, s)


def test_pq_encode_np_without_coarse_or_dist(spark):
    rng = random.Random(11)
    vecs = [[rng.randint(-1000000, 1000000) for _ in range(DIM)]
            for _ in range(20)]
    cb = {k: [rng.randint(-1000000, 1000000) for _ in range(DIM)]
          for k in range(K)}
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, xq array<long>")
    rows = pq_encode_np(df, cb, SUBS, SUBDIM).collect()
    assert {f for f in rows[0].asDict()} == {"vec_id", "sub", "code"}
    got = {(r.vec_id, r.sub): r.code for r in rows}
    for i, v in enumerate(vecs):
        _, subs = _py_encode(v, cb, {0: v})
        for s, code, _d in subs:
            assert got[(i, s)] == code
