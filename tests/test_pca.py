"""PCA batch invariants: the quantized power iteration reproduced
exactly in numpy, its monotone lower-bound contract against the TRUE
spectrum (from the scatter-matrix query + driver-side eigh), and the
scatter matrix against a direct numpy GEMM."""

import math

import numpy as np
import pandas as pd
import pytest

from storagetapper_spark.plans import pca as P
from storagetapper_spark.plans.registry import QUERIES


@pytest.fixture(scope="module")
def quantized(sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    x = np.floor(np.stack(pdf.embedding.values).astype("float64")
                 * 1e6).astype("int64")
    m = np.floor(x.sum(0, dtype="int64") / len(x)).astype("int64")
    return x - m, m


def _replicate_iteration(c):
    """The exact integer-quantized power iteration, in numpy."""
    v = np.full(P._DIM, P._V0, dtype="int64")
    shares = []
    trace = int((c.astype(object) ** 2).sum())
    for _ in range(P._ITERS):
        s = (c * v).sum(1)                        # int64, exact
        sp = np.floor(s / 1_000_000.0).astype("int64")
        y = (sp[:, None] * c).sum(0)              # int64, exact
        norm2 = sum(int(t) * int(t) for t in y)   # python bigint
        norm = math.sqrt(float(norm2))
        shares.append(norm / float(trace))
        v = np.array([math.floor(float(t) / norm * 1_000_000.0)
                      for t in y], dtype="int64")
    return v, shares, trace


def test_power_iteration_matches_numpy_replica(spark, sf_dir, quantized):
    c, m = quantized
    out = sorted(QUERIES["embedding_pca_power_iteration"](spark, sf_dir)
                 .collect(), key=lambda r: r.dim)
    v, shares, trace = _replicate_iteration(c)
    assert [r.mean_micro for r in out] == list(m)
    assert [r.v_micro for r in out] == list(v)
    assert out[0].growth_share_micro == math.floor(shares[-1] * 1e6)


def test_growth_share_is_monotone_lower_bound(spark, sf_dir, quantized):
    c, _ = quantized
    _, shares, trace = _replicate_iteration(c)
    # monotone non-decreasing (log-convexity of k -> ||S^k x||)
    assert all(b >= a - 1e-12 for a, b in zip(shares, shares[1:]))
    s_mat = (c.T @ c).astype("float64")
    top = float(np.linalg.eigvalsh(s_mat)[-1])
    assert shares[-1] <= top / float(trace) + 1e-12


def test_scatter_matrix_matches_numpy_gemm(spark, sf_dir, quantized):
    c, _ = quantized
    out = QUERIES["embedding_scatter_matrix"](spark, sf_dir).collect()
    assert len(out) == P._DIM * (P._DIM + 1) // 2
    s_mat = c.T @ c  # int64 exact at fixture scale
    for r in out:
        assert r.s_jk == int(s_mat[r.j, r.k])
    # driver-side eigh on the query output reproduces the true top share
    full = np.zeros((P._DIM, P._DIM))
    for r in out:
        full[r.j, r.k] = full[r.k, r.j] = float(r.s_jk)
    top_share = (float(np.linalg.eigvalsh(full)[-1])
                 / float(np.trace(full)))
    _, shares, _ = _replicate_iteration(c)
    assert shares[-1] <= top_share + 1e-12
    # fixture spectrum is flat by design (documented in pca.py)
    assert top_share < 0.10
