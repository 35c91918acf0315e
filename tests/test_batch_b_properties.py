"""Replays for the round-7 continuation batch B: int8 per-dim
quantization audit, Cohen's kappa, normalization-layer exact dedup,
token-budget epoch allocation, and 4-truss peeling — each recomputed
with an independent literal pandas/numpy (or networkx-free pure
Python) implementation on the raw fixture."""

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from storagetapper_spark.plans.registry import QUERIES


def test_quantization_error_replay(spark, sf_dir):
    rows = QUERIES["embedding_quantization_error"](spark, sf_dir).collect()
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64)
                   * 1e6).astype(np.int64)
    amax = np.abs(mat).max(axis=0)
    assert len(rows) == mat.shape[1]
    for r in rows:
        xq = mat[:, r.dim].astype(np.float64)
        a = float(amax[r.dim])
        q = np.floor(xq * 127.0 / a + 0.5)
        err = np.floor(np.abs(q * a / 127.0 - xq)).astype(np.int64)
        assert r.amax_micro == amax[r.dim]
        assert r.max_abs_err_micro == err.max()
        assert r.mean_abs_err_micro == math.floor(err.sum() / len(err))
        # int8 max-abs rounding error is bounded by half a step
        assert r.max_abs_err_micro <= a / 127.0 / 2.0 + 1.0
        assert r.max_rel_err_ppm <= 1_000_000 / 127 / 2 + 1


def test_cohen_kappa_replay(spark, sf_dir):
    row = QUERIES["ml_cohen_kappa"](spark, sf_dir).collect()[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    ra = np.where(o.o_totalprice < 170000.0, "low",
                  np.where(o.o_totalprice < 340000.0, "mid", "high"))
    rb = np.where(o.o_orderpriority.isin(["1-URGENT", "2-HIGH"]), "high",
                  np.where(o.o_orderpriority == "3-MEDIUM", "mid", "low"))
    n = len(o)
    po = float((ra == rb).sum()) / n
    pe = sum((float((ra == k).sum()) * float((rb == k).sum())) / (n * n)
             for k in ("low", "mid", "high"))
    kappa = (po - pe) / (1.0 - pe)
    assert row.n == n
    assert row.po_micro == math.floor(po * 1e6)
    assert row.pe_micro == math.floor(pe * 1e6)
    assert row.kappa_milli == math.floor(kappa * 1000.0)
    # independent raters: kappa must hug 0 far more tightly than po
    assert abs(row.kappa_milli) < 200


def test_normalized_dedup_replay(spark, sf_dir):
    row = QUERIES["dedup_normalized_exact"](spark, sf_dir).collect()[0]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    norm = (docs.text.str.lower()
            .str.replace(r"[^a-z0-9 ]", " ", regex=True)
            .str.replace(r" +", " ", regex=True).str.strip())
    c = Counter(norm)
    assert row.n_docs == len(docs)
    assert row.distinct_raw == docs.text.nunique()
    assert row.distinct_norm == len(c)
    assert row.dupes_normalized == len(docs) - len(c)
    assert row.largest_cluster == max(c.values())
    assert row.docs_in_dup_clusters == sum(v for v in c.values() if v > 1)
    # normalization can only merge clusters, never split them
    assert row.distinct_norm <= row.distinct_raw


def test_epoch_allocation_replay(spark, sf_dir):
    rows = QUERIES["sample_epoch_allocation"](spark, sf_dir).collect()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = (docs.text.str.len()
            - docs.text.str.replace(" ", "").str.len() + 1)
    per = pd.DataFrame({"lang": docs.lang, "t": toks}).groupby("lang").t.sum()
    total, k = int(per.sum()), len(per)
    target = total // k
    for r in rows:
        tj = int(per[r.lang])
        em = min(4000, target * 1000 // tj)
        assert r.tokens == tj
        assert r.target_tokens == target
        assert r.epochs_milli == em
        assert r.realized_tokens == tj * em // 1000
        assert r.capped == (em == 4000)
        # a capped language is exactly one with < a quarter of target
        assert r.capped == (tj * 4 < target or tj * 4000 == target * 1000)
        # never allocate beyond the cap or (materially) beyond target
        assert r.realized_tokens <= target


def test_ktruss_replay(spark, sf_dir):
    got = {r.round: r for r in QUERIES["graph_ktruss"](spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]].drop_duplicates()
    per_order = li.groupby("l_orderkey").l_partkey.apply(list)
    pair_counts = Counter()
    for parts in per_order:
        ps = sorted(set(parts))
        for i in range(len(ps)):
            for jj in range(i + 1, len(ps)):
                pair_counts[(ps[i], ps[jj])] += 1
    edges = {e for e, c in pair_counts.items() if c >= 2}

    def peel(es):
        adj = defaultdict(set)
        for a, b in es:
            adj[a].add(b)
            adj[b].add(a)
        return {(a, b) for a, b in es if len(adj[a] & adj[b]) >= 2}

    e1 = peel(edges)
    e2 = peel(e1)
    assert (got[1].edges_in, got[1].edges_kept) == (len(edges), len(e1))
    assert (got[2].edges_in, got[2].edges_kept) == (len(e1), len(e2))
    # peeling is monotone
    assert got[1].edges_in >= got[1].edges_kept >= got[2].edges_kept
