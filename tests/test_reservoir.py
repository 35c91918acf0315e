"""Stratified reservoir sampling: bottom-k mergeability (incremental ==
one-shot), replay idempotence, and the map-side group-limit plan shape
that makes it corpus-safe."""

import pytest
from pyspark.sql import functions as F

from storagetapper_spark.operators.sampling import stratified_reservoir
from storagetapper_spark.plans.registry import QUERIES
from storagetapper_spark.streaming.reservoir import (
    current_sample,
    ingest_batch,
)

K = 7
SALT = "t"


def _docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang", "n_chars"))


def _key(rows):
    return {(r.lang, r.rk): r.doc_id for r in rows}


def test_exact_k_per_stratum_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    s1 = stratified_reservoir(docs, ["lang"], K, salt=SALT).collect()
    s2 = stratified_reservoir(docs, ["lang"], K, salt=SALT).collect()
    assert _key(s1) == _key(s2)                       # deterministic
    per = {}
    for r in s1:
        per[r.lang] = per.get(r.lang, 0) + 1
    pop = {r.lang: r.n for r in
           docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(K, pop[lang])                  # exact size
    # a different salt draws a different sample (not id-ordered)
    s3 = stratified_reservoir(docs, ["lang"], K, salt="other").collect()
    assert _key(s3) != _key(s1)


def test_streaming_fold_equals_one_shot(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    state = str(tmp_path / "res")
    batches = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, b in enumerate(batches):
        ingest_batch(spark, b, i, state, ["lang"], K, salt=SALT)
    got = _key(current_sample(spark, state, ["lang"], K,
                              salt=SALT).collect())
    want = _key(stratified_reservoir(docs, ["lang"], K,
                                     salt=SALT).collect())
    assert got == want
    # at-least-once replay of batch 1 replaces its own delta — no drift
    ingest_batch(spark, batches[1], 1, state, ["lang"], K, salt=SALT)
    again = _key(current_sample(spark, state, ["lang"], K,
                                salt=SALT).collect())
    assert again == want


def test_rank_uses_map_side_group_limit(spark, sf_dir):
    """The per-stratum rank must plan a WindowGroupLimit (partial
    top-k BEFORE the exchange) so each task ships ≤ k rows per stratum
    — the property that keeps the sample corpus-safe at 100 TB."""
    plan = (QUERIES["sample_reservoir_stratified"](spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "WindowGroupLimit" in plan
