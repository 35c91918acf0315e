"""Incremental DSIR (streaming/importance.py): batch-accumulated model
== one-shot model, replays don't double-count, scores match the batch
query exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storagetapper_spark.streaming.importance import (
    current_model,
    ingest_batch,
    score_docs,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "lang", "text"))


def test_incremental_equals_batch(spark, tmp_path):
    state = str(tmp_path / "dsir")
    docs = _docs(spark)
    # 3 batches by doc_id ranges
    for bid, (lo, hi) in enumerate([(0, 20), (20, 35), (35, 10 ** 9)]):
        ingest_batch(spark,
                     docs.filter((F.col("doc_id") >= lo)
                                 & (F.col("doc_id") < hi)),
                     bid, state)
    # replay batch 1 (at-least-once) — must not double-count
    ingest_batch(spark,
                 docs.filter((F.col("doc_id") >= 20)
                             & (F.col("doc_id") < 35)), 1, state)

    streamed = {r.doc_id: r.weight_micro
                for r in score_docs(docs, current_model(spark, state))
                .collect()}

    from storagetapper_spark.plans.datapipe5 import sample_importance_weights
    batch = {r.doc_id: r.weight_micro
             for r in sample_importance_weights(spark, SF).collect()}
    assert streamed == batch


def test_model_is_live(spark, tmp_path):
    """Ingesting more data must move the model (it is re-derived from
    the folded deltas, not frozen at batch 0) — and the updated model
    must still equal a from-scratch recompute over the union.

    NOTE a sign-based assertion ("off-target mass raises target
    scores") does NOT hold here: 64 uniform hash buckets mix all
    languages, so distribution shifts largely cancel per bucket."""
    state = str(tmp_path / "dsir")
    docs = _docs(spark)
    ingest_batch(spark, docs, 0, state)
    m0 = {r.bucket: r.log_ratio
          for r in current_model(spark, state).collect()}
    extra = (docs.filter(F.col("lang") != "en")
             .withColumn("doc_id", F.col("doc_id") + 100000))
    ingest_batch(spark, extra, 1, state)
    m1 = {r.bucket: r.log_ratio
          for r in current_model(spark, state).collect()}
    assert m0 != m1
    # from-scratch model over the union == folded-delta model
    fresh_state = str(tmp_path / "dsir2")
    ingest_batch(spark, docs.unionByName(extra), 0, fresh_state)
    m_fresh = {r.bucket: r.log_ratio
               for r in current_model(spark, fresh_state).collect()}
    assert m1 == m_fresh
