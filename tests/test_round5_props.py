"""Semantic invariants for the ML / Markov / retrieval / histogram
batches (properties the oracle hash cannot express)."""

from pyspark.sql import functions as F

from storagetapper_spark.plans import ml, profile2, relational14, textrank
from storagetapper_spark.plans.common import t


def test_logistic_gd_beats_chance(spark, sf_dir):
    row = ml.ml_logistic_gd(spark, sf_dir).collect()[0]
    assert row["train_acc_micro"] >= 500000  # at least majority-class
    assert any(row[f"w{j}_nano"] != 0 for j in range(3))


def test_markov_stationary_is_distribution(spark, sf_dir):
    rows = relational14.events_markov_stationary(spark, sf_dir).collect()
    assert rows
    total = sum(r["stationary_nano"] for r in rows)
    # each of 12 iterations floors ≤ |cells| nano units away
    assert 1_000_000_000 - 12 * 30 <= total <= 1_000_000_000
    assert all(r["stationary_nano"] >= 0 for r in rows)


def test_bm25_hits_contain_query_terms(spark, sf_dir):
    rows = textrank.text_bm25_search(spark, sf_dir).collect()
    assert rows
    docs = {r["doc_id"]: r for r in rows}
    texts = (t(spark, sf_dir, "documents")
             .filter(F.col("doc_id").isin(list(docs)))
             .select("doc_id", F.lower("text").alias("tx")).collect())
    for r in texts:
        hit = docs[r["doc_id"]]
        n_present = sum(1 for w in textrank._QUERY_TERMS
                        if w in r["tx"].split())
        assert hit["n_terms_matched"] == n_present
        assert 1 <= hit["n_terms_matched"] <= len(textrank._QUERY_TERMS)
        assert hit["bm25_micro"] > 0


def test_naive_bayes_confusion_covers_test_set(spark, sf_dir):
    rows = ml.ml_naive_bayes_confusion(spark, sf_dir).collect()
    n_classified = sum(r["n_docs"] for r in rows)
    n_test = (t(spark, sf_dir, "documents")
              .filter(F.col("doc_id") % 2 == 1).count())
    assert n_classified == n_test
    langs = set(t(spark, sf_dir, "documents")
                .select("lang").distinct().toPandas()["lang"])
    for r in rows:
        assert r["true_lang"] in langs and r["pred_lang"] in langs


def test_equidepth_buckets_balanced_and_ordered(spark, sf_dir):
    rows = (profile2.profile_equidepth_histogram(spark, sf_dir)
            .orderBy("tile").collect())
    assert len(rows) == profile2._NTILES
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # ntile guarantee
    # bucket value ranges are non-decreasing (ties may straddle)
    for a, b in zip(rows, rows[1:]):
        assert a["max_cents"] <= b["min_cents"] or \
            a["max_cents"] == b["min_cents"]
        assert a["min_cents"] <= a["max_cents"]
