"""Benchmark-contamination detection: flag semantics, threshold edges,
and the decontaminate anti-join."""

from pyspark.sql import functions as F

from storagetapper_spark.operators.contamination import (
    contamination_check,
    decontaminate,
    shingle_set,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_copy_is_fully_contaminated(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    corpus = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),   # exact copy
        (2, "completely unrelated text about spark engines today"),
    ])
    out = {r["doc_id"]: r for r in
           contamination_check(corpus, bench).collect()}
    assert out[1]["contaminated"] and out[1]["contam_ratio"] == 1.0
    assert not out[2]["contaminated"] and out[2]["n_shared"] == 0


def test_partial_overlap_threshold_integer_exact(spark):
    # doc shares exactly 1 of its 5 shingles -> ratio 0.2 hits the
    # 1/5 threshold boundary; integer test (1*5 >= 5*1) must flag it
    bench = _docs(spark, [(100, "alpha beta gamma")])
    corpus = _docs(spark, [(1, "alpha beta gamma zeta eta theta iota")])
    row = contamination_check(corpus, bench,
                              threshold_num=1, threshold_den=5).collect()[0]
    assert row["n_shingles"] == 5 and row["n_shared"] == 1
    assert row["contaminated"]
    row = contamination_check(corpus, bench,
                              threshold_num=1, threshold_den=4).collect()[0]
    assert not row["contaminated"]


def test_short_doc_whole_text_shingle(spark):
    # docs under n words contribute their whole normalized text
    bench = _docs(spark, [(100, "tiny doc")])
    corpus = _docs(spark, [(1, "Tiny   DOC!"), (2, "other words")])
    out = {r["doc_id"]: r for r in
           contamination_check(corpus, bench).collect()}
    assert out[1]["n_shingles"] == 1 and out[1]["contaminated"]
    assert not out[2]["contaminated"]


def test_decontaminate_removes_only_flagged(spark):
    bench = _docs(spark, [(100, "one two three four five six")])
    corpus = _docs(spark, [
        (1, "one two three four five six"),
        (2, "seven eight nine ten eleven twelve"),
    ])
    kept = decontaminate(corpus, bench).select("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [2]


def test_shingle_set_is_distinct(spark):
    df = _docs(spark, [(1, "a b a b a b a b")])  # repeated 3-grams
    shs = shingle_set(df).collect()
    vals = [r["sh"] for r in shs]
    assert len(vals) == len(set(vals)) == 2  # 'a b a' and 'b a b'


def test_contamination_join_is_broadcast(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    plan = contamination_check(docs, bench)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
