"""Streaming CMS: linearity (stream == batch), replay idempotence, and
the one-sided error guarantee."""

from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t
from storagetapper_spark.streaming import cms as C


def _sketch_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_cms_equals_batch(spark, sf_dir, tmp_path):
    state = str(tmp_path / "cms")
    docs = t(spark, sf_dir, "documents")
    chunks = [docs.filter(F.col("doc_id") % 3 == i) for i in range(3)]
    for i, ch in enumerate(chunks):
        C.ingest_batch(spark, ch, i, state)
    got = _sketch_rows(C.current_sketch(spark, state))
    want = _sketch_rows(C._batch_cells(docs))
    assert got == want


def test_streaming_cms_replay_idempotent(spark, sf_dir, tmp_path):
    state = str(tmp_path / "cms")
    docs = t(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") % 3 == 0)
    C.ingest_batch(spark, first, 0, state)
    before = _sketch_rows(C.current_sketch(spark, state))
    C.ingest_batch(spark, first, 0, state)
    assert _sketch_rows(C.current_sketch(spark, state)) == before


def test_cms_estimate_one_sided(spark, sf_dir, tmp_path):
    """CMS never underestimates: est >= exact for every probed token."""
    state = str(tmp_path / "cms")
    docs = t(spark, sf_dir, "documents")
    C.ingest_batch(spark, docs, 0, state)
    toks = docs.select(F.explode(F.split(F.trim(F.regexp_replace(
        F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "),
        " +", " ")), " ")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    probe = exact.orderBy(F.desc("n"), "tok").limit(50)
    est = C.estimate(C.current_sketch(spark, state), probe.select("tok"))
    j = probe.join(est, "tok")
    bad = j.filter(F.col("cms_est") < F.col("n")).count()
    assert bad == 0
    # every probed token gets an estimate (vocab may be < 50 at tiny SF)
    assert j.count() == probe.count()
