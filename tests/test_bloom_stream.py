"""Streaming Bloom filter: linearity (stream == batch), replay
idempotence, the no-false-negative guarantee, and a sane FP rate."""

from pyspark.sql import functions as F

from storagetapper_spark.plans.common import t
from storagetapper_spark.streaming import bloom as B


def _words(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_bloom_equals_batch(spark, sf_dir, tmp_path):
    state = str(tmp_path / "bloom")
    docs = t(spark, sf_dir, "documents").select("doc_id")
    for i in range(3):
        B.ingest_batch(spark, docs.filter(F.col("doc_id") % 3 == i),
                       i, state)
    got = _words(B.current_filter(spark, state))
    want = _words(B._batch_words(docs, "doc_id"))
    assert got == want


def test_streaming_bloom_replay_idempotent(spark, sf_dir, tmp_path):
    state = str(tmp_path / "bloom")
    docs = t(spark, sf_dir, "documents").select("doc_id")
    first = docs.filter(F.col("doc_id") % 3 == 0)
    B.ingest_batch(spark, first, 0, state)
    before = _words(B.current_filter(spark, state))
    B.ingest_batch(spark, first, 0, state)
    assert _words(B.current_filter(spark, state)) == before


def test_bloom_no_false_negatives_and_bounded_fp(spark, sf_dir, tmp_path):
    state = str(tmp_path / "bloom")
    docs = t(spark, sf_dir, "documents").select("doc_id")
    members = docs.filter(F.col("doc_id") % 2 == 0)
    B.ingest_batch(spark, members, 0, state)
    filt = B.current_filter(spark, state)
    probed = B.might_contain(filt, docs, "doc_id")
    # every ingested key MUST hit
    misses = probed.filter((F.col("doc_id") % 2 == 0)
                           & ~F.col("bloom_hit")).count()
    assert misses == 0
    # non-members may hit, but far fewer than all of them: with
    # n ~= 250 keys in m = 4096 bits / k = 3 the fp rate is ~0.4%,
    # so even 50x slack keeps this assertion meaningful
    non = probed.filter(F.col("doc_id") % 2 == 1)
    n_non = non.count()
    fp = non.filter(F.col("bloom_hit")).count()
    assert fp <= max(2, n_non // 5), (fp, n_non)


def test_bloom_no_false_negatives_on_duplicate_probes(spark, sf_dir,
                                                      tmp_path):
    """A duplicated probe key must still hit (the pre-filter's input is
    duplicate-heavy by definition — that's what it screens)."""
    state = str(tmp_path / "bloom")
    docs = t(spark, sf_dir, "documents").select("doc_id")
    members = docs.filter(F.col("doc_id") % 2 == 0)
    B.ingest_batch(spark, members, 0, state)
    filt = B.current_filter(spark, state)
    dup_probes = members.unionAll(members).unionAll(members)
    probed = B.might_contain(filt, dup_probes, "doc_id")
    assert probed.count() == members.count() * 3
    assert probed.filter(~F.col("bloom_hit")).count() == 0
