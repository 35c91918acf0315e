"""Meaning checks for the monitoring/validation query batch (the oracle
proves value equality; these prove the operators measure what they
claim)."""

from pyspark.sql import functions as F

from storagetapper_spark.plans.common import events_t, t
from storagetapper_spark.plans.registry import QUERIES


def test_ewma_matches_reference_recursion(spark, sf_dir):
    rows = QUERIES["ewma_daily_counts"](spark, sf_dir).collect()
    by_type: dict = {}
    for r in sorted(rows, key=lambda r: (r.event_type, str(r.day))):
        by_type.setdefault(r.event_type, []).append(r)
    for series in by_type.values():
        counts = [r.n_events for r in series]
        for i, r in enumerate(series):
            want = sum(counts[i - k] / 2 ** k
                       for k in range(8) if i - k >= 0)
            assert abs(r.ewma8 - want) == 0.0  # dyadic — exactly equal


def test_containment_detects_full_containment(spark):
    from storagetapper_spark.operators.dedup import ngram_containment_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta", "en", "s"),
         (2, "intro words alpha beta gamma delta epsilon zeta trailing tail here", "en", "s"),
         (3, "completely different content entirely unrelated text", "en", "s")],
        "doc_id LONG, text STRING, lang STRING, source STRING")
    out = {(r.id_a, r.id_b): r for r in
           ngram_containment_pairs(docs, ["lang", "source"]).collect()}
    r = out[(1, 2)]
    assert r.containment == 1.0       # doc1's shingles all inside doc2
    assert r.containment_a == 1.0 and r.containment_b < 1.0
    assert (1, 3) not in out and (2, 3) not in out


def test_containment_pairs_multi_doc_bucket_exact_counts(spark):
    """r10 basket-array pair build: a shingle shared by >2 docs must
    emit every strict i<j pair exactly once, across bucket boundaries
    never, with n_inter == |shingle-set intersection| (hand-computed)."""
    from storagetapper_spark.operators.dedup import ngram_containment_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "s"),      # shingles: ab-g, b-g-d
         (2, "alpha beta gamma epsilon", "en", "s"),    # shares 'alpha beta gamma'
         (3, "alpha beta gamma delta tail", "en", "s"), # shares both of doc1's
         (4, "alpha beta gamma delta", "fr", "s")],     # other bucket: no pairs
        "doc_id LONG, text STRING, lang STRING, source STRING")
    out = {(r.id_a, r.id_b): r for r in
           ngram_containment_pairs(docs, ["lang", "source"]).collect()}
    # doc1 ∩ doc2 = {'alpha beta gamma'}; doc1 ∩ doc3 = both doc1 shingles;
    # doc2 ∩ doc3 = {'alpha beta gamma'}; doc4 isolated by its bucket.
    assert set(out) == {(1, 2), (1, 3), (2, 3)}
    assert out[(1, 3)].containment == 1.0       # doc1 fully inside doc3
    assert out[(1, 2)].containment == 0.5       # 1 shared of min(2, 2)
    assert out[(2, 3)].containment == 0.5


def test_table_checksum_is_order_independent_and_sensitive(spark, sf_dir):
    base = {r.l_returnflag: (r.n_rows, r.xor_hash) for r in
            QUERIES["cdc_table_checksum"](spark, sf_dir).collect()}
    # a re-run over a differently-partitioned session plan folds the
    # same commutative hashes — result identical
    again = {r.l_returnflag: (r.n_rows, r.xor_hash) for r in
             QUERIES["cdc_table_checksum"](spark, sf_dir).collect()}
    assert base == again
    for flag, (n, h) in base.items():
        assert n > 0 and h != 0


def test_drift_shares_are_distributions(spark, sf_dir):
    rows = QUERIES["drift_psi"](spark, sf_dir).collect()
    s1 = sum(r.share_first for r in rows)
    s2 = sum(r.share_second for r in rows)
    assert abs(s1 - 1.0) < 1e-3 and abs(s2 - 1.0) < 1e-3
    # identical distributions would give psi 0; shifted halves give >= 0 terms summing small
    psi = sum(r.psi_term for r in rows)
    assert psi >= 0.0


def test_freshness_global_max_shard_has_zero_lag(spark, sf_dir):
    rows = QUERIES["feed_freshness"](spark, sf_dir).collect()
    assert min(r.lag_sec for r in rows) == 0
    assert all(r.lag_sec >= 0 for r in rows)
    ev = events_t(spark, sf_dir)
    assert sum(r.n_events for r in rows) == ev.count()
