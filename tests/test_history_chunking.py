"""Semantic invariants of the SCD2/IVM/audit/time-travel/chunking batch
(the DuckDB oracle checks value equality; these check the MEANING)."""

import math

from pyspark.sql import functions as F

from storagetapper_spark.operators.merge import latest_state
from storagetapper_spark.plans.common import events_t, t
from storagetapper_spark.plans.registry import QUERIES
from storagetapper_spark.sources.changelog import (
    decompose_updates,
    events_as_changelog,
)


def test_scd2_intervals_are_contiguous_and_single_current(spark, sf_dir):
    rows = QUERIES["cdc_scd2_history"](spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, versions in by_user.items():
        versions.sort(key=lambda r: r.valid_from)
        n_current = sum(1 for r in versions if r.is_current)
        assert n_current <= 1, user
        for r in versions:
            # half-open interval: a closed version ends strictly later
            assert r.valid_to is None or r.valid_to > r.valid_from
            assert r.is_current == (r.valid_to is None)
        # versions never overlap: next valid_from >= previous valid_to
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to is not None and b.valid_from >= a.valid_to


def test_scd2_deleted_users_have_no_current(spark, sf_dir):
    ev = events_t(spark, sf_dir)
    last = (ev.groupBy("user_id")
              .agg(F.max_by("event_type", "event_id").alias("last_type")))
    deleted = {r.user_id for r in last.where("last_type = 'error'").collect()}
    current = {r.user_id
               for r in QUERIES["cdc_scd2_history"](spark, sf_dir)
                          .where("is_current").collect()}
    assert deleted.isdisjoint(current)


def test_incremental_agg_equals_direct_recompute(spark, sf_dir):
    """The IVM invariant, checked against Spark's own latest_state (the
    DuckDB oracle re-checks it against a second engine)."""
    out = {r.bucket: (r.sum_value, r.n_live)
           for r in QUERIES["cdc_incremental_agg"](spark, sf_dir).collect()}
    ev = events_t(spark, sf_dir).select(
        "event_id", "user_id", "event_type",
        F.round("value", 2).alias("value"))
    state = latest_state(events_as_changelog(ev), pk_cols=["user_id"])
    direct = {r.bucket: (r.s, r.n) for r in
              state.groupBy((F.col("user_id") % 10).alias("bucket"))
                   .agg(F.sum(F.col("value").cast("decimal(18,2)"))
                         .cast("double").alias("s"),
                        F.count(F.lit(1)).alias("n")).collect()}
    assert set(out) == set(direct)
    for b in out:
        assert out[b][1] == direct[b][1]
        assert math.isclose(out[b][0], direct[b][0], abs_tol=1e-9)


def test_column_audit_counts_match_names(spark, sf_dir):
    rows = QUERIES["cdc_column_audit"](spark, sf_dir).collect()
    ev_users = events_t(spark, sf_dir).select("user_id").distinct().count()
    assert len({r.user_id for r in rows}) == ev_users  # first row always audits
    for r in rows:
        assert r.n_changed == len(r.changed_cols.split(","))
        assert set(r.changed_cols.split(",")) <= {"event_type", "value"}


def test_time_travel_equals_replay_of_prefix(spark, sf_dir):
    out = QUERIES["cdc_time_travel"](spark, sf_dir)
    cut_seqno = out.select("cut_seqno").first().cut_seqno
    cut_event = (cut_seqno - 1) // 2
    ev = events_t(spark, sf_dir).select(
        "event_id", "user_id", "event_type",
        F.round("value", 2).alias("value"))
    prefix = ev.where(F.col("event_id") <= cut_event)
    expected = latest_state(
        decompose_updates(events_as_changelog(prefix)), pk_cols=["user_id"])
    got = {(r.user_id, r.event_id, r.seqno, r.value) for r in out.collect()}
    want = {(r.user_id, r.event_id, r.seqno, r.value)
            for r in expected.collect()}
    assert got == want


def test_chunk_fixed_covers_every_char(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select("doc_id", F.length("text").alias("n"))
    lens = {r.doc_id: r.n for r in docs.collect()}
    chunks = QUERIES["text_chunk_fixed"](spark, sf_dir).collect()
    per_doc: dict = {}
    for c in chunks:
        per_doc.setdefault(c.doc_id, []).append(c)
    assert set(per_doc) == set(lens)
    for doc_id, cs in per_doc.items():
        n = lens[doc_id]
        assert len(cs) == (max(n, 1) - 1) // 150 + 1
        cs.sort(key=lambda c: c.chunk_start)
        covered = 0
        for c in cs:
            assert c.chunk_start <= covered + 1  # overlap or adjacency
            assert c.chunk_len <= 200
            covered = max(covered, c.chunk_start + c.chunk_len - 1)
        assert covered == n


def test_chunk_tokens_partitions_the_token_stream(spark, sf_dir):
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok"))
    toks = {r.doc_id: r.n_tok for r in docs.collect()}
    chunks = QUERIES["text_chunk_tokens"](spark, sf_dir).collect()
    per_doc: dict = {}
    for c in chunks:
        per_doc.setdefault(c.doc_id, 0)
        per_doc[c.doc_id] += c.n_tokens
        assert 1 <= c.n_tokens <= 64
    assert per_doc == toks  # non-overlapping chunks partition the stream


def test_split_assign_is_disjoint_and_exhaustive(spark, sf_dir):
    rows = QUERIES["sample_split"](spark, sf_dir).collect()
    docs = t(spark, sf_dir, "documents").count()
    assert len(rows) == docs  # every doc labeled exactly once
    by = {}
    for r in rows:
        assert r.split in ("train", "val", "test")
        by[r.split] = by.get(r.split, 0) + 1
    # proportions near 80/10/10 (hash-uniform; loose bounds at 500 docs)
    assert 0.7 < by["train"] / docs < 0.9
    # growth stability: re-assign over a subset — labels never change
    from storagetapper_spark.operators.sampling import split_assign
    sub = t(spark, sf_dir, "documents").where("doc_id % 3 = 0")
    sub_labels = {r.doc_id: r.split
                  for r in split_assign(sub, "doc_id").collect()}
    full_labels = {r.doc_id: r.split for r in rows}
    for did, lab in sub_labels.items():
        assert full_labels[did] == lab


def test_mixture_rebalance_hits_target_shares(spark, sf_dir):
    rows = QUERIES["sample_mixture"](spark, sf_dir).collect()
    by = {}
    for r in rows:
        by[r.lang] = by.get(r.lang, 0) + 1
    total = sum(by.values())
    targets = {"en": 0.3, "de": 0.175, "zh": 0.175, "fr": 0.175,
               "es": 0.175}
    # binding stratum (smallest n/t) keeps ~everything; every share
    # lands near target (Bernoulli noise at fixture size)
    for lang, tgt in targets.items():
        assert abs(by[lang] / total - tgt) < 0.07, (lang, by)
    # downsample-only: never more rows than the source had
    src = {r.lang: r.n for r in
           t(spark, sf_dir, "documents").groupBy("lang")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang in by:
        assert by[lang] <= src[lang]


def test_seqno_gap_detector_recovers_injections(spark, sf_dir):
    """The detector must report exactly the injected losses (seqno%97==13)
    and retransmits (seqno%101==7), nothing else."""
    rows = QUERIES["cdc_seqno_gaps"](spark, sf_dir).collect()
    max_id = events_t(spark, sf_dir).agg(F.max("event_id")).first()[0]
    expected_lost = {s for s in range(max_id + 1) if s % 97 == 13}
    expected_dup = {s for s in range(max_id + 1) if s % 101 == 7
                    and s % 97 != 13}
    lost, dup = set(), set()
    for r in rows:
        if r.missing > 0:
            assert r.missing == 1  # injections never remove 2 in a row/shard
            lost.add(r.gap_after + 4)  # shard stride
        else:
            assert r.missing == -1  # one extra copy
            dup.add(r.gap_after)
    # boundary losses (last seqno of a shard) are undetectable by gaps —
    # exclude ids beyond each shard's last surviving seqno
    assert lost <= expected_lost
    assert len(expected_lost - lost) <= 4  # at most one tail per shard
    assert dup == expected_dup


def test_integrity_audit_matches_direct_antijoin(spark, sf_dir):
    """FK orphans must be 0 on the fixture (it IS intact); childless
    counts must equal a directly-computed anti-join."""
    rows = {(r.relationship, r.issue): r.n_rows
            for r in QUERIES["integrity_audit"](spark, sf_dir).collect()}
    assert rows[("lineitem->orders", "orphan_child")] == 0
    assert rows[("orders->customer", "orphan_child")] == 0
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    childless = o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").count()
    assert rows[("orders->lineitem", "childless_parent")] == childless
