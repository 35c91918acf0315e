"""Round-5 corpus-analysis operators: repeated passages (exact-substring
dedup signal), BPE pair counts, IDF/stopwords, temperature mixing."""

from pyspark.sql import functions as F

from storagetapper_spark.operators import text as X


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_windows_short_doc_empty(spark):
    df = _docs(spark, [(1, "a b c")]).select(
        X.token_windows(F.col("text"), 4).alias("w"))
    assert df.collect()[0].w == []


def test_token_windows_dedup_within_doc(spark):
    # "a b a b a b" with k=2 → windows [a b, b a, a b, b a, a b] → 2 distinct
    df = _docs(spark, [(1, "a b a b a b")]).select(
        X.token_windows(F.col("text"), 2).alias("w"))
    assert sorted(df.collect()[0].w) == ["a b", "b a"]


def test_repeated_passages_counts(spark):
    # docs 1 and 2 share the 3-gram "x y z"; doc 3 is disjoint; doc 4 too short
    df = _docs(spark, [
        (1, "x y z p q"),       # windows: xyz yzp zpq
        (2, "m x y z n"),       # windows: mxy xyz yzn
        (3, "a b c d e"),       # windows: abc bcd cde
        (4, "t u"),             # no 3-token window
    ])
    out = {r.doc_id: r for r in
           X.repeated_passages(df, k=3).collect()}
    assert out[1].n_windows == 3 and out[1].n_dup_windows == 1
    assert out[1].max_spread == 2
    assert abs(out[1].dup_fraction - round(1 / 3, 6)) < 1e-9
    assert out[2].n_dup_windows == 1
    assert out[3].n_dup_windows == 0 and out[3].max_spread == 0
    assert out[4].n_windows == 0 and out[4].dup_fraction == 0.0


def test_repeated_passages_within_doc_repeat_not_cross(spark):
    # a window repeated only WITHIN one doc is not cross-duplicated
    df = _docs(spark, [(1, "x y z w x y z"), (2, "a b c")])
    out = {r.doc_id: r for r in X.repeated_passages(df, k=3).collect()}
    assert out[1].n_dup_windows == 0


def test_adjacent_pair_counts(spark):
    df = _docs(spark, [(1, "a b a"), (2, "b a"), (3, "c")])
    got = {r.pair: r.n for r in X.adjacent_pair_counts(df).collect()}
    assert got == {"a b": 1, "b a": 2}


def test_repeated_passages_no_cartesian(spark):
    df = _docs(spark, [(1, "x y z"), (2, "x y z")])
    plan = X.repeated_passages(df, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_budget_cut_exact_prefix(spark):
    from storagetapper_spark.operators.sampling import budget_cut
    rows = [(i, (i * 37) % 101, 5 + (i * 13) % 20) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, score long, w long")
    got = budget_cut(df, "score", "w", budget=600,
                     n_buckets=8).orderBy("cum_weight").collect()
    # brute-force reference: order by (score desc, id), inclusive cumsum
    ref, cum = [], 0
    for i, s, w in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += w
        if cum > 600:
            break
        ref.append((i, s, w, cum))
    assert [(r.doc_id, r.score, r.w, r.cum_weight) for r in got] == ref


def test_budget_cut_budget_covers_all(spark):
    from storagetapper_spark.operators.sampling import budget_cut
    df = spark.createDataFrame([(1, 10, 3), (2, 5, 4)],
                               "doc_id long, score long, w long")
    got = budget_cut(df, "score", "w", budget=100).collect()
    assert len(got) == 2 and max(r.cum_weight for r in got) == 7


def test_budget_cut_tie_broken_by_id(spark):
    from storagetapper_spark.operators.sampling import budget_cut
    df = spark.createDataFrame([(9, 7, 5), (2, 7, 5), (5, 7, 5)],
                               "doc_id long, score long, w long")
    got = budget_cut(df, "score", "w", budget=10).collect()
    assert sorted(r.doc_id for r in got) == [2, 5]


def test_lsh_verified_identical_docs(spark):
    from storagetapper_spark.operators.dedup import lsh_verified_pairs
    txt = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, txt), (2, txt), (3, "one two three four five six seven")],
        "doc_id long, text string")
    out = lsh_verified_pairs(df, threshold=0.5).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r.jaccard_exact == 1.0 and r.verified
    assert all(k == (1, 2) for k in pairs), pairs.keys()
