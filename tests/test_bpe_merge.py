"""BPE greedy merge step (operators/text.bpe_greedy_merge).

The hard part is greedy left-to-right NON-OVERLAPPING application —
runs of consecutive candidates must merge at even offsets only, exactly
like the scan loop in reference BPE trainers (Sennrich et al. 2016).
These cases pin that behavior against a literal Python scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storagetapper_spark.operators.text import (
    bpe_greedy_merge,
    pair_counts_of_stream,
)


def _py_greedy(tokens: list[str], x: str, y: str) -> list[str]:
    """Reference single-pass greedy merge."""
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and tokens[i] == x and tokens[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


def _merge(spark, text: str, x: str, y: str) -> list[str]:
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = bpe_greedy_merge(df, x, y).orderBy("i").collect()
    return [r.tok for r in rows]


def test_simple_merge(spark):
    assert _merge(spark, "a b c a b", "a", "b") == ["ab", "c", "ab"]


def test_overlapping_run_same_token(spark):
    # "x x x" under (x,x): greedy merges position 0, skips 1 → [xx, x]
    assert _merge(spark, "x x x", "x", "x") == ["xx", "x"]
    assert _merge(spark, "x x x x", "x", "x") == ["xx", "xx"]
    assert _merge(spark, "x x x x x", "x", "x") == ["xx", "xx", "x"]


def test_chained_candidates_alternate(spark):
    # candidates at consecutive positions via "a a b" under (a, a)?
    # no — use (a,b) over "a b b": candidate only at 0 → [ab, b]
    assert _merge(spark, "a b b", "a", "b") == ["ab", "b"]
    # "b a b a b" under (a,b): candidates at 1 and 3 (non-consecutive
    # after merge at 1 consumes pos 2... they ARE overlapping: pos1 uses
    # (a@1,b@2), pos3 uses (a@3,b@4) — disjoint, both merge
    assert _merge(spark, "b a b a b", "a", "b") == ["b", "ab", "ab"]


def test_matches_python_reference_fuzz(spark):
    import itertools
    import random

    rng = random.Random(7)
    alphabet = ["a", "b", "c"]
    cases = []
    for n in (1, 2, 3, 5, 8, 13):
        for _ in range(6):
            cases.append([rng.choice(alphabet) for _ in range(n)])
    # exhaustive short cases too
    for n in (2, 3, 4):
        cases.extend(list(p) for p in itertools.product("ab", repeat=n))
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(cases)],
        "doc_id int, text string")
    for x, y in (("a", "b"), ("a", "a"), ("b", "a")):
        got_rows = (bpe_greedy_merge(df, x, y)
                    .orderBy("doc_id", "i")
                    .groupBy("doc_id")
                    .agg(F.collect_list("tok").alias("toks"))
                    .collect())
        got = {r.doc_id: r.toks for r in got_rows}
        for i, toks in enumerate(cases):
            assert got[i] == _py_greedy(toks, x, y), (toks, x, y)


def test_pair_counts_of_stream(spark):
    df = spark.createDataFrame([(1, "a b a b a")], "doc_id int, text string")
    stream = bpe_greedy_merge(df, "a", "b")  # → [ab, ab, a]
    got = {r.pair: r.n for r in pair_counts_of_stream(stream).collect()}
    assert got == {"ab ab": 1, "ab a": 1}


def test_array_pair_counts_matches_stream_form(spark):
    """The r10 array-form pair counter (one Counter pass per Arrow
    batch) must agree exactly with the window-based stream form on
    every edge shape: runs, singleton docs, empty-ish docs, repeats
    across documents."""
    from storagetapper_spark.operators.text import array_pair_counts

    texts = ["a b a b a", "x", "a a a a", "b a", "q r q r q r"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)],
                               "doc_id int, text string")
    stream = df.select("doc_id",
                       F.posexplode(F.split("text", " ")).alias("i", "tok"))
    want = {r.pair: r.n for r in pair_counts_of_stream(stream).collect()}
    arr = df.select("doc_id", F.split("text", " ").alias("toks"))
    got = {r.pair: r.n for r in array_pair_counts(arr).collect()}
    assert got == want


def _py_train(docs: list[list[str]], rounds: int):
    """Reference trainer: count pairs, merge top (count desc, pair asc)."""
    from collections import Counter

    merges = []
    streams = [list(d) for d in docs]
    for r in range(1, rounds + 1):
        counts = Counter()
        for toks in streams:
            for a, b in zip(toks, toks[1:]):
                counts[f"{a} {b}"] += 1
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        x, y = pair.split(" ", 1)
        streams = [_py_greedy(toks, x, y) for toks in streams]
        merges.append((r, pair, counts[pair]))
    return merges


def test_bpe_train_matches_reference(spark):
    from storagetapper_spark.operators.text import bpe_train

    docs = [
        "the cat sat on the mat".split(),
        "the cat ate the rat".split(),
        "a cat a cat a cat".split(),
        ["x", "x", "x", "x", "x"],           # overlap stress each round
    ]
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id int, text string")
    got = [(r.round, r.pair, r.n)
           for r in bpe_train(df, rounds=4).orderBy("round").collect()]
    assert got == _py_train(docs, 4)


def test_bpe_train_merged_tokens_chain(spark):
    # round 2 must be able to pick a pair CONTAINING round 1's merge —
    # proves the renumbering keeps islands correct on merged streams
    from storagetapper_spark.operators.text import bpe_train

    docs = [["a", "b", "c"]] * 5  # r1: "a b"→ab; r2: "ab c"→abc
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id int, text string")
    got = [(r.round, r.pair, r.n)
           for r in bpe_train(df, rounds=2).orderBy("round").collect()]
    assert got == [(1, "a b", 5), (2, "ab c", 5)]


def test_bpe_encode_stats(spark):
    from storagetapper_spark.operators.text import bpe_encode_stats

    docs = [["a", "b", "c"]] * 4 + [["z"]]
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id int, text string")
    # 2 merges collapse each "a b c" to one token; "z" stays 1
    got = {r.doc_id: (r.n_before, r.n_after, r.saved)
           for r in bpe_encode_stats(df, rounds=2).collect()}
    assert got[0] == (3, 1, 2)
    assert got[4] == (1, 1, 0)
