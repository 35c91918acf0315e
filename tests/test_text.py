"""Text-analysis operator semantics."""

from pyspark.sql import functions as F

from storagetapper_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_features,
    token_stats,
    word_count,
)


def test_word_count_edges(spark):
    df = spark.createDataFrame(
        [("a b c",), ("  spaced   out  ",), ("",), ("one",)], "t string")
    got = [r.n for r in df.select(word_count(F.col("t")).alias("n")).collect()]
    assert got == [3, 2, 0, 1]


def test_lang_id_markers(spark):
    df = spark.createDataFrame([
        (1, "the cat and the dog sat of the mat"),
        (2, "der hund und die katze und der vogel"),
        (3, "le chat et le chien et les oiseaux"),
        (4, "xyzzy qwerty plugh"),
    ], "id long, t string")
    got = {r.id: r.lang for r in
           df.select("id", lang_id(F.col("t")).alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame([
        (1, "Hello,   World!"),
        (2, "hello world"),
        (3, "HELLO ... world  "),
        (4, "different entirely"),
    ], "id long, t string")
    fp = {r.id: r.f for r in df.select("id", fingerprint(F.col("t")).alias("f")).collect()}
    assert fp[1] == fp[2] == fp[3]
    assert fp[1] != fp[4]


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog of doom.")], "doc_id long, text string")
    r = quality_features(df).collect()[0]
    assert r.n_words == 10
    assert r.n_chars_calc == 45
    assert r.punct_ratio > 0
    assert 0.0 <= r.quality_score <= 1.0
    # heavy-digit text scores lower than clean prose
    noisy = spark.createDataFrame(
        [(2, "123 456 789 000 111 222 333 444 555 666")], "doc_id long, text string")
    assert quality_features(noisy).collect()[0].quality_score < r.quality_score


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "hello world, 42 times!")], "doc_id long, text string")
    r = token_stats(df).collect()[0]
    assert r.ws_tokens == 4
    # alpha chars = 15 → ceil(15/4)=4; digits 2; punct (, !) 2 → 8
    assert r.bpe_tokens_est == 8
