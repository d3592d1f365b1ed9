"""Unit tests for the text-analysis column functions (functions.text)."""

from pyspark.sql import functions as F

from theta_spark.functions import text as T


def _one(spark, text, col_fn):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col_fn(F.col("text")).alias("v")).collect()[0].v


def test_token_count(spark):
    assert _one(spark, "  a b   c ", T.token_count) == 3
    assert _one(spark, "", T.token_count) == 0
    assert _one(spark, "one", T.token_count) == 1


def test_bpe_ish_count(spark):
    # "hello" -> hell+o (2), "world!" -> worl+d (2) + ! (1)
    assert _one(spark, "hello world!", T.bpe_ish_token_count) == 5
    assert _one(spark, "ab", T.bpe_ish_token_count) == 1


def test_stopword_ratio(spark):
    assert _one(spark, "the cat", T.stopword_ratio) == 0.5
    assert _one(spark, "THE cat", T.stopword_ratio) == 0.5  # case-folded
    assert _one(spark, "cat dog", T.stopword_ratio) == 0.0
    assert _one(spark, "", T.stopword_ratio) == 0.0


def test_punct_ratio(spark):
    assert _one(spark, "ab.,", T.punct_ratio) == 0.5
    assert _one(spark, "abcd", T.punct_ratio) == 0.0


def test_mean_token_len(spark):
    assert _one(spark, "ab abcd", T.mean_token_len) == 3.0


def test_lang_id(spark):
    assert _one(spark, "the quick brown fox", T.lang_id) == "en"
    assert _one(spark, "zzz qqq xxx", T.lang_id) == "other_latin"
    assert _one(spark, "0123 456 789", T.lang_id) == "non_latin"


def test_quality_score_bands(spark):
    good = " ".join(["the"] + ["word"] * 19)  # 20 tokens, stopwords, no punct
    assert _one(spark, good, T.quality_score) == 1.0
    assert _one(spark, "short", T.quality_score) < 1.0


def test_fingerprint_stability_and_locality(spark):
    a = "the quick brown fox jumps over the lazy dog"
    assert _one(spark, a, T.fingerprint) == _one(spark, a, T.fingerprint)
    # appending text can only keep or lower the min-hash -> often equal
    import hashlib

    fp = _one(spark, a, T.fingerprint)
    mins = min(
        hashlib.md5(a.lower()[i : i + 8].encode()).hexdigest()
        for i in range(len(a) - 7)
    )
    assert fp == mins
