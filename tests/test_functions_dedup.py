"""Unit tests for the dedup family (functions.dedup): MinHash-LSH n-gram
Jaccard, SimHash, and the blocked joins — on crafted near-duplicates."""

import hashlib

import numpy as np
import pytest

from theta_spark.functions.dedup import (
    ngram_jaccard_pairs,
    simhash_near_dups,
    word_shingles,
)

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE + "one extra tail token"),          # near-dup of 1
        (3, "totally different words " * 10),
        (4, BASE.replace("gamma", "gamma2")),        # near-dup of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    out = {r.shingle for r in word_shingles(df, "doc_id", "text", 3).collect()}
    assert out == {"a b c", "b c d"}


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    out = {r.shingle for r in word_shingles(df, "doc_id", "text", 3).collect()}
    assert out == {"a b"}


def test_ngram_jaccard_finds_near_dups(spark):
    pairs = {(r.a, r.b): r.jaccard for r in ngram_jaccard_pairs(
        _docs(spark), "doc_id", "text", threshold=0.5
    ).collect()}
    # BASE repeats 5x so its distinct 3-gram set is small (10); the tail
    # adds 4 new grams -> jaccard 10/14 = 0.714
    assert (1, 2) in pairs and abs(pairs[(1, 2)] - 10 / 14) < 1e-6
    assert (1, 4) in pairs
    assert all(3 not in p for p in pairs)


def test_simhash_deterministic_and_sensitive(spark):
    from theta_spark.functions.dedup import simhash64
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(BASE,), (BASE,), ("other text entirely",)], "text string")
    vals = [r.sh for r in df.select(simhash64(F.col("text")).alias("sh")).collect()]
    assert vals[0] == vals[1]
    assert vals[0] != vals[2]


def test_simhash_near_dups_pairs(spark):
    # the 16-bit-chunk banding guarantees recall only for hamming <= 3
    # (pigeonhole over 4 chunks); craft an exact-dup pair (hamming 0)
    rows = [(1, BASE), (2, BASE), (3, "totally different words " * 10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.a, r.b): r.hamming for r in simhash_near_dups(
        df, "doc_id", "text", max_hamming=3
    ).collect()}
    assert out == {(1, 2): 0}


def test_simhash_matches_reference_bit_math(spark):
    """The pandas UDF must equal a direct two's-complement reimplementation
    (the same math the DuckDB oracle runs)."""
    from theta_spark.functions.dedup import simhash64
    from pyspark.sql import functions as F

    text = "alpha beta gamma"
    acc = [0] * 64
    for tok in text.split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    u = sum(1 << b for b in range(64) if acc[b] > 0)
    expect = u - (1 << 64) if u >= (1 << 63) else u
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(simhash64(F.col("text")).alias("sh")).collect()[0].sh
    assert got == expect


def test_contamination_scores_hand_computed(spark):
    """Per-doc shingle overlap against a broadcast benchmark set, hand
    computed: doc shingles are DISTINCT word-3-grams, short docs yield
    their single short gram, zero-overlap docs score 0.0."""
    from theta_spark.functions.dedup import contamination_scores

    bench = spark.createDataFrame(
        [("b0", "the quick brown fox jumps")], "doc_id string, text string"
    )
    # bench shingles: {"the quick brown","quick brown fox","brown fox jumps"}
    docs = spark.createDataFrame(
        [
            # 4 shingles, 2 of them in bench -> 0.5
            ("d1", "a the quick brown fox"),
            # single short gram, not in bench -> 0.0
            ("d2", "quick brown"),
            # exact bench text: 3/3 -> 1.0
            ("d3", "the quick brown fox jumps"),
            # repeated gram counted once (distinct): 3 shingles, 1 hit
            ("d4", "quick brown fox quick brown fox"),
        ],
        "doc_id string, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"], r["contamination"])
        for r in contamination_scores(docs, bench, k=3).collect()
    }
    assert got == {
        "d1": (3, 2, round(2 / 3, 6)),
        "d2": (1, 0, 0.0),
        "d3": (3, 3, 1.0),
        "d4": (3, 1, round(1 / 3, 6)),
    }
