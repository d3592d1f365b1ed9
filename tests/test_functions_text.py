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


def test_bm25_matches_numpy_replica(spark):
    """bm25_topk == a definitional numpy BM25 (Lucene idf) on a small
    corpus, including idf of a term present in every doc and tf=0 docs."""
    import math

    docs = [
        ("d0", "spark join shuffle join spark"),
        ("d1", "join filter scan"),
        ("d2", "spark spark spark agg"),
        ("d3", "scan scan scan scan scan scan"),
        ("d4", "window agg merge"),
    ]
    terms = ["spark", "join", "scan"]
    k1, b = 1.2, 0.75
    toks = [d[1].split() for d in docs]
    n = len(docs)
    avgdl = sum(len(t) for t in toks) / n
    want = []
    for (doc_id, _), tk in zip(docs, toks):
        s = 0.0
        for term in terms:
            tf = tk.count(term)
            df = sum(1 for t2 in toks if term in t2)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(tk) / avgdl)))
        want.append((doc_id, round(s, 6)))
    want.sort(key=lambda t: (-t[1], t[0]))

    from theta_spark.functions.text import bm25_topk

    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = [(r["doc_id"], r["bm25"]) for r in bm25_topk(df, terms, k=5).collect()]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9, (gd, gs, ws)


def test_bm25_topk_cut_and_absent_term(spark):
    """k cuts deterministically (rounded score desc, id asc); a term
    absent from every doc contributes 0 to every score and never NaNs."""
    from theta_spark.functions.text import bm25_topk

    docs = [(f"d{i}", "x " * (i + 1) + "y") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = bm25_topk(df, ["y", "zz_not_present"], k=3).collect()
    assert len(out) == 3
    assert all(r["bm25"] == r["bm25"] for r in out)  # no NaN
    # shorter docs score higher on the same tf (length normalization)
    assert [r["doc_id"] for r in out] == ["d0", "d1", "d2"]


def test_repetition_stats_hand_computed(spark):
    """Gopher repetition stats: hand-checked gram math, deterministic
    tie-break (count desc, gram asc), short-doc zeroes, integer-exact
    pass verdicts at the 0.20/0.15 thresholds."""
    from theta_spark.functions.text import repetition_stats

    docs = spark.createDataFrame(
        [
            # "a b a b a b": 2-grams = [a b, b a, a b, b a, a b] -> top "a b" x3
            # chars=11, top2 = 3*3/11; 5-grams: "a b a b a" x1, "b a b a b" x1 -> dup5 0
            (1, "a b a b a b"),
            # all distinct words, no repeated 5-gram
            (2, "one two three four five six"),
            # 10 tokens of "x x ...": top 2-gram "x x" x9; one distinct 5-gram "x x x x x" x6
            (3, "x x x x x x x x x x"),
            # too short for any 2-gram
            (4, "solo"),
            (5, ""),
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (
            r.n_words, r.dup_word_frac, r.top2_frac, r.dup5_frac, r.rep_pass
        )
        for r in repetition_stats(docs).collect()
    }
    assert got[1] == (6, round(1 - 2 / 6, 6), round(9 / 11, 6), 0.0, 0)
    assert got[2] == (6, 0.0, round(8 / 27, 6), 0.0, 0)  # top tie -> "five six" (cnt 1)
    # doc 3: chars=19, top2 = 9*3/19 > .2 ; dup5 = 6*9/19 > .15 -> fail both
    assert got[3] == (10, round(1 - 1 / 10, 6), round(27 / 19, 6), round(54 / 19, 6), 0)
    assert got[4] == (1, 0.0, 0.0, 0.0, 1)
    assert got[5] == (0, 0.0, 0.0, 0.0, 1)


def test_redact_pii_hand_cases(spark):
    """Counts reconcile with sentinels (each count taken on the text its
    pass sees): a digit run inside an email counts once as email, never
    as id; IP octets never count as id runs; 8-digit runs pass."""
    from theta_spark.functions.text import redact_pii

    rows = [
        (1, "mail a.b+c@foo.org and d@bar.co end"),
        (2, "ip 192.168.0.1 and 10.0.300.7 acct 123456789"),
        (3, "short 12345678 ok"),          # 8 digits: NOT an id run
        (4, "nested user99@ex.com 4111111111111111"),
        (5, "clean text"),
        # 9-digit local part: email consumes it; n_idnum stays 0 so the
        # counts match the sentinels in `redacted`
        (6, "contact 123456789@example.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_email, r.n_ipv4, r.n_idnum, r.redacted)
           for r in redact_pii(df).collect()}
    assert got[1] == (2, 0, 0, "mail <EMAIL> and <EMAIL> end")
    # 10.0.300.7 still matches \d{1,3} groups (300 = 3 digits)
    assert got[2] == (0, 2, 1, "ip <IP> and <IP> acct <ID>")
    assert got[3] == (0, 0, 0, "short 12345678 ok")
    assert got[4] == (1, 0, 1, "nested <EMAIL> <ID>")
    assert got[5] == (0, 0, 0, "clean text")
    assert got[6] == (1, 0, 0, "contact <EMAIL>")
    for r in redact_pii(df).collect():
        assert r.redacted.count("<EMAIL>") == r.n_email
        assert r.redacted.count("<IP>") == r.n_ipv4
        assert r.redacted.count("<ID>") == r.n_idnum
