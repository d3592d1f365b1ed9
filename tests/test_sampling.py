"""Training-mixture sampling (functions/sampling.py): replayable
stratified sampling (subset-composability across rates, python md5
replica) and domain-mix reweighting hand math."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from theta_spark.functions.sampling import domain_mix_weights, stratified_sample


def _py_draw(key, tag, seed):
    return int(hashlib.md5(f"{key}#{tag}#{seed}".encode()).hexdigest()[:8], 16)


def test_stratified_sample_matches_python_replica(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(200)],
        "doc_id long, lang string",
    )
    got = {
        r.doc_id
        for r in stratified_sample(
            df, {"a": 300, "b": 700}, "lang", "doc_id", seed=7
        ).collect()
    }
    exp = {
        i
        for i in range(200)
        if _py_draw(i, "strat", 7) % 1000 < (300 if i % 2 == 0 else 700)
    }
    assert got == exp and 0 < len(got) < 200


def test_stratified_sample_lower_rate_is_subset(spark):
    """Same seed, lower rate -> strict subset (draws don't change):
    the property that makes staged downsampling reproducible."""
    df = spark.createDataFrame([(i, "x") for i in range(500)], "doc_id long, lang string")
    s25 = {r.doc_id for r in stratified_sample(df, {"x": 250}, "lang", "doc_id").collect()}
    s50 = {r.doc_id for r in stratified_sample(df, {"x": 500}, "lang", "doc_id").collect()}
    assert s25 < s50


def test_stratified_sample_default_rate_drops_unknown_strata(spark):
    df = spark.createDataFrame(
        [(1, "known"), (2, "unknown")], "doc_id long, lang string"
    )
    kept = stratified_sample(df, {"known": 1000}, "lang", "doc_id").collect()
    assert [r.doc_id for r in kept] == [1]


def test_domain_mix_weights_hand_math(spark):
    """80/20 observed, uniform 50/50 target: the minority domain keeps
    rate 1.0, the majority is cut to (50/80)/(50/20) = 1/4."""
    rows = [(i, "big" if i < 80 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        r.domain: (r.n_docs, r.observed_share, r.target_share, r.weight_norm)
        for r in domain_mix_weights(df, {"big": 500, "small": 500}, "lang").collect()
    }
    assert got["small"] == (20, 0.2, 0.5, 1.0)
    assert got["big"] == (80, 0.8, 0.5, 0.25)


def test_pack_sequences_hand_math_and_bucket_invariance(spark):
    """Concat-and-chunk packing: hand-checked stream positions incl. a
    bin-spanning doc and an empty doc; bucket_width cannot change a bit
    (two-phase cumsum == global cumsum)."""
    from theta_spark.functions.packing import pack_sequences

    rows = [
        (0, "a b c"),          # 3 tokens  [0,3)
        (1, ""),               # 0 tokens  at 3
        (2, " ".join("t" * 1 for _ in range(10))),  # 10 tokens [3,13) spans bins (w=8)
        (3, "x y"),            # 2 tokens [13,15)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.start_tok, r.bin_first, r.bin_last, r.bin_offset)
        for r in pack_sequences(df, window=8, bucket_width=2).collect()
    }
    assert got[0] == (3, 0, 0, 0, 0)
    assert got[1] == (0, 3, 0, 0, 3)
    assert got[2] == (10, 3, 0, 1, 3)   # spans bins 0..1
    assert got[3] == (2, 13, 1, 1, 5)

    for bw in (1, 3, 1000):
        alt = {
            r.doc_id: (r.n_tokens, r.start_tok, r.bin_first, r.bin_last, r.bin_offset)
            for r in pack_sequences(df, window=8, bucket_width=bw).collect()
        }
        assert alt == got, bw


def test_group_sample_exact_k_and_replayable(spark):
    """Exactly K per group, python replica of the draw ranking, and a
    WindowGroupLimit (top-K push-down) in the physical plan."""
    import hashlib

    from theta_spark.functions.sampling import group_sample

    rows = [(i, "g" + str(i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = group_sample(df, 4, "lang", "doc_id", seed=9)
    got = {(r.lang, r.doc_id) for r in out.collect()}
    exp = set()
    for g in ("g0", "g1", "g2"):
        members = [i for i in range(90) if "g" + str(i % 3) == g]
        members.sort(key=lambda i: (
            int(hashlib.md5(f"{i}#gsample#9".encode()).hexdigest()[:8], 16), i))
        exp |= {(g, i) for i in members[:4]}
    assert got == exp and len(got) == 12

    from test_plans import plan_of

    assert "WindowGroupLimit" in plan_of(out)
