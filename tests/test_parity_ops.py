"""Parity operators: P1 clean_text, P5 offset maps, W4 no-entity filter,
D3 BIOES decode, M7/M8 ensemble."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from theta_spark.operators.merge import ensemble_mentions
from theta_spark.operators.scoring import decode_bioes, offset_maps, tokenize_with_offsets
from theta_spark.operators.segmentation import clean_text, filter_no_entity_segments


def test_clean_text(spark):
    df = spark.createDataFrame([("  a  b \n",)], "t string")
    assert df.select(clean_text(F.col("t")).alias("v")).collect()[0].v == "a  b"
    assert (
        df.select(clean_text(F.col("t"), collapse_ws=True).alias("v")).collect()[0].v == "a b"
    )


def test_offset_maps_roundtrip():
    text = "def foo(a):\n    y = bar(a)\n"
    c2t, t2c = offset_maps(text)
    tokens, starts, ends = tokenize_with_offsets(text)
    assert len(c2t) == len(text)
    assert list(t2c[:-1]) == starts
    # property (SURVEY.md §5.2): char2token[token2char[i]] == i
    for i in range(len(tokens)):
        assert c2t[t2c[i]] == i
    # uncovered chars are -1
    assert c2t[3] == -1  # the space after 'def'


def test_filter_no_entity_segments(spark):
    rows = [
        Row(seg_id=0, seg_tags=[Row(category="x", start=0, mention="a")]),
        Row(seg_id=1, seg_tags=[]),
    ]
    df = spark.createDataFrame(rows)
    assert [r.seg_id for r in filter_no_entity_segments(df).collect()] == [0]
    assert filter_no_entity_segments(df, preserve_no_entity=True).count() == 2


def test_decode_bioes():
    tags = ["S-a", "B-b", "I-b", "E-b", "O", "B-c", "O", "S-a"]
    assert decode_bioes(tags) == [("a", 0, 0), ("b", 1, 3), ("a", 7, 7)]


def test_decode_bioes_type_consistency():
    # B-x interrupted by I-y: span dropped, scan continues
    assert decode_bioes(["B-x", "I-y", "E-x"]) == []
    assert decode_bioes(["B-x", "E-x"]) == [("x", 0, 1)]
    assert decode_bioes([]) == []


def test_ensemble_uniform_vote(spark):
    s = "doc_id string, category string, start int, end int"
    m0 = spark.createDataFrame([("d", "f", 0, 2), ("d", "f", 5, 7)], s)
    m1 = spark.createDataFrame([("d", "f", 0, 2)], s)
    m2 = spark.createDataFrame([("d", "f", 0, 2), ("d", "g", 9, 9)], s)
    out = {(r.doc_id, r.category, r.start, r.end) for r in ensemble_mentions(
        [m0, m1, m2], ["doc_id", "category", "start", "end"], threshold=0.6
    ).collect()}
    assert out == {("d", "f", 0, 2)}  # 3/3 mass; others 1/3 < 0.6


def test_ensemble_newton_cooling_weights(spark):
    import math

    s = "doc_id string, category string, start int, end int"
    m0 = spark.createDataFrame([("d", "f", 0, 2)], s)          # weight 1.0
    m1 = spark.createDataFrame([("d", "g", 5, 7)], s)          # weight e^-1
    out = {r.category: r.weight_mass for r in ensemble_mentions(
        [m0, m1], ["doc_id", "category", "start", "end"],
        cooling_lambda=1.0, threshold=0.5,
    ).collect()}
    # total = 1 + e^-1 = 1.368; only m0's mention passes 0.5 * total
    assert "f" in out and "g" not in out
    assert abs(out["f"] - 1.0) < 1e-9
