"""Spark-side operator tests: W1 segmentation parity with the reference
loop, G1-G6 merge/dedup, and P4 tag projection."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from theta_spark.operators.merge import (
    dataset_diff,
    dedup_keep_last,
    dedup_mentions,
    entity_vote,
    merge_min_dups,
    unshift_mentions,
)
from theta_spark.operators.segmentation import project_tags_into_segments, segment
from theta_spark.reference_impl import segment_offsets


def test_segment_matches_reference_loop(spark):
    texts = ["a" * n for n in [1, 5, 62, 63, 64, 126, 127, 300, 1000]]
    df = spark.createDataFrame([(str(i), t) for i, t in enumerate(texts)], "doc_id string, text string")
    got = {
        (r.doc_id, r.seg_id, r.s_seg, r.seg_text, r.e_seg)
        for r in segment(df, "text", 126, 63).collect()
    }
    expect = set()
    for i, t in enumerate(texts):
        for seg_id, (s, seg_text) in enumerate(segment_offsets(t, 126, 63)):
            expect.add((str(i), seg_id, s, seg_text, s + len(seg_text) - 1))
    assert got == expect


def test_segment_empty_text_yields_nothing(spark):
    df = spark.createDataFrame([("d", "")], "doc_id string, text string")
    assert segment(df, "text", 126, 63).count() == 0


def test_project_tags_into_segments(spark):
    # doc of 10 chars, seg [4,7]: tag fully inside kept+shifted, others dropped
    tags = [
        Row(category="x", start=4, mention="ab"),   # inside [4,7]
        Row(category="x", start=6, mention="cd"),   # end 7 = boundary, kept
        Row(category="x", start=3, mention="ab"),   # starts before s_seg
        Row(category="x", start=7, mention="ab"),   # end 8 > e_seg
    ]
    df = spark.createDataFrame(
        [("d", 4, 7, tags)],
        "doc_id string, s_seg int, e_seg int, tags array<struct<category:string,start:int,mention:string>>",
    )
    out = project_tags_into_segments(df).collect()[0].seg_tags
    assert [(t.start, t.mention) for t in out] == [(0, "ab"), (2, "cd")]


def test_unshift_and_dedup_mentions(spark):
    raw = spark.createDataFrame(
        [
            ("d", 0, 0, 1, 5, 7, "foo", 0),
            ("d", 1, 63, 1, -58, -56, "foo", 4),  # seg-local -> same global span
            ("d", 1, 63, 2, 7, 9, "bar", 0),
        ],
        "doc_id string, seg_id int, s_seg int, category_id int, start int, end int, mention string, indent int",
    )
    deduped = dedup_mentions(unshift_mentions(raw)).collect()
    rows = {(r.doc_id, r.category_id, r.start, r.end): r for r in deduped}
    assert len(rows) == 2
    r = rows[("d", 1, 5, 7)]
    assert r.seg_id == 0          # first occurrence kept
    assert r.indent == 4          # max indent across overlapping segments
    assert rows[("d", 2, 70, 72)].mention == "bar"


def test_dedup_keep_last(spark):
    df = spark.createDataFrame(
        [("k", 1, "a"), ("k", 2, "b"), ("j", 5, "c")], "key string, idx int, val string"
    )
    out = {(r.key, r.val) for r in dedup_keep_last(df, ["key"], "idx").collect()}
    assert out == {("k", "b"), ("j", "c")}


def test_merge_min_dups(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",), ("c",), ("c",)], "k string"
    )
    out = sorted(r.k for r in merge_min_dups(df, ["k"], min_dups=2).collect())
    assert out == ["a", "c"]


def test_entity_vote(spark):
    # 3 models; threshold 0.9 -> need int(3*0.9)=2 votes (ner_models.py:14-34)
    df = spark.createDataFrame(
        [(m, e) for m, ents in [(0, "xy"), (1, "x"), (2, "xz")] for e in ents],
        "model int, ent string",
    )
    out = {r.ent: r.votes for r in entity_vote(df, ["ent"], n_models=3, threshold=0.9).collect()}
    assert out == {"x": 3}  # y/z have 1 vote < 2, filtered


def test_dataset_diff(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    a_only, b_only, common = dataset_diff(a, b, ["k"])
    assert {r.k for r in a_only.collect()} == {1}
    assert {r.k for r in b_only.collect()} == {4}
    assert {r.k for r in common.collect()} == {2, 3}
