"""Sources/sinks: S2 JSON entity scan with validation split, S3 submission
sink shape, read/write parquet fallback round-trip."""

import json

from theta_spark.sources.io import (
    load_entity_samples,
    read_table,
    submission_df,
    write_submission,
    write_table,
)


def test_table_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_table(df, p, partition_cols=["v"])
    back = read_table(spark, p)
    assert {tuple(sorted(r.asDict().items())) for r in back.collect()} == {
        tuple(sorted(r.asDict().items())) for r in df.collect()
    }


def test_load_entity_samples_validation(spark, tmp_path):
    rows = [
        {"idx": "1", "text": "hello bob", "tags": [{"category": "per", "start": 6, "mention": "bob"}]},
        {"idx": "2", "text": "xyz", "tags": [{"category": "per", "start": 1, "mention": "bob"}]},  # slice mismatch
        {"idx": None, "text": "t", "tags": []},                                                    # missing idx
        {"idx": "4", "text": "plain", "tags": []},
    ]
    p = tmp_path / "samples.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    valid, rejected = load_entity_samples(spark, str(p))
    assert {r.idx for r in valid.collect()} == {"1", "4"}
    rej = {r.idx: r.reject_reason for r in rejected.collect()}
    assert rej["2"].startswith("invalid tag")
    assert None in rej or len(rej) == 2


def test_submission_shape(spark, tmp_path):
    mentions = spark.createDataFrame(
        [
            ("d1", "fn", 10, 12, "foo"),
            ("d1", "cls", 0, 2, "Bar"),
            ("d1", "fn", 5, 5, ""),      # empty mention dropped (P2)
            ("d2", "fn", 3, 5, "baz"),
        ],
        "doc_id string, category string, start int, end int, mention string",
    )
    rows = {r.idx: r.tags for r in submission_df(mentions).collect()}
    assert [t.mention for t in rows["d1"]] == ["Bar", "foo"]  # sorted by start (O1)
    assert [t.category for t in rows["d1"]] == ["cls", "fn"]
    assert [t.mention for t in rows["d2"]] == ["baz"]

    out = str(tmp_path / "sub")
    write_submission(mentions, out)
    back = spark.read.json(out)
    assert back.count() == 2
