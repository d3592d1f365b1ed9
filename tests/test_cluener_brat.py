"""S2/S6 format adapters: the CLUENER fixture shape (reference
theta/tutorials/cluener/data/cluener_train_data.json — one JSON object per
line {guid, text, tags:[{category,start,mention}]}, Chinese text so offsets
are CHARACTER offsets) and brat standoff export/import."""

from __future__ import annotations

import json

import pytest

CLUENER_ROWS = [
    {
        "guid": "train-0",
        "text": "浙商银行企业信贷部叶老桂博士则从另一个角度对五道门槛进行了解读。",
        "tags": [
            {"category": "name", "start": 9, "mention": "叶老桂"},
            {"category": "company", "start": 0, "mention": "浙商银行"},
        ],
    },
    {
        "guid": "train-1",
        "text": "生生不息CSOL生化狂潮让你填弹狂扫",
        "tags": [{"category": "game", "start": 4, "mention": "CSOL"}],
    },
    # invalid: span-slice mismatch (start points at the wrong character)
    {
        "guid": "train-bad",
        "text": "那不勒斯vs锡耶纳",
        "tags": [{"category": "organization", "start": 1, "mention": "那不勒斯"}],
    },
]


@pytest.fixture()
def cluener_path(tmp_path):
    p = tmp_path / "cluener_slice.json"
    p.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in CLUENER_ROWS))
    return str(p)


def test_load_cluener_valid_and_rejected(spark, cluener_path):
    from theta_spark.sources.io import load_cluener

    valid, rejected = load_cluener(spark, cluener_path)
    v = {r["idx"]: r for r in valid.collect()}
    assert set(v) == {"train-0", "train-1"}
    # char-offset invariant: text[start : start+len(mention)] == mention
    for r in v.values():
        for t in r["tags"]:
            assert r["text"][t["start"] : t["start"] + len(t["mention"])] == t["mention"]
    rej = rejected.collect()
    assert len(rej) == 1 and rej[0]["idx"] == "train-bad"
    assert "span-slice" in rej[0]["reject_reason"]


def test_cluener_into_submission_roundtrip(spark, cluener_path):
    """CLUENER rows -> engine mention frame -> S3 submission (sorted tags,
    empty mentions dropped)."""
    from pyspark.sql import functions as F

    from theta_spark.sources.io import load_cluener, submission_df

    valid, _ = load_cluener(spark, cluener_path)
    mentions = valid.select(
        F.col("idx").alias("doc_id"), F.explode("tags").alias("t")
    ).select(
        "doc_id",
        F.col("t.category").alias("category"),
        F.col("t.start").alias("start"),
        F.col("t.mention").alias("mention"),
    )
    sub = {r["idx"]: r["tags"] for r in submission_df(mentions).collect()}
    t0 = sub["train-0"]
    assert [t["start"] for t in t0] == sorted(t["start"] for t in t0)
    assert t0[0]["category"] == "company" and t0[0]["start"] == 0


def test_brat_roundtrip(spark):
    from theta_spark.sources.io import brat_export_df, parse_brat_df

    rows = [
        ("d1", "function", 4, 9, "helper"),
        ("d1", "call", 20, 30, "shared_util"),
        ("d2", "class", 6, 13, "Handler1"),
    ]
    mentions = spark.createDataFrame(
        rows, "doc_id string, category string, start int, end int, mention string"
    )
    anns = brat_export_df(mentions)
    a = {r["doc_id"]: r["ann"] for r in anns.collect()}
    # brat standoff: end offsets are exclusive, lines numbered per doc
    assert a["d1"].splitlines()[0] == "T1\tfunction 4 10\thelper"
    assert a["d1"].splitlines()[1] == "T2\tcall 20 31\tshared_util"
    assert a["d2"] == "T1\tclass 6 14\tHandler1"
    back = {
        (r["doc_id"], r["category"], r["start"], r["end"], r["mention"])
        for r in parse_brat_df(anns).collect()
    }
    assert back == set(rows)


def test_brat_escapes_tabs_and_newlines(spark):
    """A mention containing \\t or \\n must not corrupt the line-based
    standoff body: export replaces both with a space (what real brat does
    with newlines), and parse splits only the first two tabs so any
    embedded tab would still stay inside the mention field."""
    from theta_spark.sources.io import brat_export_df, parse_brat_df

    mentions = spark.createDataFrame(
        [("d1", "call", 0, 10, "a\tb\nc def g")],
        "doc_id string, category string, start int, end int, mention string",
    )
    anns = brat_export_df(mentions)
    body = anns.collect()[0]["ann"]
    assert body == "T1\tcall 0 11\ta b c def g"  # one line, two structural tabs
    r = parse_brat_df(anns).collect()[0]
    assert (r["doc_id"], r["category"], r["start"], r["end"], r["mention"]) == (
        "d1", "call", 0, 10, "a b c def g",
    )
