"""P6 train-path label encoding (operators/labels.py): char spans ->
per-token start_ids/end_ids arrays per sliding-window segment, with the
reference's full-containment boundary rule (task_ner.py:131-166)."""

from theta_spark.operators.labels import encode_labels
from theta_spark.operators.segmentation import segment


def test_encode_labels_spans_and_boundaries(spark):
    #        0         1         2
    #        0123456789012345678901234
    text = "alpha beta gamma delta ep"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    # windows of 12 chars, stride 6: [0,12)="alpha beta g", [6,18)="beta gamma d", ...
    segs = segment(docs, "text", seg_len=12, seg_stride=6)
    tags = spark.createDataFrame(
        [
            (1, 3, 0, 4),    # "alpha": single-token span
            (1, 5, 6, 15),   # "beta gamma": two-token span
            (1, 2, 17, 21),  # "delta"
        ],
        "doc_id long, category_id int, start long, end long",
    )
    rows = {
        (r.seg_id): (r.n_tokens, r.start_ids, r.end_ids)
        for r in encode_labels(segs, tags).collect()
    }
    # seg 0 "alpha beta g": contains only "alpha" fully (beta..gamma is cut)
    n, s, e = rows[0]
    assert n == 3 and s == [3, 0, 0] and e == [3, 0, 0]
    # seg 1 "beta gamma d": contains "beta gamma" -> start on tok 0, end on tok 1
    n, s, e = rows[1]
    assert n == 3 and s == [5, 0, 0] and e == [0, 5, 0]
    # seg 2 "amma delta e" (chars 12-23): contains "delta" (local tok 1);
    # the cut "amma" head is still a token but carries no label
    n, s, e = rows[2]
    assert n == 3 and s == [0, 2, 0] and e == [0, 2, 0]
    # seg 3 "elta ep" (chars 18-24): "delta" starts at 17 < 18 -> cut,
    # excluded by the containment rule (recovered whole from seg 2)
    n, s, e = rows[3]
    assert n == 2 and s == [0, 0] and e == [0, 0]
    # every segment emits a row even when untagged (zero arrays)
    assert set(rows) == {0, 1, 2, 3, 4}
    n, s, e = rows[4]  # "p" tail: no contained tag
    assert s == [0] * n and e == [0] * n
