"""A6 multi-label P/R/F1 + M6 sentence-pair classification
(reference task_glue.py:46-63 p_r_f1, 80-92 pair encoding)."""

from __future__ import annotations

import hashlib

import numpy as np

from theta_spark.operators.classify import (
    PAIR_SEP,
    classify_docs,
    multilabel_prf,
    score_batch,
)


def _ref_p_r_f1(preds: np.ndarray, labels: np.ndarray):
    """Literal restatement of task_glue.py:46-63 (k-hot branch)."""
    tp = np.sum(((preds + labels) == 2).astype(int))
    fp = np.sum(((preds - labels) == 1).astype(int))
    fn = np.sum(((labels - preds) == 1).astype(int))
    p = tp / (tp + fp) if tp + fp != 0 else 0.0
    r = tp / (tp + fn) if tp + fn != 0 else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) != 0 else 0.0
    return int(tp), int(fp), int(fn), p, r, f1


def test_pair_scoring_formula(spark):
    """text_b path scores text_a + \\x1f + text_b with the same md5 stand-in."""
    df = spark.createDataFrame([("d1", "alpha", "beta")], "id string, ta string, tb string")
    out = classify_docs(df, num_labels=4, id_col="id", text_col="ta", text_b_col="tb").collect()
    joint = f"alpha{PAIR_SEP}beta"
    expect = int(
        np.argmax([
            int.from_bytes(hashlib.md5(f"{k}#{joint}".encode()).digest()[:8], "big")
            for k in range(4)
        ])
    )
    assert out[0]["pred_label"] == expect


def test_multilabel_prf_matches_reference_formula(spark):
    """The relational exploded-join PRF == the reference's k-hot matrix
    arithmetic, including a row with zero positives on both sides."""
    rng = np.random.default_rng(3)
    n, k = 40, 5
    pred_m = (rng.random((n, k)) > 0.6).astype(int)
    gold_m = (rng.random((n, k)) > 0.6).astype(int)
    pred_m[7] = 0
    gold_m[7] = 0
    pred_rows = [(str(i), [int(j) for j in np.nonzero(pred_m[i])[0]]) for i in range(n)]
    gold_rows = [(str(i), [int(j) for j in np.nonzero(gold_m[i])[0]]) for i in range(n)]
    pred = spark.createDataFrame(pred_rows, "id string, pred_labels array<int>")
    gold = spark.createDataFrame(gold_rows, "id string, gold_labels array<int>")
    row = multilabel_prf(pred, gold).collect()[0]
    tp, fp, fn, p, r, f1 = _ref_p_r_f1(pred_m, gold_m)
    assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn)
    assert row["precision_v"] == round(p, 6)
    assert row["recall_v"] == round(r, 6)
    assert row["f1"] == round(f1, 6)


def test_multilabel_thresholding(spark):
    """multi_label=True emits exactly the classes whose stand-in score
    clears the threshold (task_glue.py:720-725 sigmoid>thr decode)."""
    df = spark.createDataFrame([("a", "text one"), ("b", "text two")], "id string, text string")
    out = {r["id"]: list(r["pred_labels"]) for r in
           classify_docs(df, num_labels=6, id_col="id", text_col="text",
                         multi_label=True, threshold=0.5).collect()}
    for doc_id, text in [("a", "text one"), ("b", "text two")]:
        scores = score_batch([text], 6)[0]
        assert out[doc_id] == [int(i) for i in np.nonzero(scores > 0.5)[0]]
