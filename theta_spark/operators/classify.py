"""Sequence-classification stage (SURVEY.md M6 glue classifier + D6 decode
+ A6 metrics) — the reference's glue task shape
(theta/nlp/tasks/task_glue.py:295-454 model, 653-665/720-725 decode,
46-63 metrics) re-expressed as one Arrow-batched scoring stage.

The deterministic stand-in scorer hashes the text per class (md5), so the
DuckDB oracle reproduces predictions bit-for-bit; a real
AutoModelForSequenceClassification drops into `score_batch` behind the
same (texts -> logits) contract.

Label space: 0-based ids, multi-label = k-hot (reference:
theta/nlp/data/samples.py:93-98, task_glue.py:96-101).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


PAIR_SEP = "\x1f"  # text_a/text_b separator in the stand-in scorer


def _logit(text: str, k: int) -> float:
    """Deterministic per-(text, class) score in [0, 1): the first 8 md5
    bytes of f"{k}#{text}" as a fraction. Same formula as the SQL oracle."""
    h = hashlib.md5(f"{k}#{text}".encode()).digest()[:8]
    return int.from_bytes(h, "big") / float(1 << 64)


def score_batch(texts, num_labels: int) -> np.ndarray:
    """(B,) texts -> (B, num_labels) logits. Swap in a real model here."""
    out = np.empty((len(texts), num_labels))
    for i, t in enumerate(texts):
        for k in range(num_labels):
            out[i, k] = _logit(t or "", k)
    return out


def classify_docs(
    docs: DataFrame,
    num_labels: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    text_b_col: str | None = None,
    multi_label: bool = False,
    threshold: float = 0.5,
) -> DataFrame:
    """-> (id, pred_label int) single-label argmax (D6, task_glue.py:653-665)
    or (id, pred_labels array<int>) via sigmoid>threshold for multi-label
    (task_glue.py:720-725; scores here are already in [0,1)).

    `text_b_col` enables the sentence-pair glue shape (task_glue.py:80-92:
    GlueDataset encodes (text_a, text_b) as one sequence pair) — the
    stand-in scores text_a + \\x1f + text_b; a real cross-encoder consumes
    the pair through its tokenizer's pair encoding behind the same stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if text_b_col is not None:
                texts = [
                    f"{a or ''}{PAIR_SEP}{b or ''}"
                    for a, b in zip(pdf[text_col], pdf[text_b_col])
                ]
            else:
                texts = list(pdf[text_col])
            logits = score_batch(texts, num_labels)
            if multi_label:
                preds = [
                    [int(k) for k in np.nonzero(row > threshold)[0]] for row in logits
                ]
                yield pd.DataFrame({"id": pdf[id_col], "pred_labels": preds})
            else:
                yield pd.DataFrame(
                    {"id": pdf[id_col], "pred_label": np.argmax(logits, axis=1).astype("int32")}
                )

    schema = (
        f"id {dict(docs.dtypes)[id_col]}, pred_labels array<int>"
        if multi_label
        else f"id {dict(docs.dtypes)[id_col]}, pred_label int"
    )
    cols = [id_col, text_col] + ([text_b_col] if text_b_col else [])
    return docs.select(*cols).mapInPandas(run, schema)


def classification_accuracy(pred: DataFrame, gold: DataFrame, on: str = "id") -> DataFrame:
    """A6 single-label accuracy: join on id, mean(pred == gold)."""
    from pyspark.sql import functions as F

    j = pred.join(gold, on=on)
    return j.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg((F.col("pred_label") == F.col("gold_label")).cast("double")), 6).alias(
            "accuracy"
        ),
    )


def multilabel_prf(pred: DataFrame, gold: DataFrame, on: str = "id") -> DataFrame:
    """A6 multi-label P/R/F1, task_glue.py:46-63 (p_r_f1 on k-hot matrices)
    exactly: over the elementwise (row, label) grid,
        tp = #(pred=1 and gold=1), fp = #(pred=1, gold=0),
        fn = #(gold=1, pred=0),
    then P/R/F1 with the same zero-guards. Relationally: explode both label
    arrays, full-outer join per (id, label), count the three cells —
    identical to the matrix arithmetic without materializing the k-hot
    matrix (which at 10^9 docs x 10^3 labels would be the wrong shape)."""
    from pyspark.sql import functions as F

    # lazy checkpoints: three count actions consume each side; without the
    # cut every action re-runs the upstream scoring stage (pred is usually
    # the Arrow-batched classifier output) from scratch
    p = (
        pred.select(F.col(on).alias("id"), F.explode("pred_labels").alias("label"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    g = (
        gold.select(F.col(on).alias("id"), F.explode("gold_labels").alias("label"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    tp = p.join(g, on=["id", "label"], how="left_semi").count()
    fp = p.join(g, on=["id", "label"], how="left_anti").count()
    fn = g.join(p, on=["id", "label"], how="left_anti").count()
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    spark = pred.sparkSession
    return spark.createDataFrame(
        [(tp, fp, fn, round(prec, 6), round(rec, 6), round(f1, 6))],
        "tp long, fp long, fn long, precision_v double, recall_v double, f1 double",
    )
