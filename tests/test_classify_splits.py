"""M6/D6 classification stage + X1-X4 splits."""

import hashlib

from pyspark.sql import functions as F

from theta_spark.operators.classify import (
    _logit,
    classification_accuracy,
    classify_docs,
)
from theta_spark.operators.splits import (
    bootstrap,
    cap_and_sample,
    kfold_assign,
    kfold_slices,
    ratio_split,
    shuffle,
)


def _docs(spark, n=40):
    return spark.createDataFrame([(i, f"text number {i}") for i in range(n)], "doc_id long, text string")


def test_classify_matches_reference_formula(spark):
    out = {r.id: r.pred_label for r in classify_docs(_docs(spark, 10), num_labels=4).collect()}
    for i in range(10):
        text = f"text number {i}"
        scores = [_logit(text, k) for k in range(4)]
        assert out[i] == scores.index(max(scores))


def test_classify_multilabel(spark):
    out = {r.id: r.pred_labels for r in classify_docs(
        _docs(spark, 10), num_labels=4, multi_label=True, threshold=0.5
    ).collect()}
    for i in range(10):
        text = f"text number {i}"
        expect = [k for k in range(4) if _logit(text, k) > 0.5]
        assert list(out[i]) == expect


def test_classification_accuracy(spark):
    pred = spark.createDataFrame([(1, 0), (2, 1), (3, 2)], "id long, pred_label int")
    gold = spark.createDataFrame([(1, 0), (2, 2), (3, 2)], "id long, gold_label int")
    r = classification_accuracy(pred, gold).collect()[0]
    assert r.n == 3 and abs(r.accuracy - round(2 / 3, 6)) < 1e-9


def test_shuffle_deterministic(spark):
    a = [r.doc_id for r in shuffle(_docs(spark), seed=7).collect()]
    b = [r.doc_id for r in shuffle(_docs(spark), seed=7).collect()]
    assert a == b and a != sorted(a)


def test_bootstrap_with_replacement(spark):
    out = [r.doc_id for r in bootstrap(_docs(spark), seed=3, fraction=1.0).collect()]
    assert len(out) != len(set(out)) or len(out) != 40  # replacement evidence


def test_ratio_split_partitions(spark):
    tr, ev = ratio_split(_docs(spark, 100), 0.9, seed=1)
    ids_tr = {r.doc_id for r in tr.collect()}
    ids_ev = {r.doc_id for r in ev.collect()}
    assert ids_tr | ids_ev == set(range(100)) and not (ids_tr & ids_ev)


def test_kfold_assign_balanced_and_exhaustive(spark):
    a = kfold_assign(_docs(spark, 20), k=4, order_col="doc_id")
    folds = {r.doc_id: r.fold for r in a.collect()}
    assert set(folds.values()) == {0, 1, 2, 3}
    sizes = [list(folds.values()).count(f) for f in range(4)]
    assert sizes == [5, 5, 5, 5]


def test_kfold_slices_disjoint(spark):
    tr, ev = kfold_slices(_docs(spark, 20), k=4, fold=1, order_col="doc_id")
    tr_ids = {r.doc_id for r in tr.collect()}
    ev_ids = {r.doc_id for r in ev.collect()}
    assert len(ev_ids) == 5 and not (tr_ids & ev_ids)
    assert tr_ids | ev_ids == set(range(20))


def test_cap_and_sample(spark):
    assert cap_and_sample(_docs(spark, 40), max_rows=10).count() == 10
    n = cap_and_sample(_docs(spark, 40), sample_rate=0.5, seed=5).count()
    assert 5 <= n <= 35
