"""Metrics operators (A1-A5) — exact formulas incl. the reference's
micro/macro naming quirks, on hand-built mention tables."""

from theta_spark.metrics import (
    macro_metrics,
    micro_metrics,
    prf_per_category,
    span_match_counts,
    triple_set_prf,
)

MENTIONS_SCHEMA = "doc_id string, category string, start int, end int"


def _counts(spark):
    pred = spark.createDataFrame(
        [
            ("d1", "fn", 0, 2), ("d1", "fn", 10, 12),   # 1 tp, 1 fp
            ("d1", "cls", 5, 8),                          # tp
            ("d2", "cls", 1, 3),                          # fp
        ],
        MENTIONS_SCHEMA,
    )
    gold = spark.createDataFrame(
        [
            ("d1", "fn", 0, 2),
            ("d1", "cls", 5, 8),
            ("d2", "fn", 7, 9),                           # fn
        ],
        MENTIONS_SCHEMA,
    )
    return span_match_counts(pred, gold)


def test_span_match_counts(spark):
    rows = {r.category: (r.tp, r.fp, r.fn) for r in _counts(spark).collect()}
    assert rows == {"fn": (1, 1, 1), "cls": (1, 1, 0)}


def test_prf_per_category(spark):
    rows = {r.category: r for r in prf_per_category(_counts(spark)).collect()}
    assert rows["fn"].precision_v == 0.5 and rows["fn"].recall_v == 0.5
    assert rows["cls"].precision_v == 0.5 and rows["cls"].recall_v == 1.0
    # sorted by f1 desc: cls (f1=2/3) before fn (0.5)
    out = [r.category for r in prf_per_category(_counts(spark)).collect()]
    assert out == ["cls", "fn"]


def test_micro_is_category_average(spark):
    # reference "Micro" = mean of per-category metrics (task_ner.py:1216-1222)
    m = micro_metrics(_counts(spark)).collect()[0]
    assert m.micro_precision == 0.5
    assert m.micro_recall == 0.75
    f_cls, f_fn = 2 * 0.5 * 1 / 1.5, 0.5
    assert abs(m.micro_f1 - round((f_cls + f_fn) / 2, 6)) < 1e-6


def test_macro_is_pooled(spark):
    # reference "Macro" = pooled tp/fp/fn (task_ner.py:1292-1297)
    m = macro_metrics(_counts(spark)).collect()[0]
    assert (m.tp, m.fp, m.fn) == (2, 2, 1)
    assert m.macro_precision == 0.5
    assert abs(m.macro_recall - round(2 / 3, 6)) < 1e-9


def test_micro_weights(spark):
    w = spark.sparkSession if False else None
    weights = _counts(spark).sparkSession.createDataFrame(
        [("cls", 2.0), ("fn", 0.0)], "category string, weight double"
    )
    m = micro_metrics(_counts(spark), weights).collect()[0]
    assert m.micro_precision == 0.5  # (0.5*2 + 0.5*0)/2


def test_triple_set_prf(spark):
    t = "subj string, pred string, obj string, doc_id string"
    a = spark.createDataFrame([("s", "p", "o", "d"), ("x", "p", "y", "d")], t)
    b = spark.createDataFrame([("s", "p", "o", "d"), ("z", "p", "w", "d")], t)
    r = triple_set_prf(a, b).collect()[0]
    assert (r.tp, r.fp, r.fn) == (1, 1, 1)
    assert r.precision_v == 0.5 and r.recall_v == 0.5 and r.f1 == 0.5


def test_cohens_kappa_hand_computed(spark):
    """Textbook 2x2 case and the degenerate constant-annotator cases."""
    from theta_spark.metrics import cohens_kappa

    # classic example: a=[y x20, n x5 | y x10, n x15] -> po=.7, pe=.5, k=.4
    rows = (
        [("y", "y")] * 20 + [("y", "n")] * 5 + [("n", "y")] * 10 + [("n", "n")] * 15
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert (r.n, r.n_agree, r.po, r.pe, r.kappa) == (50, 35, 0.7, 0.5, 0.4)

    # both constant + full agreement: pe saturates -> kappa 1.0
    same = spark.createDataFrame([("x", "x")] * 9, "a string, b string")
    assert cohens_kappa(same, "a", "b").collect()[0].kappa == 1.0
    # disjoint constant annotators: no marginal overlap, s=0 -> kappa 0.0
    diff = spark.createDataFrame([("x", "y")] * 9, "a string, b string")
    r2 = cohens_kappa(diff, "a", "b").collect()[0]
    assert (r2.n_agree, r2.kappa) == (0, 0.0)
