"""M5 MRC per-predicate conditioned extraction (crossJoin broadcast dim)."""

from theta_spark.operators.extract import mrc_extract
from theta_spark.pipeline import with_doc_id


def test_mrc_roles_follow_predicate_dim(spark, corpus50):
    # orderBy before limit: a bare limit on a parallel plan is
    # nondeterministic across evaluations
    docs = with_doc_id(corpus50).orderBy("doc_id").limit(5)
    predicates = spark.createDataFrame(
        [("calls", "function", "call"), ("imports", "module", "library")],
        "predicate string, subj_category string, obj_category string",
    )
    out = mrc_extract(docs, predicates).collect()
    assert out
    by_pred = {}
    for r in out:
        by_pred.setdefault(r.predicate, set()).add((r.role, r.category_id))
    from theta_spark.config import LABEL2ID

    assert by_pred["calls"] <= {
        ("subject", LABEL2ID["function"]), ("object", LABEL2ID["call"])
    }
    assert by_pred["imports"] <= {
        ("subject", LABEL2ID["module"]), ("object", LABEL2ID["library"])
    }
    # spans are real mentions: slice identity on one doc
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in out[:50]:
        assert texts[r.doc_id][r.start : r.end + 1] == r.mention


def test_mrc_last_doc_cache_across_small_arrow_batches(spark, corpus50):
    """The per-partition scorer cache is a single (last_doc, mentions) entry
    (bounded memory); correctness must hold even when a doc's predicate
    copies span multiple Arrow batches."""
    docs = with_doc_id(corpus50).orderBy("doc_id").limit(6).coalesce(1)
    predicates = spark.createDataFrame(
        [("calls", "function", "call"), ("imports", "module", "library"),
         ("defines", "module", "function")],
        "predicate string, subj_category string, obj_category string",
    )
    baseline = {tuple(r) for r in mrc_extract(docs, predicates).collect()}
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        tiny = {tuple(r) for r in mrc_extract(docs, predicates).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert tiny == baseline and baseline


def test_conditional_layer_norm_inert_at_init():
    """Reference reset_weight_and_bias (modules.py:109-117): zero cond-dense
    weights make CLN a plain layer norm — cond has NO effect at step 0."""
    import numpy as np

    from theta_spark.operators.neural import ConditionalLayerNorm, cond_embedding

    cln = ConditionalLayerNorm.inert(cond_dim=16, hidden=8)
    x = np.arange(24, dtype=np.float64).reshape(3, 8)
    a = cln(x, cond_embedding("calls", 16))
    b = cln(x, cond_embedding("imports", 16))
    mean = x.mean(-1, keepdims=True)
    std = np.sqrt(((x - mean) ** 2).mean(-1, keepdims=True) + 1e-12)
    plain = (x - mean) / std
    assert np.allclose(a, plain) and np.allclose(b, plain)


def test_conditioned_encoder_representations_differ_by_predicate():
    """With nonzero cond-dense weights the SAME text scores differently
    under different predicates — conditioning reaches the encoder
    (modules.py:119-136 forward), not just the decode filter."""
    import numpy as np

    from theta_spark.operators.neural import (
        CondMLPScorer,
        ConditionalLayerNorm,
        default_mlp_scorer,
    )

    scorer = CondMLPScorer(default_mlp_scorer(), ConditionalLayerNorm.seeded(16))
    text = "def foo(bar):\n    return baz.qux(bar)\n"
    sp_a, ep_a, st_a, en_a = scorer.score_text_cond(text, "calls")
    sp_b, ep_b, st_b, en_b = scorer.score_text_cond(text, "imports")
    assert list(st_a) == list(st_b) and list(en_a) == list(en_b)  # same tokenization
    assert not np.allclose(sp_a, sp_b) or not np.allclose(ep_a, ep_b)


def test_mrc_with_conditioned_encoder_runs_and_respects_roles(spark, corpus50):
    from theta_spark.config import LABEL2ID
    from theta_spark.operators.neural import (
        CondMLPScorer,
        ConditionalLayerNorm,
        default_mlp_scorer,
    )

    docs = with_doc_id(corpus50).orderBy("doc_id").limit(4)
    predicates = spark.createDataFrame(
        [("calls", "function", "call"), ("imports", "module", "library")],
        "predicate string, subj_category string, obj_category string",
    )
    cond = CondMLPScorer(default_mlp_scorer(), ConditionalLayerNorm.seeded(16))
    out = mrc_extract(docs, predicates, cond_scorer=cond).collect()
    assert out
    allowed = {
        "calls": {("subject", LABEL2ID["function"]), ("object", LABEL2ID["call"])},
        "imports": {("subject", LABEL2ID["module"]), ("object", LABEL2ID["library"])},
    }
    for r in out:
        assert (r.role, r.category_id) in allowed[r.predicate]
    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in out[:50]:
        assert texts[r.doc_id][r.start : r.end + 1] == r.mention
