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
