"""Near-dup cluster RESOLUTION (dd_cluster_resolve): LSH pair stream ->
connected components -> one keeper per transitive cluster — including the
chain case A~B~C where A and C are NOT a pair themselves."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def chain_docs(spark):
    base = [f"tok{i}" for i in range(30)]
    a = list(base)
    b = list(base)
    b[5] = "CHANGED_B"          # J(a,b) = 25/31 ~ 0.81 >= 0.8
    c = list(b)
    c[20] = "CHANGED_C"         # J(b,c) ~ 0.81; J(a,c) = 22/34 ~ 0.65 < 0.8
    d = [f"other{i}" for i in range(30)]
    rows = [(1, " ".join(a)), (2, " ".join(b)), (3, " ".join(c)), (4, " ".join(d))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chain_pairs_exclude_far_ends(chain_docs):
    from theta_spark.functions.dedup import ngram_jaccard_pairs

    pairs = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(chain_docs, "doc_id", "text", k=3, threshold=0.8).collect()
    }
    assert pairs == {(1, 2), (2, 3)}


def test_transitive_chain_resolves_to_one_keeper(chain_docs):
    from pyspark.sql import functions as F

    from theta_spark.canonicalize import connected_components
    from theta_spark.functions.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(chain_docs, "doc_id", "text", k=3, threshold=0.8).select("a", "b")
    comp = connected_components(pairs, nodes=chain_docs.select("doc_id"), name_col="doc_id")
    keeper = {r["name"]: r["component"] for r in comp.collect()}
    # A, B, C collapse transitively to min(doc_id)=1; the isolated doc keeps itself
    assert keeper == {1: 1, 2: 1, 3: 1, 4: 4}


def test_resolution_query_at_sf0001(spark):
    """The driver-contract query itself at sf0.001: total coverage (every
    doc appears exactly once) and keeper <= doc_id everywhere."""
    from theta_spark.queries import QUERIES

    out = QUERIES["dd_cluster_resolve"](spark, "/root/testdata/sf0.001").collect()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert len(out) == docs
    assert all(r["keeper"] <= r["doc_id"] for r in out)
    assert len({r["doc_id"] for r in out}) == docs
