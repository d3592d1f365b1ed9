"""Deterministic hashed-n-gram document embedder (functions/embedding.py)."""

import numpy as np
from pyspark.sql import functions as F

from theta_spark.functions.embedding import embed_docs


def test_embeddings_are_unit_vectors(spark):
    d = spark.createDataFrame(
        [("a", "def foo(bar): return baz"), ("b", "class Qux: pass"), ("c", "x")],
        "doc_id string, text string",
    )
    rows = embed_docs(d, dim=16, k=3, round_to=None).collect()
    assert len(rows) == 3
    for r in rows:
        v = np.array(r["embedding"])
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


def test_embedding_deterministic_and_case_insensitive(spark):
    d = spark.createDataFrame(
        [("a", "Import OS"), ("b", "import os")], "doc_id string, text string"
    )
    rows = {r["doc_id"]: r["embedding"] for r in embed_docs(d).collect()}
    assert rows["a"] == rows["b"]  # lowercased shingles


def test_embedding_stage_is_narrow(spark):
    """documents -> embeddings must not shuffle (it feeds the similarity
    ops, which do their own partitioning)."""
    import contextlib
    import io

    d = spark.createDataFrame([("a", "text")], "doc_id string, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        embed_docs(d).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_embedding_feeds_similarity_ops(spark):
    """The embedder's output drops straight into the existing ANN path."""
    from theta_spark.functions.similarity import brute_force_topk

    d = spark.createDataFrame(
        [(f"d{i}", f"token{i} shared prefix body {i}") for i in range(8)],
        "doc_id string, text string",
    )
    emb = embed_docs(d, dim=16, round_to=None)
    queries = emb.limit(2)
    out = brute_force_topk(emb, queries, k=3, id_col="doc_id", vec_col="embedding")
    assert out.count() == 6
