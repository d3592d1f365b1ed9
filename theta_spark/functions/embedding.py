"""Deterministic document embedder: text -> unit vector, Arrow-batched.

The reference pipeline's entity-link scoring runs documents through a
learned encoder to get dense vectors (north star: "mention detection +
entity-link scoring in vectorized batches"); no trained encoder ships in
this sandbox, so this is the drop-in stand-in with the same dataflow
shape: a feature-hashed character-n-gram projection (random-feature
embedding) run as ONE `mapInPandas` stage — the exact slot a real
encoder UDF (sentence-transformer etc.) plugs into, with identical
schema (`array<double>` unit vector), partitioning (narrow, no shuffle)
and downstream consumers (`functions.similarity` top-k / near-dup,
which already run on the testdata's precomputed embeddings).

Math: e_j = sum over k-gram shingles g of (md5_frac(j || '|' || g) - 0.5),
then L2-normalize; md5_frac = first 8 md5 hex chars / 2^32. Every term is
md5-derived, so a DuckDB oracle reproduces vectors bit-for-bit (rounded
on both sides to absorb the final divide).

Why not a column-expression tree: Spark's higher-order functions
(`aggregate`/`transform`) evaluate their lambdas interpreted, outside
whole-stage codegen — md5-per-shingle-per-dim measured ~170us/term,
minutes for 500 docs. The Arrow batch amortizes hashing with a per-task
shingle memo (code corpora repeat 3-grams heavily), the same
batched-inference economics a real encoder relies on.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Per-task shingle -> contribution-vector memo cap (entries). 2^18 16-dim
# float64 vectors ~= 32 MB; beyond that the memo resets (bounded memory,
# same discipline as the extract-stage last-doc cache).
_MEMO_CAP = 1 << 18


def _shingle_vec(g: str, dim: int) -> np.ndarray:
    """The per-shingle contribution: dim md5-derived uniform(-0.5, 0.5)."""
    return np.array(
        [
            int(hashlib.md5(f"{j}|{g}".encode()).hexdigest()[:8], 16) / 4294967296.0 - 0.5
            for j in range(dim)
        ]
    )


def embed_texts(texts, dim: int = 16, k: int = 3, memo: dict | None = None) -> np.ndarray:
    """Batch of texts -> (n, dim) L2-normalized hashed-n-gram embeddings.

    Shingling matches the SQL oracle exactly: lowercase, shingles
    substr(t, i, k) for i in 1..max(len-k+1, 1) — a text shorter than k
    contributes its (possibly empty) self as the single shingle.
    """
    if memo is None:
        memo = {}
    out = np.zeros((len(texts), dim))
    for row, t in enumerate(texts):
        t = (t or "").lower()
        v = np.zeros(dim)
        for i in range(max(len(t) - k + 1, 1)):
            g = t[i : i + k]
            c = memo.get(g)
            if c is None:
                if len(memo) >= _MEMO_CAP:
                    memo.clear()
                c = memo[g] = _shingle_vec(g, dim)
            v += c
        n = np.sqrt((v * v).sum())
        out[row] = v / n if n > 0 else v
    return out


def embed_docs(
    docs: DataFrame,
    dim: int = 16,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """-> (id_col, out_col array<double>): the documents -> embeddings
    stage. Narrow (zero shuffles); swap the `embed_texts` body for a real
    model's batch-encode call to use a learned encoder behind the same
    signature."""
    schema = T.StructType([docs.schema[id_col], T.StructField(out_col, T.ArrayType(T.DoubleType()))])

    def gen(batches):
        memo: dict = {}
        for pdf in batches:
            vecs = embed_texts(pdf[text_col].tolist(), dim=dim, k=k, memo=memo)
            if round_to is not None:
                vecs = np.round(vecs, round_to)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: list(vecs)})

    return docs.select(id_col, text_col).mapInPandas(gen, schema)
