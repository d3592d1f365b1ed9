"""Document-deduplication operators for training-data pipelines:

- exact dedup: sha256 groupBy (see queries g2_dedup_docs)
- n-gram Jaccard near-dup: word-shingle MinHash + LSH banding + exact
  Jaccard verify (reuses theta_spark.canonicalize, which is built for
  entity names — here applied to document shingle sets)
- SimHash near-dup: 64-bit sign-aggregated token hashes, Hamming-bucket
  join (vectorized pandas UDF for the bit math; banding is relational)
- embedding-cosine near-dup: see functions.similarity

Scale notes: every step is blocked (LSH bands / simhash prefixes) — no
O(n^2) cross joins; the verify joins run on candidate pairs only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from theta_spark.canonicalize import jaccard_filter, lsh_candidate_pairs, minhash_signatures


def word_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, text) -> (id, shingle) distinct word-k-gram strings.

    Arrow-batched (mapInPandas) rather than column expressions: the
    per-position `transform`/`slice`/`concat_ws` lambdas evaluate in
    Spark's interpreted HOF path (profiled ~9s for 5000 docs vs <1s
    here); the Python walk stays narrow, no shuffle. Shingle content is
    pinned by the DuckDB oracle: lowercase, trim, split on \\s+, drop
    empties, k-gram join by single space, distinct per doc."""
    import re

    id_field = df.schema[id_col]

    def gen(batches):
        ws = re.compile(r"\s+")
        for pdf in batches:
            ids, shingles = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in ws.split((text or "").strip().lower()) if t]
                n = max(len(toks) - k, 0)
                grams = {" ".join(toks[i : i + k]) for i in range(n + 1)}
                ids.extend([doc_id] * len(grams))
                shingles.extend(grams)
            yield pd.DataFrame({"name": ids, "shingle": shingles})

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("name", id_field.dataType), T.StructField("shingle", T.StringType())]
    )
    return df.select(id_col, text_col).mapInPandas(gen, schema)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    max_bucket: int = 64,
) -> DataFrame:
    """Near-duplicate document pairs (a, b, jaccard) with word-k-gram
    Jaccard >= threshold, found via MinHash-LSH blocking."""
    # lazy checkpoint: the shingle table feeds the signature agg AND three
    # scans inside the verify (sizes, both join sides) — without the cut it
    # re-runs the split/transform/explode over the corpus once per consumer
    sh = word_shingles(df, id_col, text_col, k).localCheckpoint(eager=False)
    sig = minhash_signatures(sh, "name", num_hashes)
    # lsh_candidate_pairs emits distinct pairs (required: a pair surfacing
    # in several bands would otherwise multiply its intersection counts in
    # the join-based verify)
    pairs = lsh_candidate_pairs(sig, "name", bands, max_bucket)
    return jaccard_filter(pairs, sh, "name", threshold)


def _simhash64_batch(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (md5-derived per-token hashes,
    sign-aggregated per bit). Vectorized per Arrow batch."""
    import hashlib

    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    out = np.zeros(len(texts), dtype=np.int64)
    for row, text in enumerate(texts):
        acc = np.zeros(64, dtype=np.int64)
        for tok in (text or "").lower().split():
            h = np.frombuffer(hashlib.md5(tok.encode()).digest()[:8], dtype=">u8")[0]
            bits = (h >> shifts) & one
            acc += np.where(bits == one, 1, -1)
        u = int(np.sum((acc > 0).astype(np.uint64) << shifts, dtype=np.uint64))
        out[row] = u - (1 << 64) if u >= (1 << 63) else u  # two's-complement wrap
    return pd.Series(out)


def simhash64(col):
    """pandas_udf wrapper built lazily (type parsing needs a live session)."""
    return pandas_udf(_simhash64_batch, "long")(col)


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Candidate near-dup pairs by SimHash: band the 64-bit hash into 4
    16-bit chunks (pigeonhole: hamming<=3 pairs share >=1 exact chunk),
    bucket-join on chunks, verify hamming distance relationally via
    bit_count(xor). Returns (a, b, hamming)."""
    h = df.select(F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sh"))
    chunks = h.select(
        "id",
        "sh",
        F.posexplode(
            F.array(*[F.shiftrightunsigned("sh", 16 * i).bitwiseAND(F.lit(0xFFFF)) for i in range(4)])
        ).alias("chunk_id", "chunk"),
    )
    left = chunks.select(F.col("id").alias("a"), F.col("sh").alias("sh_a"), "chunk_id", "chunk")
    right = chunks.select(F.col("id").alias("b"), F.col("sh").alias("sh_b"), "chunk_id", "chunk")
    pairs = (
        left.join(right, on=["chunk_id", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("a", "b", "hamming")
