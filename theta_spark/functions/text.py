"""Text-analysis column functions for large-scale training-data pipelines:
language-ID heuristic, quality scoring, token counting, document
fingerprinting. All pure Spark column expressions (JVM-side, inside
whole-stage codegen) — no UDFs — with exact DuckDB-SQL twins in
theta_spark.queries for the driver differential.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small embedded stopword list (shared literal with the SQL oracles)
EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# deliberately small class shared verbatim with the DuckDB oracle (Java
# regex and RE2 agree on it; quotes/brackets invite dialect drift)
PUNCT_CLASS = r"[.,;:!?]"


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text (empty text -> empty array)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish subword token estimate: word-piece regex `[A-Za-z0-9]{1,4}`
    plus single non-alnum-non-space marks — a deterministic stand-in for a
    real BPE vocab, counting max-4-char alnum chunks the way byte-pair
    merges bottom out on rare words."""
    return F.size(F.regexp_extract_all(col, F.lit(r"([A-Za-z0-9]{1,4}|[^A-Za-z0-9\s])"), 1))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(F.lower(col))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, PUNCT_CLASS, "")
    return F.when(
        F.length(col) > 0, (F.length(col) - F.length(stripped)) / F.length(col)
    ).otherwise(F.lit(0.0))


def mean_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite quality in [0,1]: length band + stopword presence + sane
    punctuation + sane mean token length (heuristics in the C4/Gopher-rules
    family, expressed as one column formula)."""
    n = token_count(col)
    len_ok = F.when((n >= 10) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    mtl = mean_token_len(col)
    mtl_ok = F.when((mtl >= 2.0) & (mtl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + stop_ok + punct_ok + mtl_ok) / 4.0


def ascii_letter_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[A-Za-z]", "")
    return F.when(
        F.length(col) > 0, (F.length(col) - F.length(stripped)) / F.length(col)
    ).otherwise(F.lit(0.0))


def lang_id(col: Column) -> Column:
    """Heuristic language ID: 'en' when ASCII-letter-dominant AND at least
    one top-English stopword occurs; 'other_latin' when merely
    ASCII-dominant; 'non_latin' otherwise. (An n-gram-profile classifier
    would slot in as a pandas UDF; the heuristic keeps the operator
    JVM-side and oracle-reproducible.)"""
    stop_hit = stopword_ratio(col) > 0
    asciiish = ascii_letter_ratio(col) >= 0.4
    return (
        F.when(asciiish & stop_hit, F.lit("en"))
        .when(asciiish, F.lit("other_latin"))
        .otherwise(F.lit("non_latin"))
    )


def fingerprint(col: Column, k: int = 8) -> Column:
    """Document fingerprint: min-hash over character k-gram shingles of the
    lowercased text (winnowing-style — robust to local edits, unlike a
    whole-text hash). md5-based so DuckDB reproduces it bit-for-bit."""
    lowered = F.lower(col)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(lowered) - (k - 1), F.lit(1))),
        lambda i: F.md5(lowered.substr(i, F.lit(k))),
    )
    return F.array_min(shingles)


def content_hash(col: Column) -> Column:
    """Exact-dedup key: sha256 of the raw text (input_hint invariant)."""
    return F.sha2(col, 256)
