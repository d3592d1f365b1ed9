"""BPE tokenizer training (Sennrich et al. 2016) — learn merge rules
from corpus statistics, the step every LLM data pipeline runs between
corpus curation and tokenization.

Distributed shape: the corpus lives as one row per WORD TYPE with its
count (groupBy word — types, not tokens, so the working set is the
vocabulary, orders of magnitude smaller than the corpus) and a symbol
array. Each merge round is

    1. adjacent-pair counts: one narrow transform (zip the symbol array
       with its tail) + explode + groupBy(pair) SUM weighted by word
       count — map-side partials, the wordcount shuffle;
    2. winner selection: ONE driver-side head of the (count DESC, pair
       ASC) TakeOrderedAndProject — deterministic tie-break, O(1)
       driver traffic;
    3. apply the merge: a narrow per-row symbol-array rewrite (Arrow
       batch, no shuffle) — only rows containing the pair change.

Rounds are inherently sequential (merge r+1's counts depend on merge
r's rewrite — same iteration discipline as pagerank), so wall-clock is
O(rounds) shuffles over the TYPE table. The first round's pair counts
are oracle-checked relationally (`t_bpe_pairs`); the full loop is
pinned against a pure-python replica in tests.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount, syms): whitespace word types with corpus counts and
    their initial character-symbol arrays (lowercased, the shingle
    convention) plus the end-of-word marker '</w>' BPE needs so merges
    cannot cross word boundaries."""
    words = docs.select(
        F.explode(
            F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != "")
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wcount"))
        .withColumn(
            "syms",
            F.concat(F.split(F.col("word"), ""), F.array(F.lit("</w>"))),
        )
    )


def pair_counts(types_df: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-symbol pair counts over the type table,
    weighted by word count — zip_with the symbol array against its tail
    (narrow), explode, one groupBy sum."""
    pairs = types_df.select(
        "wcount",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.greatest(F.size("syms") - 1, F.lit(0))),
                F.slice(F.col("syms"), 2, F.greatest(F.size("syms") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("a"), b.alias("b")),
            )
        ).alias("p"),
    )
    return (
        pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "wcount")
        .groupBy("a", "b")
        .agg(F.sum("wcount").cast("long").alias("cnt"))
    )


def _apply_merge(types_df: DataFrame, a: str, b: str) -> DataFrame:
    """Rewrite symbol arrays replacing adjacent (a, b) with a+b —
    leftmost-first within each word, one narrow Arrow stage."""

    def gen(batches):
        for pdf in batches:
            out_syms = []
            for syms in pdf["syms"]:
                s = list(syms)
                merged, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(s[i])
                        i += 1
                out_syms.append(merged)
            yield pd.DataFrame(
                {"word": pdf["word"], "wcount": pdf["wcount"], "syms": out_syms}
            )

    schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("wcount", T.LongType()),
            T.StructField("syms", T.ArrayType(T.StringType())),
        ]
    )
    return types_df.mapInPandas(gen, schema=schema)


def train_bpe(docs: DataFrame, n_merges: int, text_col: str = "text") -> list:
    """Learn `n_merges` BPE merge rules → [(a, b, count), ...] in merge
    order. Winner per round = highest pair count, ties to the
    lexicographically smallest (a, b) — fully deterministic. Stops early
    if no pair remains. Driver traffic is one 1-row head per round."""
    types_df = word_types(docs, text_col).localCheckpoint(eager=True)
    merges = []
    for _ in range(n_merges):
        top = (
            pair_counts(types_df)
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0].a, top[0].b, top[0].cnt
        merges.append((a, b, cnt))
        # eager cut per round: the next round's counts must see the
        # rewritten arrays, and lineage would otherwise stack one Arrow
        # stage per merge
        types_df = _apply_merge(types_df, a, b).localCheckpoint(eager=True)
    return merges
