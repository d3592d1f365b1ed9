"""Merge / dedup / vote operators (SURVEY.md §2.7, G1-G8).

All relational — these replace the reference's per-guid Python loops:
- G1 segment un-shift + concat: task_ner.py:1391-1401
- G2 order-preserving dedup:    task_ner.py:1403-1415
- G3 keep-last dedup:           theta/nlp/data/samples.py:20-31
- G4 merge_entities(min_dups):  samples.py:34-45 (group-count in disguise)
- G5 entity vote:               theta/nlp/tasks/ner_models.py:14-34
- G6 dataset diff:              theta/__main__.py:592-622
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def unshift_mentions(raw: DataFrame) -> DataFrame:
    """G1: seg-local offsets -> document-global char offsets."""
    return raw.select(
        "doc_id",
        "seg_id",
        "category_id",
        (F.col("start") + F.col("s_seg")).alias("start"),
        (F.col("end") + F.col("s_seg")).alias("end"),
        "mention",
        "indent",
    )


def dedup_mentions(mentions: DataFrame) -> DataFrame:
    """G2: one row per (doc, category, span). Deterministic: `indent` can
    differ between overlapping segments when a window cut lands inside
    leading whitespace (the cut segment sees a shorter indent), so we take
    max(indent); min seg_id (row_number asc) keeps first-occurrence
    provenance like the reference's order-preserving dedup
    (task_ner.py:1403-1415).

    Physical plan note: one explicit hash repartition on doc_id, then both
    window specs below — and the doc-level windows of the downstream triple
    assembly — are satisfied by that same partitioning (their partition keys
    contain doc_id), so the whole mentions->triples chain runs on a single
    shuffle with only per-partition sorts between stages."""
    key = ["doc_id", "category_id", "start", "end"]
    w_key = Window.partitionBy(*key)
    w_ord = Window.partitionBy(*key).orderBy("seg_id")
    return (
        mentions.repartition("doc_id")
        .withColumn("_indent", F.max("indent").over(w_key))
        .withColumn("_rn", F.row_number().over(w_ord))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            "category_id",
            "start",
            "end",
            "seg_id",
            "mention",
            F.col("_indent").alias("indent"),
        )
    )


def dedup_keep_last(df: DataFrame, key_cols: list, order_col: str) -> DataFrame:
    """G3 (samples.py:20-31): keep the last occurrence of each duplicate."""
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_min_dups(df: DataFrame, key_cols: list, min_dups: int = 2) -> DataFrame:
    """G4 (samples.py:34-45): keep rows whose key occurs >= min_dups times.

    The reference sorts the flattened list and keeps items heading a
    uniform run of length min_dups — exactly group-count >= min_dups."""
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_n"))
    return (
        df.dropDuplicates(key_cols)
        .join(counts.filter(F.col("_n") >= min_dups), on=key_cols, how="inner")
        .drop("_n")
    )


def entity_vote(df: DataFrame, key_cols: list, n_models: int, threshold: float = 0.9) -> DataFrame:
    """G5 (ner_models.py:14-34): keep entities predicted by >=
    int(n_models * threshold) models. `df` holds one row per (model, entity)."""
    threshold_nums = int(n_models * threshold)
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("votes"))
        .filter(F.col("votes") >= threshold_nums)
    )


def ensemble_mentions(
    per_model: list[DataFrame],
    key_cols: list,
    cooling_lambda: float = 0.0,
    threshold: float = 0.5,
) -> DataFrame:
    """M7/M8 ensemble (ner_models.py:446-558) expressed relationally: each
    model's mention set is unioned with its Newton-cooling weight
    e^(-lambda*model_idx) (weight at ner_models.py:476-480; lambda=0 =
    uniform averaging, the Span-ensemble variant at :519-558); a mention
    survives if its weight mass >= threshold * total mass. Logit-level
    averaging lives inside the scoring UDF when heads share a decode; this
    operator is the decode-level ensemble the reference's entity_vote
    applies across checkpoints."""
    import math

    weights = [math.exp(-cooling_lambda * i) for i in range(len(per_model))]
    total = sum(weights)
    tagged = [
        df.select(*key_cols).distinct().withColumn("_w", F.lit(w))
        for df, w in zip(per_model, weights)
    ]
    allm = tagged[0]
    for t in tagged[1:]:
        allm = allm.unionByName(t)
    return (
        allm.groupBy(*key_cols)
        .agg(F.sum("_w").alias("weight_mass"))
        .filter(F.col("weight_mass") >= threshold * total)
    )


def dataset_diff(a: DataFrame, b: DataFrame, key_cols: list):
    """G6: (A-only, B-only, common) by key."""
    a_k = a.select(*key_cols)
    b_k = b.select(*key_cols)
    return (
        a_k.exceptAll(b_k).distinct(),
        b_k.exceptAll(a_k).distinct(),
        a_k.intersect(b_k),
    )
