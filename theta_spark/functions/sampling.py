"""Training-mixture sampling: deterministic stratified sampling and
domain-reweighting — the data-mixing stage between dedup/quality
filtering and tokenization in an LLM pre-training pipeline.

Both operators are replayable by construction (the same convention as
operators/augment.py: a draw is an md5 hash of (key, tag, seed), so the
same row draws the same value on any cluster, any partitioning, any
rerun) and integer-exact where it matters (keep/drop decisions are
integer comparisons, never float thresholds that could flip at a
rounding boundary between engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _draw32(key: Column, tag: str, seed: int) -> Column:
    """First 8 md5 hex chars of '<key>#<tag>#<seed>' as i64 in [0, 2^32)
    — the SQL twin is ('0x' || substr(md5(...), 1, 8))::BIGINT."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("", key.cast("string"), F.lit(f"#{tag}#{seed}"))), 1, 8),
        16,
        10,
    ).cast("long")


def stratified_sample(
    df: DataFrame,
    rates_permille: dict,
    stratum_col: str,
    key_col: str,
    seed: int = 42,
    default_permille: int = 0,
) -> DataFrame:
    """Keep each row iff draw(key) % 1000 < rates_permille[stratum] —
    per-stratum downsampling at ‰ resolution (e.g. keep 100% of rare
    languages, 25% of the dominant one). Strata absent from the map get
    `default_permille`.

    Scale shape: ONE narrow filter — no shuffle, no count pass, no
    state; the rate map rides as a literal CASE chain (strata are
    few by definition). The keep decision is an integer modulo
    comparison, so the sample is bit-identical across engines,
    partitionings, and reruns, and composable: a later pass at a lower
    rate with the same seed selects a strict subset (draws don't
    change).
    """
    rate = F.lit(default_permille)
    for stratum, pm in sorted(rates_permille.items()):
        rate = F.when(F.col(stratum_col) == stratum, F.lit(int(pm))).otherwise(rate)
    return df.filter((_draw32(F.col(key_col), "strat", seed) % 1000) < rate)


def domain_mix_weights(
    df: DataFrame,
    target_permille: dict,
    domain_col: str,
) -> DataFrame:
    """Domain-reweighting table for a target mixture (the DoReMi-style
    "make the training mix hit these proportions" step): per domain,
    observed share vs target share and the sampling weight

        weight      = (target_share / observed_share), capped at the max
        weight_norm = weight / max(weight)   (subsample-only: the domain
                      furthest BELOW target keeps everything, the rest
                      are downsampled toward the target mixture)

    Returns (domain, n_docs, observed_share, target_share, weight_norm).

    Scale shape: one groupBy(domain) count (map-side partials), one
    1-row max agg broadcast back — domains are few, rows are not; no
    per-row work until the caller applies the weights (feed weight_norm
    * 1000 into `stratified_sample` for the exact-integer keep rule).
    Ratios are single divisions of exact integers, rounded at 6dp on
    both engine sides.
    """
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tgt = F.lit(0)
    for dom, pm in sorted(target_permille.items()):
        tgt = F.when(F.col("domain") == dom, F.lit(int(pm))).otherwise(tgt)
    # weight ∝ target_pm * N_total / n_docs; normalize by the max so the
    # most under-represented domain keeps rate 1.0
    base = counts.crossJoin(
        F.broadcast(counts.agg(F.sum("n_docs").cast("long").alias("n_total")))
    ).select(
        "domain",
        "n_docs",
        "n_total",
        tgt.cast("long").alias("target_pm"),
        (tgt.cast("long") * F.col("n_total")).alias("w_num"),  # exact i64
        (F.lit(1000) * F.col("n_docs")).alias("w_den"),
    )
    mx = base.select(
        F.max(F.col("w_num") / F.col("w_den")).alias("w_max")
    )
    return (
        base.crossJoin(F.broadcast(mx))
        .select(
            "domain",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("observed_share"),
            F.round(F.col("target_pm") / 1000.0, 6).alias("target_share"),
            F.round(
                F.when(
                    F.col("w_max") > 0,
                    (F.col("w_num") / F.col("w_den")) / F.col("w_max"),
                ).otherwise(0.0),
                6,
            ).alias("weight_norm"),
        )
    )


def group_sample(
    df: DataFrame,
    n_per_group: int,
    group_col: str,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Exactly-K-per-group uniform sample, reproducible: rank rows within
    each group by their md5 draw (ties broken by key) and keep the first
    `n_per_group` — the "pull K random-but-replayable examples per
    domain/language/bucket" curation op. Unlike rate-based
    `stratified_sample`, the count is exact per group.

    Scale shape: one window PARTITIONED BY the group (groups are the
    scale-out dimension; Spark plans it as WindowGroupLimit — a per-
    partition top-K push-down, no full sort of the group). Same draw
    convention as everywhere: same seed → same sample on any cluster.
    """
    w = Window.partitionBy(group_col).orderBy(
        _draw32(F.col(key_col), "gsample", seed), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )
