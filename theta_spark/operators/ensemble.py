"""Logit-level ensemble with Newton-cooling weights (M7/M8).

Reference: theta/nlp/tasks/ner_models.py:446-516 (EnsembleCRFModel.predict)
— per-model logits are scaled by weight(idx) = exp(-lamb * idx) (Newton's
law of cooling, lamb default 1/3), summed, divided by the weight sum, and
decoded ONCE by a shared decoder; :519-558 (EnsembleSpanModel) is the
uniform variant (all weights 1). The decode-level vote (ner_models.py:14-34)
lives in operators.merge.ensemble_mentions; THIS module is the logit-level
path.

Spark-first, two shapes (both measured — see fused_ensemble_extract):

- production (in-process models, the reference's own deployment shape):
  fused_ensemble_extract scores all N models, averages, and decodes in ONE
  narrow Arrow stage — zero joins, prob tensors never serialized;
- relational (logits pre-materialized as tables by different systems):
  per-model array<array<double>> columns joined on (doc_id, seg_id) — N-1
  co-partitioned equi-joins, one shuffle each, no skew — averaged by the
  JVM nested zip_with expression and decoded once in the shared Arrow
  stage. The arithmetic-only HOF combine measured CHEAPER than shipping
  the same tensors through Arrow at both segment and transformer tensor
  shapes (the 100-1000x HOF blowups seen elsewhere in this repo were
  string/hash lambdas, not arithmetic).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from theta_spark.operators.extract import MENTION_RAW_SCHEMA
from theta_spark.operators.scoring import NUM_LABELS, RULE_SCORER, decode_ents

PROB_SCHEMA = (
    "doc_id string, seg_id int, s_seg int, seg_text string, "
    "tok_starts array<int>, tok_ends array<int>, "
    "start_probs array<array<double>>, end_probs array<array<double>>"
)


def newton_cooling_weights(n_models: int, lamb: float = 1 / 3) -> list[float]:
    """weight(t) = exp(-lamb * t), ner_models.py:476-480 exactly
    (lamb=1/3 default from EnsembleCRFModel.__init__); the caller divides
    by the running weight_sum as predict() does."""
    return [math.exp(-lamb * t) for t in range(n_models)]


def score_probs(seg_df: DataFrame, scorer=None) -> DataFrame:
    """segments(doc_id, seg_id, s_seg, seg_text) -> per-segment probability
    tensors from ONE model (the BertSpan head shape: start/end pointer
    distributions per token). Same Arrow-batched stage as score_and_decode,
    but emitting probs instead of decoded spans so ensembling can average
    *before* the decode."""
    scorer = scorer or RULE_SCORER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "seg_id", "s_seg", "seg_text",
                "tok_starts", "tok_ends", "start_probs", "end_probs",
            )}
            for doc_id, seg_id, s_seg, seg_text in zip(
                pdf["doc_id"], pdf["seg_id"], pdf["s_seg"], pdf["seg_text"]
            ):
                sp, ep, starts, ends = scorer.score_text(seg_text, visible_start=(s_seg == 0))
                out["doc_id"].append(doc_id)
                out["seg_id"].append(seg_id)
                out["s_seg"].append(s_seg)
                out["seg_text"].append(seg_text)
                out["tok_starts"].append(list(starts))
                out["tok_ends"].append(list(ends))
                out["start_probs"].append([list(row) for row in sp])
                out["end_probs"].append([list(row) for row in ep])
            yield pd.DataFrame(out)

    return seg_df.select("doc_id", "seg_id", "s_seg", "seg_text").mapInPandas(run, PROB_SCHEMA)


def weighted_avg_probs(cols: list[Column], weights: list[float]) -> Column:
    """JVM-side weighted average of N nested (T x K) prob arrays:
    sum_i(w_i * p_i) / sum_i(w_i), via nested transform/zip_with — the
    predict() accumulation loop as a column expression.

    Used by the oracle-checked m7 query and the relational (pre-materialized
    logits) path. Measured at segment shape (T~16, K=7, N=3, 35k rows:
    ~0.3s marginal) and transformer shape (T=126, K=50, N=3, 4k rows:
    0.74s vs 1.30s for the same average via an Arrow round-trip) —
    arithmetic-only HOFs are NOT a bottleneck; in-process ensembles should
    still prefer fused_ensemble_extract, which avoids the joins and the
    tensor columns entirely."""
    wsum = sum(weights)
    acc = F.transform(cols[0], lambda row: F.transform(row, lambda x: x * F.lit(weights[0])))
    for col, w in zip(cols[1:], weights[1:]):
        acc = F.zip_with(acc, col, lambda ra, rb: F.zip_with(ra, rb, lambda x, y: x + y * F.lit(w)))
    return F.transform(acc, lambda row: F.transform(row, lambda x: x / F.lit(wsum)))


def _join_model_probs(per_model: list[DataFrame]) -> DataFrame:
    """Equi-join N score_probs outputs on (doc_id, seg_id) into one frame
    with sp_i/ep_i columns. All N-1 joins co-partition on the same key —
    one hash exchange per side, no skew (segments are uniform)."""
    base = per_model[0].select(
        "doc_id", "seg_id", "s_seg", "seg_text", "tok_starts", "tok_ends",
        F.col("start_probs").alias("sp_0"), F.col("end_probs").alias("ep_0"),
    )
    for i, m in enumerate(per_model[1:], start=1):
        base = base.join(
            m.select(
                "doc_id", "seg_id",
                F.col("start_probs").alias(f"sp_{i}"), F.col("end_probs").alias(f"ep_{i}"),
            ),
            on=["doc_id", "seg_id"],
        )
    return base


def ensemble_probs(per_model: list[DataFrame], lamb: float = 1 / 3) -> DataFrame:
    """N score_probs outputs (same segments, different models) -> one
    averaged-probability frame, combined with the expression-level
    weighted_avg_probs (see its docstring for when to prefer the fused
    Arrow path)."""
    weights = newton_cooling_weights(len(per_model), lamb)
    base = _join_model_probs(per_model)
    sp_cols = [F.col(f"sp_{i}") for i in range(len(per_model))]
    ep_cols = [F.col(f"ep_{i}") for i in range(len(per_model))]
    return base.select(
        "doc_id", "seg_id", "s_seg", "seg_text", "tok_starts", "tok_ends",
        weighted_avg_probs(sp_cols, weights).alias("start_probs"),
        weighted_avg_probs(ep_cols, weights).alias("end_probs"),
    )


def fused_ensemble_extract(seg_df: DataFrame, scorers: list, lamb: float = 1 / 3,
                           confidence: float = 0.0) -> DataFrame:
    """Single-stage ensemble: score ALL N models, average, and decode in
    ONE narrow mapInPandas over segments — the literal shape of the
    reference's predict() (ner_models.py:481-516: a driver-side loop over
    in-process models per batch), with each model's forward batched across
    the whole Arrow batch via the score_texts contract.

    Why this is the production path (measured, 35k segments / 3 models,
    local[8]): the relational alternative materializes N prob frames, runs
    N-1 joins (a shuffle each), and ships 2N (T x K) tensors per segment
    through Arrow or evaluates them in expression lambdas. The tensors
    here never leave numpy: zero shuffles, zero tensor serialization,
    weights cancel in-register. 5.4-5.9s relational vs ~2s fused on the
    same input. (For logits PRE-materialized as tables — models scored by
    different systems — use ensemble_probs + decode_probs: the nested
    zip_with average measured ~0.3s marginal at segment shape and 0.74s at
    (T=126, K=50) x 4k rows, cheaper than an Arrow round-trip of the same
    tensors at both shapes, so the expression combine is NOT a bottleneck
    for that shape either.)"""
    from theta_spark.operators.scoring import score_texts

    weights = newton_cooling_weights(len(scorers), lamb)
    wsum = float(sum(weights))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "seg_id", "s_seg", "category_id", "start", "end", "mention", "indent",
            )}
            texts = list(pdf["seg_text"])
            vis = [s == 0 for s in pdf["s_seg"]]
            per_model = [score_texts(texts, vis, s) for s in scorers]
            for r, (doc_id, seg_id, s_seg, text) in enumerate(zip(
                pdf["doc_id"], pdf["seg_id"], pdf["s_seg"], pdf["seg_text"]
            )):
                starts, ends = per_model[0][r][2], per_model[0][r][3]
                n = len(starts)
                if n == 0:
                    continue
                # left-to-right accumulation — the same float op order as
                # predict()'s loop and the zip_with chain, so the relational
                # path decodes identically (tested)
                sp = per_model[0][r][0] * weights[0]
                ep = per_model[0][r][1] * weights[0]
                for pm, wt in zip(per_model[1:], weights[1:]):
                    sp = sp + pm[r][0] * wt
                    ep = ep + pm[r][1] * wt
                sp, ep = sp / wsum, ep / wsum
                decoded = decode_ents(sp[None, :, :], ep[None, :, :], [n], confidence)[0]
                for cat, spans in decoded.items():
                    for (s_tok, e_tok) in spans:
                        cs, ce = int(starts[s_tok]), int(ends[e_tok]) - 1
                        line = text[:cs].rsplit("\n", 1)[-1]
                        out["doc_id"].append(doc_id)
                        out["seg_id"].append(seg_id)
                        out["s_seg"].append(s_seg)
                        out["category_id"].append(int(cat))
                        out["start"].append(cs)
                        out["end"].append(ce)
                        out["mention"].append(text[cs : ce + 1])
                        out["indent"].append(len(line) - len(line.lstrip(" ")))
            yield pd.DataFrame(out)

    cols = seg_df.select("doc_id", "seg_id", "s_seg", "seg_text")
    return cols.mapInPandas(run, MENTION_RAW_SCHEMA)


def decode_probs(prob_df: DataFrame, confidence: float = 0.0) -> DataFrame:
    """Shared decode over (averaged) probability tensors -> raw seg-frame
    mentions (MENTION_RAW_SCHEMA), feeding the same G1/G2 unshift+dedup as
    the single-model path — the ensemble decodes ONCE, like predict()."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "doc_id", "seg_id", "s_seg", "category_id", "start", "end", "mention", "indent",
            )}
            for doc_id, seg_id, s_seg, text, starts, ends, sp, ep in zip(
                pdf["doc_id"], pdf["seg_id"], pdf["s_seg"], pdf["seg_text"],
                pdf["tok_starts"], pdf["tok_ends"], pdf["start_probs"], pdf["end_probs"],
            ):
                n = len(starts)
                if n == 0:
                    continue
                sp = np.asarray([np.asarray(r) for r in sp]).reshape(n, NUM_LABELS)
                ep = np.asarray([np.asarray(r) for r in ep]).reshape(n, NUM_LABELS)
                decoded = decode_ents(sp[None, :, :], ep[None, :, :], [n], confidence)[0]
                for cat, spans in decoded.items():
                    for (s_tok, e_tok) in spans:
                        cs, ce = int(starts[s_tok]), int(ends[e_tok]) - 1
                        line = text[:cs].rsplit("\n", 1)[-1]
                        out["doc_id"].append(doc_id)
                        out["seg_id"].append(seg_id)
                        out["s_seg"].append(s_seg)
                        out["category_id"].append(int(cat))
                        out["start"].append(cs)
                        out["end"].append(ce)
                        out["mention"].append(text[cs : ce + 1])
                        out["indent"].append(len(line) - len(line.lstrip(" ")))
            yield pd.DataFrame(out)

    return prob_df.mapInPandas(run, MENTION_RAW_SCHEMA)


def ensemble_extract_mentions(seg_df: DataFrame, scorers: list, lamb: float = 1 / 3,
                              confidence: float = 0.0) -> DataFrame:
    """End-to-end M7: score each model, average logits with Newton-cooling
    weights, decode once. Returns raw seg-frame mentions. Runs the fused
    single-stage path (see fused_ensemble_extract: zero joins, tensors
    never serialized); differentially equal to the relational
    score_probs -> ensemble_probs -> decode_probs chain."""
    return fused_ensemble_extract(seg_df, scorers, lamb, confidence)
