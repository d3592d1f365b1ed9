"""M7/M8 logit-level ensemble (reference EnsembleCRFModel.predict,
ner_models.py:446-516): Newton-cooling weights, JVM weighted average,
single shared decode."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from theta_spark.operators.ensemble import (
    decode_probs,
    ensemble_extract_mentions,
    ensemble_probs,
    newton_cooling_weights,
    score_probs,
    weighted_avg_probs,
)


def test_newton_cooling_weight_formula():
    """weight(t) = exp(-lamb * t), lamb default 1/3 (ner_models.py:452,
    476-480) — reproduced exactly."""
    w = newton_cooling_weights(4)
    assert w == [math.exp(-t / 3) for t in range(4)]
    assert newton_cooling_weights(3, lamb=0.0) == [1.0, 1.0, 1.0]


def test_weighted_avg_probs_numpy_parity(spark):
    """The JVM nested-zip_with average == numpy (sum w_i p_i) / sum w_i."""
    rng = np.random.default_rng(0)
    p = [rng.random((3, 4)).round(6) for _ in range(3)]
    w = newton_cooling_weights(3)
    df = spark.createDataFrame(
        [(p[0].tolist(), p[1].tolist(), p[2].tolist())],
        "a array<array<double>>, b array<array<double>>, c array<array<double>>",
    )
    out = df.select(
        weighted_avg_probs([F.col("a"), F.col("b"), F.col("c")], w).alias("avg")
    ).collect()[0]["avg"]
    expect = (p[0] * w[0] + p[1] * w[1] + p[2] * w[2]) / sum(w)
    assert np.allclose(np.array(out), expect, atol=1e-12)


@pytest.fixture(scope="module")
def segs50(spark, corpus50):
    from theta_spark.config import PipelineConfig
    from theta_spark.operators.segmentation import segment
    from theta_spark.pipeline import with_doc_id

    cfg = PipelineConfig()
    return segment(with_doc_id(corpus50), "text", cfg.seg_len, cfg.seg_stride)


def test_ensemble_of_identical_models_is_identity(spark, segs50):
    """Averaging N copies of one model and decoding once == that model's
    own score->decode (weights cancel)."""
    from theta_spark.operators.extract import score_and_decode

    single = {
        tuple(r)
        for r in score_and_decode(segs50)
        .select("doc_id", "seg_id", "category_id", "start", "end")
        .collect()
    }
    pm = [score_probs(segs50) for _ in range(3)]
    ens = {
        tuple(r)
        for r in decode_probs(ensemble_probs(pm))
        .select("doc_id", "seg_id", "category_id", "start", "end")
        .collect()
    }
    assert single == ens
    assert len(single) > 100


def test_fused_ensemble_equals_relational_combine(spark, segs50):
    """The fused single-stage ensemble (production path: N models scored,
    averaged, and decoded inside one Arrow stage) produces EXACTLY the
    same mentions as the relational chain (score_probs per model ->
    co-partitioned joins -> zip_with average -> decode_probs) — same
    weights, same left-to-right accumulation order."""
    from theta_spark.operators.ensemble import fused_ensemble_extract
    from theta_spark.operators.neural import default_mlp_scorer
    from theta_spark.operators.scoring import RULE_SCORER

    scorers = [RULE_SCORER, default_mlp_scorer(), RULE_SCORER]
    pm = [score_probs(segs50, s) for s in scorers]
    cols = ["doc_id", "seg_id", "category_id", "start", "end", "mention"]
    relational = {
        tuple(r) for r in decode_probs(ensemble_probs(pm)).select(*cols).collect()
    }
    fused = {
        tuple(r)
        for r in fused_ensemble_extract(segs50, scorers).select(*cols).collect()
    }
    assert fused == relational
    assert len(fused) > 100


def test_ensemble_rule_plus_mlp(spark, segs50):
    """Heterogeneous ensemble (rule scorer + trained MLP): end-to-end
    through score -> Newton-cooling average -> shared decode; the averaged
    model must stay close to the rule decode (the MLP agrees ~everywhere,
    and where it dissents the weighted average still favors model 0)."""
    from theta_spark.operators.extract import score_and_decode
    from theta_spark.operators.neural import default_mlp_scorer
    from theta_spark.operators.scoring import RULE_SCORER

    rule = {
        tuple(r)
        for r in score_and_decode(segs50)
        .select("doc_id", "seg_id", "category_id", "start", "end")
        .collect()
    }
    ens = {
        tuple(r)
        for r in ensemble_extract_mentions(segs50, [RULE_SCORER, default_mlp_scorer()])
        .select("doc_id", "seg_id", "category_id", "start", "end")
        .collect()
    }
    tp = len(rule & ens)
    f1 = 2 * tp / (len(rule) + len(ens))
    assert f1 >= 0.95, f1
