"""GlobalPointer-style span-matrix decode (operators/globalpointer.py):
unit semantics + differential equality with the D1 span decode through the
full engine path, including the Spark fused stage."""

import numpy as np

from theta_spark.config import PipelineConfig
from theta_spark.operators.globalpointer import decode_global_pointer
from theta_spark.reference_impl import extract_doc_mentions


def _probs(n, cat_pairs, n_cat=4):
    sp = np.zeros((n, n_cat))
    ep = np.zeros((n, n_cat))
    for c, s, e in cat_pairs:
        sp[s, c] = 1.0
        ep[e, c] = 1.0
    return sp, ep


def test_simple_spans():
    sp, ep = _probs(10, [(1, 1, 3), (1, 6, 8)])
    assert decode_global_pointer(sp, ep) == [(1, 1, 3), (1, 6, 8)]


def test_cross_pairs_suppressed():
    # starts at 1 and 6, ends at 3 and 8 (same category): the cross pair
    # (1, 8) scores as high as the true pairs — NMS must kill it
    sp, ep = _probs(10, [(1, 1, 3), (1, 6, 8)])
    got = decode_global_pointer(sp, ep)
    assert (1, 1, 8) not in got


def test_threshold():
    sp, ep = _probs(5, [(1, 0, 2)])
    sp[0, 1] = ep[2, 1] = 0.4
    assert decode_global_pointer(sp, ep, confidence=0.5) == []
    assert decode_global_pointer(sp, ep, confidence=0.3) == [(1, 0, 2)]


def test_max_span_band():
    sp, ep = _probs(100, [(2, 0, 90)])
    assert decode_global_pointer(sp, ep, max_span=64) == []
    assert decode_global_pointer(sp, ep, max_span=99) == [(2, 0, 90)]


def test_overlapping_category_independence():
    # different categories may overlap (GP scores each category's matrix
    # independently)
    sp, ep = _probs(10, [(1, 1, 5), (2, 3, 7)])
    got = set(decode_global_pointer(sp, ep))
    assert got == {(1, 1, 5), (2, 3, 7)}


def test_differential_vs_span_decode_on_corpus(docs50):
    """On well-formed pointer outputs the GP matrix decode and D1's greedy
    pairing must select identical mentions — doc-level, through the whole
    segment/unshift/dedup path."""
    cfg = PipelineConfig()
    for d in docs50:
        a = extract_doc_mentions(d.content, cfg.seg_len, cfg.seg_stride, 0.0, decoder="span")
        b = extract_doc_mentions(
            d.content, cfg.seg_len, cfg.seg_stride, 0.0, decoder="globalpointer"
        )
        assert a == b


def test_spark_stage_accepts_globalpointer(spark, corpus50):
    from theta_spark.pipeline import extract_mentions_df

    m_gp = extract_mentions_df(corpus50, PipelineConfig(decoder="globalpointer"))
    m_sp = extract_mentions_df(corpus50, PipelineConfig(decoder="span"))
    assert sorted(map(tuple, m_gp.collect())) == sorted(map(tuple, m_sp.collect()))
