"""Hypothesis property tests over the pure (non-Spark) kernels — the
pieces whose correctness everything distributed leans on. No Spark
session: these run in milliseconds and explore input space the
example-based tests can't enumerate.

- `_simhash64_batch` (functions/dedup.py): the vectorized interior must
  equal the definitional per-token-occurrence walk for ARBITRARY unicode
  text, not just the corpus alphabet (BENCH.md §P pinned the speedup;
  this pins the semantics over the whole input space).
- the 4x16-bit banding pigeonhole (simhash_near_dups's blocking rule):
  hamming(a,b) <= 3 ⇒ a and b share at least one aligned 16-bit chunk —
  the no-false-negative guarantee of the candidate join.
- `segment_offsets` (reference_impl.py, task_ner.py:184-233): total
  char coverage, in-bounds slices, stride arithmetic — the contract the
  Spark W1 operator and every oracle SQL reconstruction assume.
- `prf` (reference_impl.py, task_ner.py:35-39): bounds, zero-guards,
  and P=R=1 ⇔ set equality — the acceptance metric itself.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from theta_spark.functions.dedup import _simhash64_batch
from theta_spark.reference_impl import prf, segment_offsets

# no pytest-level Spark fixtures here — keep the module session-free
pytestmark = []


def _simhash_definitional(text: str) -> int:
    """The definitional per-token walk (the pre-r5 interior, and the
    DuckDB oracle's semantics): md5 per token occurrence, +1/-1 per bit,
    sign of the sum."""
    acc = [0] * 64
    for tok in (text or "").lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    u = sum(1 << b for b in range(64) if acc[b] > 0)
    return u - (1 << 64) if u >= (1 << 63) else u


texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),  # any non-surrogate
        max_size=40,
    ),
    min_size=0,
    max_size=8,
)


@settings(max_examples=150, deadline=None)
@given(texts_strategy)
def test_simhash_batch_equals_definitional_walk(texts):
    got = _simhash64_batch(pd.Series(texts, dtype=object))
    want = [_simhash_definitional(t) for t in texts]
    assert list(got) == want


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
)
def test_simhash_banding_pigeonhole_no_false_negatives(a, flip_bits):
    """Flip <=3 bits of any 64-bit hash: the pair must share >=1 of the 4
    aligned 16-bit chunks (4 chunks, <=3 differing bits — one chunk is
    untouched). This is why the chunk equi-join cannot drop a true
    near-dup pair at max_hamming=3."""
    b = a
    for bit in flip_bits:
        b ^= 1 << bit
    chunks_a = [(a >> (16 * i)) & 0xFFFF for i in range(4)]
    chunks_b = [(b >> (16 * i)) & 0xFFFF for i in range(4)]
    assert any(ca == cb for ca, cb in zip(chunks_a, chunks_b))
    # and the verify predicate agrees with the flip count
    assert bin(a ^ b).count("1") == len(flip_bits)


@settings(max_examples=200, deadline=None)
@given(
    st.text(max_size=400),
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=1, max_value=200),
)
def test_segment_offsets_cover_text_in_bounds_on_stride(text, seg_len, seg_stride):
    segs = segment_offsets(text, seg_len, seg_stride)
    # every segment is the exact in-bounds slice at its offset, offsets on the stride grid
    for off, seg in segs:
        assert 0 <= off < len(text)
        assert off % seg_stride == 0
        assert seg == text[off : off + seg_len]
        assert 0 < len(seg) <= seg_len
    # coverage: when the stride doesn't outrun the window, every char
    # index appears in some segment; empty text yields no segments
    if len(text) == 0:
        assert segs == []
    elif seg_stride <= seg_len:
        covered = set()
        for off, seg in segs:
            covered.update(range(off, off + len(seg)))
        assert covered == set(range(len(text)))


@settings(max_examples=200, deadline=None)
@given(
    st.sets(st.integers(min_value=0, max_value=30)),
    st.sets(st.integers(min_value=0, max_value=30)),
)
def test_prf_bounds_zero_guards_and_equality_iff_perfect(pred, gold):
    p, r, f1 = prf(pred, gold)
    assert 0.0 <= p <= 1.0 and 0.0 <= r <= 1.0 and 0.0 <= f1 <= 1.0
    if not pred:
        assert p == 0.0  # the reference's zero-guard, not NaN
    if not gold:
        assert r == 0.0
    if pred and gold:
        assert ((p, r) == (1.0, 1.0)) == (pred == gold)
        # F1 is the harmonic mean: between min and max of (p, r)
        if p + r:
            assert min(p, r) - 1e-12 <= f1 <= max(p, r) + 1e-12
