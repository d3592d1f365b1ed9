"""GlobalPointer-style span-matrix decode (M-family head variant).

The north star names "GlobalPointer-style entity tagging"; the reference
snapshot contains NO GlobalPointer implementation (SURVEY.md: grep over
/root/reference -> 0 hits — its pointer family is the BertSpan per-token
start/end heads). This module supplies the literal span-MATRIX reading of
that phrase as a third decode behind the same scorer contract: score every
(start_tok, end_tok) candidate pair jointly — S[c, i, j] = min(start_p[i,c],
end_p[j,c]) for i <= j <= i+max_span (the upper-triangular band a
GlobalPointer head materializes; min() is the probability analog of the
additive pair logit) — threshold it, then non-overlap suppression per
category ordered by (start, length): the standard GP decode of
threshold + NMS over the span matrix (public formulation: Su Jianlin's
GlobalPointer, https://kexue.fm/archives/8373; no reference code exists
to transcribe).

On well-formed pointer outputs (each true start paired with its nearest
same-category end, spans non-overlapping — the invariant the corpus and
the rule/MLP scorers satisfy) this decode selects exactly D1's spans: the
shortest-first greedy keeps (s, nearest e) and the occupancy mask kills
every cross pair — differentially tested against the span decode in
tests/test_globalpointer.py.

Runs inside the same fused Arrow stage (decoder="globalpointer"); the
matrix is banded (max_span) so per-segment work is O(n * max_span), not
O(n^2), keeping the stage safe for long segments at scale.
"""

from __future__ import annotations

import numpy as np


def decode_global_pointer(
    sp: np.ndarray, ep: np.ndarray, confidence: float = 0.0, max_span: int = 64
):
    """(n_tokens, C) start/end prob matrices -> [(category, s_tok, e_tok)].

    Column 0 is the "O" (no-entity) label, as in the pointer heads: a
    token is a start/end candidate for category c = argmax of its row
    (confidence-zeroed exactly like decode_ents). Candidate (i, j)
    survives when both tokens point at c and j - i <= max_span; survivors
    are chosen greedily by (start, length) under a per-category
    token-occupancy mask (non-overlap suppression)."""
    n, n_cat = sp.shape
    start_lab = sp.argmax(-1)
    end_lab = ep.argmax(-1)
    if confidence > 0.0:
        rows = np.arange(n)
        start_lab = np.where(sp[rows, start_lab] > confidence, start_lab, 0)
        end_lab = np.where(ep[rows, end_lab] > confidence, end_lab, 0)
    out = []
    for c in range(1, n_cat):
        starts = np.nonzero(start_lab == c)[0]
        if starts.size == 0:
            continue
        ends = np.nonzero(end_lab == c)[0]
        if ends.size == 0:
            continue
        occupied = np.zeros(n, dtype=bool)
        for i in starts:
            js = ends[(ends >= i) & (ends - i <= max_span)]
            for j in js:  # ascending j = shortest-first for this start
                if not occupied[i : j + 1].any():
                    out.append((int(c), int(i), int(j)))
                    occupied[i : j + 1] = True
                    break  # one span per start (pointer semantics)
    return out
