"""CRF decode (M3): numpy Viterbi over emission + transition matrices.

Reference: theta/nlp/tasks/ner_models.py:94-183 (CRFModel — BERT emissions
-> torchcrf CRF layer), decode at :178-181 (crf_module.decode = Viterbi);
the EnsembleCRFModel shares one CRF module over averaged logits
(:446-516). The tag scheme is BIOES (ner_decodes.py:11-66).

This module is the decode side only, re-expressed in numpy so it runs
inside the engine's Arrow-batched scoring stage (no torch): max-sum
Viterbi with start/end potentials and a transition matrix, plus the
BIOES structural-constraint transition builder the reference gets
implicitly from training.

Spark-first shape: Viterbi is an intra-segment sequential DP — it
belongs INSIDE the per-segment batch stage (mapInPandas), never as a
cross-row Spark operation; segments are independent rows, so the stage
stays embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np

NEG_INF = -1e12


def viterbi_decode(emissions: np.ndarray, transitions: np.ndarray,
                   start_potentials: np.ndarray | None = None,
                   end_potentials: np.ndarray | None = None):
    """Max-sum Viterbi: best tag path for one sequence.

    emissions: (T, K) per-token tag scores (log-space);
    transitions: (K, K) score of tag i -> tag j;
    start/end_potentials: (K,) boundary scores (default 0).
    Returns (path list[int] of length T, score float).
    """
    T, K = emissions.shape
    if T == 0:
        return [], 0.0
    start = np.zeros(K) if start_potentials is None else start_potentials
    end = np.zeros(K) if end_potentials is None else end_potentials

    score = start + emissions[0]            # (K,)
    backptr = np.empty((T, K), dtype=np.int64)
    for t in range(1, T):
        # broadcast: prev score (K,1) + transitions (K,K) -> best prev per cur
        total = score[:, None] + transitions            # (K_prev, K_cur)
        backptr[t] = np.argmax(total, axis=0)
        score = total[backptr[t], np.arange(K)] + emissions[t]
    score = score + end
    last = int(np.argmax(score))
    best = float(score[last])
    path = [last]
    for t in range(T - 1, 0, -1):
        last = int(backptr[t, last])
        path.append(last)
    path.reverse()
    return path, best


def bioes_tagset(categories: list[str]) -> list[str]:
    """Tag vocabulary: O + {B,I,E,S}-cat per category. Index 0 = O."""
    tags = ["O"]
    for c in categories:
        tags += [f"B-{c}", f"I-{c}", f"E-{c}", f"S-{c}"]
    return tags


def bioes_transitions(tags: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Structural-constraint (0 / -inf) transition matrix for a BIOES tag
    list, plus start/end potentials. Legal moves:
      O/E-x/S-x -> O, B-y, S-y        (span boundary)
      B-x/I-x   -> I-x, E-x           (inside a span, same category)
    Start must not begin inside a span (I-/E- illegal at start); end must
    not leave a span open (B-/I- illegal at end). The trained reference CRF
    learns exactly these hard zeros (torchcrf constrains via learned
    transitions going to -inf)."""
    K = len(tags)
    trans = np.full((K, K), NEG_INF)
    start = np.zeros(K)
    end = np.zeros(K)

    def kind(tag):
        return ("O", None) if tag == "O" else (tag[0], tag[2:])

    for i, ti in enumerate(tags):
        ki, ci = kind(ti)
        for j, tj in enumerate(tags):
            kj, cj = kind(tj)
            if ki in ("O", "E", "S"):
                ok = kj in ("O", "B", "S")
            else:  # B-x or I-x: must continue the same span
                ok = kj in ("I", "E") and cj == ci
            if ok:
                trans[i, j] = 0.0
        if ki in ("I", "E"):
            start[i] = NEG_INF
        if ki in ("B", "I"):
            end[i] = NEG_INF
    return trans, start, end


def spans_to_bioes_emissions(n_tokens: int, spans: list[tuple[str, int, int]],
                             tags: list[str], hit: float = 2.0, miss: float = 0.0) -> np.ndarray:
    """Emission matrix from (category, start_tok, end_tok) spans: the tag a
    position holds under the spans scores `hit`, everything else `miss`
    (log-space). This is the deterministic stand-in for a trained CRFModel's
    token logits — a real head drops its (T, K) logits in directly."""
    idx = {t: i for i, t in enumerate(tags)}
    em = np.full((n_tokens, len(tags)), miss)
    gold = ["O"] * n_tokens
    for cat, s, e in spans:
        if s == e:
            gold[s] = f"S-{cat}"
        else:
            gold[s] = f"B-{cat}"
            for k in range(s + 1, e):
                gold[k] = f"I-{cat}"
            gold[e] = f"E-{cat}"
    for k, g in enumerate(gold):
        em[k, idx[g]] = hit
    return em


def crf_decode_spans(emissions: np.ndarray, tags: list[str]):
    """Viterbi under BIOES constraints, then tag-walk the best path into
    (category, start_tok, end_tok) spans (shared walk = decode_bioes, D3)."""
    from theta_spark.operators.scoring import decode_bioes

    trans, start, end = bioes_transitions(tags)
    path, _ = viterbi_decode(emissions, trans, start, end)
    return decode_bioes([tags[i] for i in path])


def brute_force_decode(emissions: np.ndarray, transitions: np.ndarray,
                       start_potentials: np.ndarray | None = None,
                       end_potentials: np.ndarray | None = None):
    """Exhaustive max over all K^T paths (tests only)."""
    import itertools

    T, K = emissions.shape
    start = np.zeros(K) if start_potentials is None else start_potentials
    end = np.zeros(K) if end_potentials is None else end_potentials
    best_path, best_score = None, -np.inf
    for path in itertools.product(range(K), repeat=T):
        s = start[path[0]] + emissions[0, path[0]]
        for t in range(1, T):
            s += transitions[path[t - 1], path[t]] + emissions[t, path[t]]
        s += end[path[-1]]
        if s > best_score:
            best_score, best_path = s, list(path)
    return best_path, float(best_score)
