"""A real (trained) model behind the scorer contract (M1/M2/T1).

The engine's scoring stage is pluggable: anything implementing

    score_text(text, visible_start) -> (start_probs (T,K), end_probs (T,K),
                                        token_starts, token_ends)

can run inside the same mapInPandas stage (reference shape: BertSpanForNer,
theta/nlp/tasks/task_ner.py:348-445 — a shared encoder with two pointer
heads producing per-token start/end label distributions; batched tokenize
with offsets at task_ner.py:86-101). This module proves the claim with a
second, genuinely-learned implementation:

- `MLPScorer`: hashed sparse context features per token -> one shared
  hidden layer -> two softmax pointer heads (start, end) — the BertSpan
  architecture in miniature, numpy end-to-end (no torch in the sandbox).
- trained by SGD/Adam on segments of the deterministic synthetic corpus,
  with rule_labels as supervision; training is seeded and deterministic,
  so executors could equally re-derive identical weights — in production
  the driver trains/loads once and ships weights via closure broadcast,
  exactly how a fine-tuned checkpoint would ride along.

Scale notes: weights are ~8 MB float32, broadcast once per executor, and
inference is a handful of numpy matmuls per Arrow batch — the stage stays
narrow, shuffle-free, and beats per-row Python by the usual 10-100x.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

from theta_spark.operators.scoring import (
    KEYWORDS,
    NUM_LABELS,
    rule_labels,
    tokenize_with_offsets,
)

FEATURE_DIM = 1 << 15
HIDDEN = 64


@lru_cache(maxsize=1 << 20)
def _fh(s: str) -> int:
    """Stable feature hash (md5 -> [0, FEATURE_DIM)). Memoized per process:
    feature strings are drawn from a Zipfian vocabulary (token identities,
    boolean templates, short char windows), and the md5 per call was
    profiled at ~55% of the whole scoring stage — the cache removes ~90%
    of the calls at a bounded memory cost."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") % FEATURE_DIM


def featurize(text: str, visible_start: bool = True):
    """Per-token active feature ids (fixed template count F per token).

    Generic lexical/context templates (token identity via the hashing
    trick, neighbor tokens, char windows, line-prefix cues, dotted-chain
    shape from the tokenizer) — the rules of the deterministic scorer are
    a latent function of these; the model has to LEARN that mapping.
    Returns (ids (T, F) int array, token_starts, token_ends)."""
    tokens, starts, ends = tokenize_with_offsets(text)
    n = len(tokens)
    ids = np.empty((n, 17), dtype=np.int64)
    for k in range(n):
        tok, s, e = tokens[k], starts[k], ends[k]
        prev = tokens[k - 1] if k > 0 else "<BOS>"
        prev_adj = k > 0 and s - ends[k - 1] <= 1
        in_chain = k > 0 and s == ends[k - 1] + 1 and text[ends[k - 1]] == "."
        # dotted-chain walk (tokenizer-structural, like wordpiece grouping)
        j = k
        while j + 1 < n and ends[j] < len(text) and text[ends[j]] == "." and starts[j + 1] == ends[j] + 1:
            j += 1
        chain_complete = ends[j] < len(text) and text[ends[j]] != "."
        chain_post1 = text[ends[j]] if ends[j] < len(text) else "<EOT>"
        line_prefix = text[:s].rsplit("\n", 1)[-1]
        feats = [
            f"tok={tok}",
            f"kw={tok in KEYWORDS}",
            f"prev={prev}",
            f"prev_adj={prev_adj}",
            f"in_chain={in_chain}",
            f"gap={text[ends[k - 1]:s] if k > 0 else '<BOS>'}",
            f"pre3={text[max(s - 3, 0):s]}",
            f"post3={text[e:e + 3]}",
            f"pre1={text[s - 1] if s > 0 else '<BOT>'}",
            f"post1={text[e] if e < len(text) else '<EOT>'}",
            f"prev_pre1={text[starts[k - 1] - 1] if k > 0 and starts[k - 1] > 0 else '<BOT>'}",
            f"linehead_blank={line_prefix.strip() == ''}",
            f"line_has_eq={'=' in line_prefix}",
            f"line_start_visible={visible_start or chr(10) in text[:s]}",
            f"tok_complete={e < len(text)}",
            f"chain_complete={chain_complete}",
            f"chain_post1={chain_post1}",
        ]
        ids[k] = [_fh(f) for f in feats]
    return ids, starts, ends


def _softmax(z: np.ndarray) -> np.ndarray:
    z = z - z.max(axis=-1, keepdims=True)
    ez = np.exp(z)
    return ez / ez.sum(axis=-1, keepdims=True)


class MLPScorer:
    """Shared hidden layer + two pointer heads (start/end), numpy."""

    def __init__(self, W1, b1, Ws, bs, We, be):
        self.W1, self.b1 = W1, b1
        self.Ws, self.bs = Ws, bs
        self.We, self.be = We, be

    # widest token chunk one forward materializes: the W1 gather is
    # (chunk, F_templates, HIDDEN) floats, so 8192 tokens * 17 * 64 * 4B
    # ~= 36 MB transient per task — bounded regardless of Arrow batch size
    # (an unchunked batch of 10k docs would gather ~5 GB per task)
    FORWARD_CHUNK = 8192

    def _forward(self, ids: np.ndarray):
        h = np.maximum(self.W1[ids].sum(axis=1) + self.b1, 0.0)   # (T, H)
        return _softmax(h @ self.Ws + self.bs), _softmax(h @ self.We + self.be)

    def score_text(self, text: str, visible_start: bool = True):
        """The scorer contract (same as RuleScorer.score_text)."""
        ids, starts, ends = featurize(text, visible_start)
        if len(ids) == 0:
            z = np.zeros((0, NUM_LABELS))
            return z, z, starts, ends
        sp, ep = self._forward(ids)
        return sp, ep, starts, ends

    def score_texts(self, texts, visible_starts):
        """Batched contract (reference DataLoader-batch shape,
        task_ner.py:86-101/622-664): featurize every text, concatenate all
        tokens into one (sum_T, F) id matrix, run ONE chunked gather+matmul
        forward, split the prob tensors back per text. Identical outputs to
        per-text score_text (pure function of the same ids) — the batching
        amortizes numpy dispatch over the whole Arrow batch instead of
        paying it per 126-char segment."""
        feats = [featurize(t, v) for t, v in zip(texts, visible_starts)]
        lens = [len(f[0]) for f in feats]
        total = sum(lens)
        if total == 0:
            z = np.zeros((0, NUM_LABELS))
            return [(z, z, f[1], f[2]) for f in feats]
        ids = np.concatenate([f[0] for f in feats if len(f[0])])
        sp_parts, ep_parts = [], []
        for lo in range(0, total, self.FORWARD_CHUNK):
            sp_c, ep_c = self._forward(ids[lo : lo + self.FORWARD_CHUNK])
            sp_parts.append(sp_c)
            ep_parts.append(ep_c)
        sp_all = np.concatenate(sp_parts) if len(sp_parts) > 1 else sp_parts[0]
        ep_all = np.concatenate(ep_parts) if len(ep_parts) > 1 else ep_parts[0]
        out, off = [], 0
        z = np.zeros((0, NUM_LABELS))
        for (_, starts, ends), n in zip(feats, lens):
            if n == 0:
                out.append((z, z, starts, ends))
            else:
                out.append((sp_all[off : off + n], ep_all[off : off + n], starts, ends))
                off += n
        return out


def _training_segments(n_docs: int, seed: int):
    """Sliding-window segments of the synthetic corpus (the same unit the
    inference stage sees), each with its visible_start flag."""
    from theta_spark.corpus import doc_rng, generate_doc
    from theta_spark.reference_impl import segment_offsets

    segs = []
    for i in range(n_docs):
        d = generate_doc(doc_rng(seed, i), i)
        for s_seg, seg_text in segment_offsets(d.content, 126, 63):
            segs.append((seg_text, s_seg == 0))
    return segs


def train_mlp_scorer(
    n_docs: int = 120,
    seed: int = 7,
    epochs: int = 4,
    lr: float = 0.01,
    batch: int = 1024,
    hidden: int = HIDDEN,
    history: list | None = None,
) -> MLPScorer:
    """Deterministic training run: featurize corpus segments, supervise with
    rule_labels, Adam on CE of both heads. Seeded numpy only.

    When ``history`` is passed, per-batch mean CE rows
    ``(epoch, batch_idx, loss, batch_size)`` are appended to it — the
    exact per-batch "outputs" shape A8's epoch mean-of-means consumes
    (theta/nlp/tasks/task.py:1300-1305 averages these batch means
    unweighted; see operators/training.py)."""
    rng = np.random.default_rng(seed)
    segs = _training_segments(n_docs, seed=100 + seed)

    all_ids, all_sl, all_el = [], [], []
    for seg_text, vis in segs:
        _, _, _, sl, el, _ = rule_labels(seg_text, vis)
        ids, _, _ = featurize(seg_text, vis)
        if len(ids):
            all_ids.append(ids)
            all_sl.append(sl)
            all_el.append(el)
    X = np.concatenate(all_ids)          # (N, F)
    ys = np.concatenate(all_sl)
    ye = np.concatenate(all_el)
    N = len(X)

    W1 = (rng.standard_normal((FEATURE_DIM, hidden)) * 0.05).astype(np.float64)
    b1 = np.zeros(hidden)
    Ws = (rng.standard_normal((hidden, NUM_LABELS)) * 0.05).astype(np.float64)
    bs = np.zeros(NUM_LABELS)
    We = (rng.standard_normal((hidden, NUM_LABELS)) * 0.05).astype(np.float64)
    be = np.zeros(NUM_LABELS)

    params = [W1, b1, Ws, bs, We, be]
    m = [np.zeros_like(p) for p in params]
    v = [np.zeros_like(p) for p in params]
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    step = 0

    for epoch in range(epochs):
        order = rng.permutation(N)
        for bi, lo in enumerate(range(0, N, batch)):
            sel = order[lo:lo + batch]
            ids, ts, te = X[sel], ys[sel], ye[sel]
            B = len(sel)

            pre = W1[ids].sum(axis=1) + b1
            h = np.maximum(pre, 0.0)
            ps = _softmax(h @ Ws + bs)
            pe = _softmax(h @ We + be)

            if history is not None:
                ce = float(
                    -np.log(np.maximum(ps[np.arange(B), ts], 1e-12)).mean()
                    - np.log(np.maximum(pe[np.arange(B), te], 1e-12)).mean()
                )
                history.append((epoch, bi, ce, B))

            gs = ps.copy()
            gs[np.arange(B), ts] -= 1.0
            ge = pe.copy()
            ge[np.arange(B), te] -= 1.0
            gs /= B
            ge /= B

            gWs = h.T @ gs
            gbs = gs.sum(0)
            gWe = h.T @ ge
            gbe = ge.sum(0)
            gh = (gs @ Ws.T + ge @ We.T) * (pre > 0)
            gb1 = gh.sum(0)
            gW1 = np.zeros_like(W1)
            np.add.at(gW1, ids.ravel(), np.repeat(gh, ids.shape[1], axis=0))

            step += 1
            for p, g, mi, vi in zip(params, [gW1, gb1, gWs, gbs, gWe, gbe], m, v):
                mi *= beta1
                mi += (1 - beta1) * g
                vi *= beta2
                vi += (1 - beta2) * g * g
                mhat = mi / (1 - beta1 ** step)
                vhat = vi / (1 - beta2 ** step)
                p -= lr * mhat / (np.sqrt(vhat) + eps)

    # ship float32: halves the closure payload (the "checkpoint" the tasks
    # carry); training itself stays float64 for stability
    return MLPScorer(*(p.astype(np.float32) for p in params))


@lru_cache(maxsize=1)
def default_mlp_scorer() -> MLPScorer:
    """Driver-side singleton (train once, ship weights via closure)."""
    return train_mlp_scorer()


def token_label_agreement(scorer: MLPScorer, n_docs: int = 40, seed: int = 900):
    """Held-out token-level accuracy of the model vs rule_labels (both
    heads). Returns (start_acc, end_acc)."""
    segs = _training_segments(n_docs, seed)
    ok_s = ok_e = tot = 0
    for seg_text, vis in segs:
        _, _, _, sl, el, _ = rule_labels(seg_text, vis)
        sp, ep, _, _ = scorer.score_text(seg_text, vis)
        if len(sl) == 0:
            continue
        ok_s += int((sp.argmax(-1) == sl).sum())
        ok_e += int((ep.argmax(-1) == el).sum())
        tot += len(sl)
    return ok_s / tot, ok_e / tot


class ConditionalLayerNorm:
    """M5's encoder conditioning (reference theta/modules/modules.py:95-136,
    used by the MRC span head at ner_models.py:325-331): layer norm whose
    gain/bias are affine in a condition vector —
        weight = cond @ Wg + 1,  bias = cond @ Wb + 0,
        out = (x - mean) / sqrt(var + eps) * weight + bias.
    The reference zero-inits the two dense maps so conditioning is inert
    at step 0 (modules.py:109-117 reset_weight_and_bias) — `inert()`
    reproduces that state; numpy throughout."""

    def __init__(self, Wg: np.ndarray, Wb: np.ndarray, eps: float = 1e-12):
        self.Wg, self.Wb, self.eps = Wg, Wb, eps

    @classmethod
    def inert(cls, cond_dim: int, hidden: int = HIDDEN) -> "ConditionalLayerNorm":
        return cls(np.zeros((cond_dim, hidden)), np.zeros((cond_dim, hidden)))

    @classmethod
    def seeded(cls, cond_dim: int, hidden: int = HIDDEN, seed: int = 13, scale: float = 0.3) -> "ConditionalLayerNorm":
        rng = np.random.default_rng(seed)
        return cls(
            (rng.standard_normal((cond_dim, hidden)) * scale),
            (rng.standard_normal((cond_dim, hidden)) * scale),
        )

    def __call__(self, x: np.ndarray, cond: np.ndarray) -> np.ndarray:
        weight = cond @ self.Wg + 1.0
        bias = cond @ self.Wb
        mean = x.mean(axis=-1, keepdims=True)
        out = x - mean
        std = np.sqrt((out**2).mean(axis=-1, keepdims=True) + self.eps)
        return out / std * weight + bias


def cond_embedding(key: str, dim: int = 16) -> np.ndarray:
    """Deterministic condition embedding for a predicate name (the
    reference embeds the query/predicate tokens through the encoder; the
    sandbox stand-in hashes the name into a fixed vector)."""
    h = hashlib.md5(f"cond#{key}".encode()).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32) * 2.0 - 1.0


class CondMLPScorer:
    """M5 conditioned encoder: MLPScorer hidden states pass through
    ConditionalLayerNorm keyed by the predicate BEFORE the pointer heads
    (ner_models.py:306-443 MRC span model shape) — the predicate changes
    the ENCODER's representation, not just which decoded spans survive."""

    def __init__(self, base: MLPScorer, cln: ConditionalLayerNorm, cond_dim: int = 16):
        self.base, self.cln, self.cond_dim = base, cln, cond_dim

    def score_text_cond(self, text: str, cond_key: str, visible_start: bool = True):
        ids, starts, ends = featurize(text, visible_start)
        if len(ids) == 0:
            z = np.zeros((0, NUM_LABELS))
            return z, z, starts, ends
        b = self.base
        h = np.maximum(b.W1[ids].sum(axis=1) + b.b1, 0.0)
        h = self.cln(h, cond_embedding(cond_key, self.cond_dim))
        return _softmax(h @ b.Ws + b.bs), _softmax(h @ b.We + b.be), starts, ends
