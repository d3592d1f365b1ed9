"""Tokenizer + deterministic scorer + span decode.

This is the engine's "model" stage, shaped exactly like the reference's
inference path so a real transformer can be dropped in behind the same
interface:

    probs = scorer(seg_texts)           # (B, T, num_labels) start/end probs
    ents  = decode_ents(start, end, lens, confidence)   # token spans
    spans = token spans -> char spans   # via offset maps

Reference citations:
- offset maps contract: theta/nlp/tasks/task_ner.py:42-65 and
  theta/nlp/tokenizers/huggingface_tokenizer.py:73-98;
- decode semantics (argmax, confidence zeroing, nearest-end pairing with
  early break on an intervening start, `last_j` overlap guard):
  theta/nlp/tasks/task_ner.py:594-654 (`decode_ents`);
- token->char remap: task_ner.py:1368-1372. The reference computes
  char_end = token2char[e+1]-1, which equals the true inclusive end only for
  gap-free tokenizations (its char-level Chinese tokenizer); we store exact
  per-token (start, end) so mentions never absorb trailing gap characters.

The scorer here is the deterministic stand-in (SURVEY.md §7.0): per-token
start/end probabilities derived from code-structure rules, with a stable
pseudo-random confidence in [0.55, 0.95] so the confidence-threshold path
(task_ner.py:617-627) is exercised. A real model implements the same
`seg_texts -> (start_probs, end_probs, offsets)` contract.
"""

from __future__ import annotations

import hashlib
import re
from functools import lru_cache

import numpy as np

from theta_spark.config import LABEL2ID

TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
KEYWORDS = {"def", "class", "import", "return", "self", "module"}

NUM_LABELS = len(LABEL2ID) + 1  # + category 0 = no entity


def tokenize_with_offsets(text: str):
    """-> (tokens, starts, ends) with ends exclusive; identifier tokens only."""
    tokens, starts, ends = [], [], []
    for m in TOKEN_RE.finditer(text):
        tokens.append(m.group(0))
        starts.append(m.start())
        ends.append(m.end())
    return tokens, starts, ends


@lru_cache(maxsize=1 << 20)
def _stable_prob(token: str) -> float:
    # memoized: tokens repeat heavily across segments (identifier vocab is
    # Zipfian in any code corpus), and the md5 per call was profiled at
    # ~30% of the rule scorer's per-token cost. Per-process cache, bounded.
    h = int.from_bytes(hashlib.md5(token.encode()).digest()[:4], "big")
    return 0.55 + 0.40 * (h / 0xFFFFFFFF)


def rule_labels(text: str, visible_start: bool = True):
    """Deterministic 'model': per-token (start_label, end_label, prob).

    Sliding-window robustness (`visible_start` = False when this text is a
    segment that begins mid-document): a token or dotted chain that runs into
    the segment's right edge may be cut mid-identifier and is never labeled —
    the 50% overlap guarantees the full mention appears interior to the
    neighboring segment (stride >= max mention length). A `variable` label
    requires a visible line start for the same reason.

    Rules over the code corpus (single source of truth for engine,
    reference-transcription harness, and unit tests):
      - token after `def `      -> function
      - token after `class `    -> class
      - dotted chain after `import ` -> library (start at first, end at last)
      - dotted chain after `\"\"\"module ` -> module
      - dotted chain whose last token is followed by `(` AND an `=` appears
        earlier on the same line -> call. (The `=` requirement makes the rule
        robust to sliding-window cuts: a `def name(` header whose `def ` was
        cut off by a segment boundary must not be mislabeled as a call; the
        full mention is recovered from the overlapping segment.)
      - line-leading token followed by ` = ` -> variable
    """
    tokens, starts, ends = tokenize_with_offsets(text)
    n = len(tokens)
    start_lab = np.zeros(n, dtype=np.int64)
    end_lab = np.zeros(n, dtype=np.int64)
    probs = np.array([_stable_prob(t) for t in tokens]) if n else np.zeros(0)

    def chain_end(k: int):
        """(last token index, complete) of the dotted chain starting at k.
        Incomplete = the chain runs into the text edge (possibly cut)."""
        j = k
        while j + 1 < n and ends[j] < len(text) and text[ends[j]] == "." and starts[j + 1] == ends[j] + 1:
            j += 1
        complete = ends[j] < len(text) and text[ends[j]] != "."
        return j, complete

    for k, tok in enumerate(tokens):
        if tok in KEYWORDS:
            continue
        prev = tokens[k - 1] if k > 0 else ""
        prev_adjacent = k > 0 and starts[k] - ends[k - 1] <= 1
        in_chain = k > 0 and starts[k] == ends[k - 1] + 1 and text[ends[k - 1]] == "."
        if in_chain:
            continue  # chain members are labeled from their head
        tok_complete = ends[k] < len(text)  # token not cut by the right edge
        if prev == "def" and prev_adjacent:
            if tok_complete:
                start_lab[k] = end_lab[k] = LABEL2ID["function"]
            continue
        if prev == "class" and prev_adjacent:
            if tok_complete:
                start_lab[k] = end_lab[k] = LABEL2ID["class"]
            continue
        if prev == "import" and prev_adjacent:
            j, complete = chain_end(k)
            if complete:
                start_lab[k] = LABEL2ID["library"]
                end_lab[j] = LABEL2ID["library"]
            continue
        if prev == "module" and prev_adjacent and k > 0 and starts[k - 1] >= 1 and text[starts[k - 1] - 1] == '"':
            j, complete = chain_end(k)
            if complete:
                start_lab[k] = LABEL2ID["module"]
                end_lab[j] = LABEL2ID["module"]
            continue
        j, complete = chain_end(k)
        if complete and text[ends[j]] == "(":
            line_before = text[: starts[k]].rsplit("\n", 1)[-1]
            if "=" in line_before:
                start_lab[k] = LABEL2ID["call"]
                end_lab[j] = LABEL2ID["call"]
            continue
        if ends[k] + 3 <= len(text) and text[ends[k] : ends[k] + 3] == " = ":
            line_start_visible = visible_start or "\n" in text[: starts[k]]
            line_head = text[: starts[k]].rsplit("\n", 1)[-1]
            if line_start_visible and line_head.strip() == "":
                start_lab[k] = end_lab[k] = LABEL2ID["variable"]
    return tokens, starts, ends, start_lab, end_lab, probs


def labels_to_probs(start_lab, end_lab, probs):
    """One-hot-ish prob matrices: labeled positions get the token's stable
    prob at its category; everything else concentrates on category 0."""
    n = len(start_lab)
    sp = np.zeros((n, NUM_LABELS), dtype=np.float64)
    ep = np.zeros((n, NUM_LABELS), dtype=np.float64)
    sp[:, 0] = 0.9
    ep[:, 0] = 0.9
    idx = np.arange(n)
    mask_s = start_lab > 0
    sp[idx[mask_s], start_lab[mask_s]] = 1.0 + probs[mask_s]  # > bg mass
    mask_e = end_lab > 0
    ep[idx[mask_e], end_lab[mask_e]] = 1.0 + probs[mask_e]
    # normalize rows to simplex so thresholds behave like softmax output
    sp /= sp.sum(axis=1, keepdims=True)
    ep /= ep.sum(axis=1, keepdims=True)
    return sp, ep


def decode_ents(start_probs, end_probs, batch_lens, confidence: float = 0.0):
    """Faithful re-statement of the reference greedy decode
    (task_ner.py:594-654), including its quirks:

    - confidence zeroing happens on the *argmax* label using the prob at that
      label (task_ner.py:617-627);
    - for each surviving start i, scan ends j>=i for the first matching
      category; stop early if position i+j+1 holds a new start
      (task_ner.py:648-650);
    - `last_j` records the *relative* offset j (reference quirk at
      task_ner.py:643), and starts with i <= last_j are skipped.

    Returns per row: dict {category_id: [(s_tok, e_tok), ...]}.
    """
    start_preds = np.argmax(start_probs, -1)
    end_preds = np.argmax(end_probs, -1)

    if confidence > 0.0:
        rows = np.arange(start_preds.shape[0])[:, None]
        cols = np.arange(start_preds.shape[1])[None, :]
        s_conf = start_probs[rows, cols, start_preds]
        e_conf = end_probs[rows, cols, end_preds]
        start_preds = np.where(s_conf > confidence, start_preds, 0)
        end_preds = np.where(e_conf > confidence, end_preds, 0)

    final = []
    for start_pred, end_pred, text_len in zip(start_preds, end_preds, batch_lens):
        start_pred = start_pred[:text_len]
        end_pred = end_pred[:text_len]
        ents: dict[int, list[tuple[int, int]]] = {}
        last_j = -1
        for i, s_type in enumerate(start_pred):
            if s_type == 0:
                continue
            if i <= last_j:
                continue
            for j, e_type in enumerate(end_pred[i:]):
                if s_type == e_type:
                    last_j = j  # reference quirk: relative offset
                    ents.setdefault(int(s_type), []).append((i, i + j))
                    break
                if i + j < len(start_pred) - 1 and start_pred[i + j + 1] != 0:
                    break
        final.append(ents)
    return final


class RuleScorer:
    """The deterministic stand-in behind the scorer contract (see module
    docstring). `score_text` is the pluggable interface: MLPScorer
    (operators.neural) implements the same signature with a genuinely
    learned model, and both run through the identical mapInPandas stage."""

    def score_text(self, text: str, visible_start: bool = True):
        """-> (start_probs (T,K), end_probs (T,K), token_starts, token_ends)."""
        tokens, starts, ends, sl, el, pr = rule_labels(text, visible_start)
        if not tokens:
            z = np.zeros((0, NUM_LABELS))
            return z, z, starts, ends
        sp, ep = labels_to_probs(sl, el, pr)
        return sp, ep, starts, ends


RULE_SCORER = RuleScorer()


def offset_maps(text: str):
    """P5 (task_ner.py:42-65, huggingface_tokenizer.py:73-98): per-text
    char2token (len(text), -1 where uncovered) and token2char (start offset
    per token, plus one trailing end sentinel) arrays."""
    tokens, starts, ends = tokenize_with_offsets(text)
    char2token = np.full(len(text), -1, dtype=np.int64)
    for ti, (s, e) in enumerate(zip(starts, ends)):
        char2token[s:e] = ti
    token2char = np.array(starts + [ends[-1] if ends else 0], dtype=np.int64)
    return char2token, token2char


def decode_bioes(tags: list[str]):
    """D3 (theta/nlp/tasks/ner_decodes.py:11-66): walk a BIOES tag sequence;
    S-x singletons; B-x ... E-x spans with I-x continuation, type-consistent
    (a B- span is dropped if interrupted by a mismatching tag). Returns
    [(category, start_tok, end_tok)]."""
    out = []
    i, n = 0, len(tags)
    while i < n:
        tag = tags[i]
        if tag.startswith("S-"):
            out.append((tag[2:], i, i))
            i += 1
        elif tag.startswith("B-"):
            cat = tag[2:]
            j = i + 1
            while j < n and tags[j] == f"I-{cat}":
                j += 1
            if j < n and tags[j] == f"E-{cat}":
                out.append((cat, i, j))
                i = j + 1
            else:
                i += 1  # malformed span: skip the B- and rescan
        else:
            i += 1
    return out


def extract_mentions(text: str, confidence: float = 0.0, visible_start: bool = True,
                     scorer=None, decoder: str = "span", gp_max_span: int = 64):
    """Full per-segment extraction: tokenize -> score -> decode -> char spans.

    Returns list of (category_id, char_start, char_end_inclusive, mention,
    indent) where `indent` is the leading-whitespace width of the mention's
    line *as visible in this segment* (used downstream to classify top-level
    vs nested definitions; a segment cut inside the indent yields a smaller
    value, so the merge stage aggregates with max).

    `scorer` is anything implementing score_text (RuleScorer default;
    operators.neural.MLPScorer is the trained drop-in). `decoder` selects
    D1's span pairing ("span", default) or M3's constrained Viterbi over
    BIOES emissions ("crf", reference ner_models.py:94-183); both walks
    land on identical spans for well-formed outputs — differentially
    tested in tests/test_crf.py.

    Shared by the Spark mapInPandas stage and the differential harness, so
    any disagreement between the two isolates the *distributed plumbing*.
    """
    scorer = scorer or RULE_SCORER
    scored = scorer.score_text(text, visible_start)
    return _decode_scored(text, scored, confidence, decoder, gp_max_span)


def _decode_scored(text: str, scored, confidence: float, decoder: str, gp_max_span: int):
    """Decode one segment's scorer output (sp, ep, starts, ends) into the
    extract_mentions tuple list — the scorer-independent tail, shared by the
    per-text and batched entry points."""
    sp, ep, starts, ends = scored
    if len(starts) == 0:
        return []
    if decoder == "crf":
        spans = _crf_spans(sp, ep, confidence)
    elif decoder == "globalpointer":
        from theta_spark.operators.globalpointer import decode_global_pointer

        spans = decode_global_pointer(sp, ep, confidence, max_span=gp_max_span)
    else:
        decoded = decode_ents(sp[None, :, :], ep[None, :, :], [len(starts)], confidence)[0]
        spans = [(cat, s_tok, e_tok) for cat, ss in decoded.items() for (s_tok, e_tok) in ss]
    out = []
    for cat, s_tok, e_tok in spans:
        cs, ce = starts[s_tok], ends[e_tok] - 1
        line = text[:cs].rsplit("\n", 1)[-1]
        indent = len(line) - len(line.lstrip(" "))
        out.append((int(cat), cs, ce, text[cs : ce + 1], indent))
    out.sort(key=lambda x: (x[1], x[0]))
    return out


def score_texts(texts, visible_starts, scorer=None):
    """Batched scorer dispatch: [(sp, ep, starts, ends)] per text in order.

    A scorer exposing `score_texts` (the reference's DataLoader-batch shape,
    task_ner.py:86-101/622-664: the encoder runs once over the whole batch)
    gets ONE call for all texts — MLPScorer turns this into a single
    gather+matmul over the concatenated token matrix. Scorers without it
    (the rule stand-in: per-token string predicates, nothing to batch) fall
    back to per-text calls. Same outputs either way."""
    scorer = scorer or RULE_SCORER
    batched = getattr(scorer, "score_texts", None)
    if batched is not None:
        return batched(texts, visible_starts)
    return [scorer.score_text(t, v) for t, v in zip(texts, visible_starts)]


def extract_mentions_batch(texts, visible_starts, confidence: float = 0.0,
                           scorer=None, decoder: str = "span", gp_max_span: int = 64):
    """Batched extract_mentions: one scorer pass over all texts (model
    batching across the Arrow batch), then the per-segment decode. Returns
    one extract_mentions-shaped list per input text."""
    scored = score_texts(texts, visible_starts, scorer)
    return [
        _decode_scored(t, s, confidence, decoder, gp_max_span)
        for t, s in zip(texts, scored)
    ]


def _crf_spans(sp, ep, confidence: float):
    """M3 path: span-head probs -> BIOES emissions -> constrained Viterbi ->
    tag-walk spans (category ids). The span pairing (D1) is still used to
    place emissions; the CRF replaces the WALK with a structurally
    constrained max-sum decode, as the reference's CRFModel does with its
    token logits."""
    from theta_spark.config import ID2LABEL, LABEL2ID
    from theta_spark.operators.crf import (
        bioes_tagset,
        crf_decode_spans,
        spans_to_bioes_emissions,
    )

    decoded = decode_ents(sp[None, :, :], ep[None, :, :], [sp.shape[0]], confidence)[0]
    cat_spans = [
        (ID2LABEL[int(cat)], s_tok, e_tok)
        for cat, ss in decoded.items()
        for (s_tok, e_tok) in ss
    ]
    tags = bioes_tagset(list(LABEL2ID))
    em = spans_to_bioes_emissions(sp.shape[0], cat_spans, tags)
    return [(LABEL2ID[c], s, e) for c, s, e in crf_decode_spans(em, tags)]
