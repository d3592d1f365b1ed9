"""Pure-Python "mini-theta": a literal transcription of the reference's
inference dataflow, used ONLY as the differential oracle for the Spark
engine (BASELINE.md: triple-set P/R >= 0.95 vs reference extractions).

Transcribed semantics (by construction, not by running the reference):
- sliding-window segmentation loop: theta/nlp/tasks/task_ner.py:183-233
  (seg_len = max_length-2, stride = seg_len//2, while offset < len(text))
- per-segment model scoring + decode: decode_ents, task_ner.py:594-654
  (shared numpy implementation in theta_spark.operators.scoring, so the
  differential isolates the *distributed plumbing*: segmentation fan-out,
  shuffle merge, dedup, window/join triple assembly)
- segment un-shift + per-guid concat: task_ner.py:1391-1401
- order-preserving dedup by stringified key: task_ner.py:1403-1415

Triple assembly mirrors the engine's structural predicate rules in plain
Python over the per-doc mention list.
"""

from __future__ import annotations

from theta_spark.config import ID2LABEL
from theta_spark.operators.scoring import extract_mentions_batch


def segment_offsets(text: str, seg_len: int, seg_stride: int):
    """task_ner.py:184-233 loop: yields (s_seg, seg_text)."""
    out = []
    seg_offset = 0
    while seg_offset < len(text):
        seg_text = text[seg_offset : seg_offset + seg_len]
        if len(seg_text) > 0:
            out.append((seg_offset, seg_text))
        seg_offset += seg_stride
    return out


def extract_doc_mentions(text: str, seg_len: int = 126, seg_stride: int = 63, confidence: float = 0.0,
                         scorer=None, decoder: str = "span", gp_max_span: int = 64):
    """Segment -> score+decode per segment -> un-shift -> order-preserving
    dedup (task_ner.py:1391-1415). Returns list of dicts with doc-global
    char offsets, first-occurrence order preserved. `scorer`/`decoder`
    select the model implementation (RuleScorer/MLPScorer) and the decode
    walk (span pairing / constrained Viterbi) — see operators.scoring."""
    segs = segment_offsets(text, seg_len, seg_stride)
    per_seg = extract_mentions_batch(
        [s for _, s in segs], [off == 0 for off, _ in segs],
        confidence, scorer=scorer, decoder=decoder, gp_max_span=gp_max_span,
    )
    return merge_segment_mentions(segs, per_seg)


def merge_segment_mentions(segments, per_seg_mentions):
    """Un-shift + order-preserving dedup of per-segment mention lists
    (task_ner.py:1391-1415): `segments` is [(s_seg, seg_text)],
    `per_seg_mentions` the matching extract_mentions outputs. Shared by the
    per-doc oracle path and the Spark fused stage (which scores ALL
    segments of an Arrow batch in one model call and then merges per doc)."""
    seen = set()
    out = []
    for (s_seg, _), mentions in zip(segments, per_seg_mentions):
        for cat, cs, ce, mention, indent in mentions:
            key = (cat, cs + s_seg, ce + s_seg)  # str(ent) key, task_ner.py:1410
            if key in seen:
                # overlap duplicate — but keep max indent (cut-into-indent case)
                for row in out:
                    if (row["category_id"], row["start"], row["end"]) == key:
                        row["indent"] = max(row["indent"], indent)
                continue
            seen.add(key)
            out.append(
                {
                    "category_id": cat,
                    "category": ID2LABEL[cat],
                    "start": cs + s_seg,
                    "end": ce + s_seg,
                    "mention": mention,
                    "indent": indent,
                }
            )
    return out


def _norm(name: str) -> str:
    return name.split(".")[-1].lower()


def assemble_doc_triples(mentions: list[dict], doc_id: str):
    """Same structural predicate rules as the engine's relational assembly
    (theta_spark.operators.triples), in plain Python."""
    ms = sorted(mentions, key=lambda m: m["start"])
    module = next((_norm(m["mention"]) for m in ms if m["category"] == "module"), None)
    classes = {_norm(m["mention"]) for m in ms if m["category"] == "class"}
    triples = set()
    prev_class = None
    prev_def = None
    # call-start lookup restricted to CALL mentions: a non-call mention
    # sharing a start must not shadow the constructor call (keeps the fused
    # path and the relational assembly's per-doc call-list probe equivalent
    # on inputs with overlapping mentions, not just the synthetic corpus)
    calls_by_start = {m["start"]: m for m in ms if m["category"] == "call"}
    for m in ms:
        cat = m["category"]
        n = _norm(m["mention"])
        if cat in ("function", "class") and m["indent"] == 0 and module:
            triples.add((module, "defines", n, doc_id))
        if cat == "function" and m["indent"] > 0 and prev_class:
            triples.add((prev_class, "contains", n, doc_id))
        if cat == "library" and module:
            triples.add((module, "imports", n, doc_id))
        if cat == "call" and prev_def:
            triples.add((prev_def, "calls", n, doc_id))
        if cat == "variable":
            c = calls_by_start.get(m["end"] + 4)
            if c is not None and _norm(c["mention"]) in classes:
                triples.add((m["mention"].lower(), "instance_of", _norm(c["mention"]), doc_id))
        # update as-of state AFTER emitting (windows use rowsBetween(..., -1))
        if cat == "class":
            prev_class = n
        if cat == "function":
            prev_def = n
    return triples


def reference_triples(docs, seg_len: int = 126, seg_stride: int = 63, confidence: float = 0.0):
    """docs: iterable of objects with .doc_id and .content -> set of
    (subj, pred, obj, doc_id)."""
    out = set()
    for d in docs:
        mentions = extract_doc_mentions(d.content, seg_len, seg_stride, confidence)
        out |= assemble_doc_triples(mentions, d.doc_id)
    return out


def prf(pred: set, gold: set):
    """A3 (task_ner.py:35-39): exact-match P/R/F1 between two sets."""
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(gold) if gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1
