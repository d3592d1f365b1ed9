"""D1 decode fidelity (SURVEY.md §7.3 derisk item): the greedy pairing has
subtle rules — confidence zeroing on the argmax label, nearest-end pairing,
early break when a new start appears, and the `last_j` relative-offset
overlap guard (reference: theta/nlp/tasks/task_ner.py:594-654)."""

import numpy as np

from theta_spark.operators.scoring import (
    decode_ents,
    extract_mentions,
    labels_to_probs,
    rule_labels,
    tokenize_with_offsets,
)


def probs_from(start_lab, end_lab, n_labels=7, conf=0.99):
    n = len(start_lab)
    sp = np.zeros((1, n, n_labels))
    ep = np.zeros((1, n, n_labels))
    sp[0, :, 0] = 0.5
    ep[0, :, 0] = 0.5
    for i, l in enumerate(start_lab):
        if l:
            sp[0, i, :] = 0.0
            sp[0, i, l] = conf
    for i, l in enumerate(end_lab):
        if l:
            ep[0, i, :] = 0.0
            ep[0, i, l] = conf
    return sp, ep


def test_simple_span():
    sp, ep = probs_from([0, 2, 0, 0], [0, 0, 2, 0])
    out = decode_ents(sp, ep, [4])[0]
    assert out == {2: [(1, 2)]}


def test_single_token_span():
    sp, ep = probs_from([3, 0], [3, 0])
    out = decode_ents(sp, ep, [2])[0]
    assert out == {3: [(0, 0)]}


def test_category_must_match():
    # start labeled 2 but nearest end labeled 3 -> no pairing (and the scan
    # stops early because a new start appears right after)
    sp, ep = probs_from([0, 2, 0, 4], [0, 0, 3, 4])
    out = decode_ents(sp, ep, [4])[0]
    assert 2 not in out
    assert out.get(4) == [(3, 3)]


def test_early_break_on_new_start():
    # start at 0 (cat 2); end of cat 2 only at pos 3; but a new start at
    # pos 1 triggers the reference's early break (task_ner.py:648-650)
    sp, ep = probs_from([2, 5, 0, 0], [0, 0, 5, 2])
    out = decode_ents(sp, ep, [4])[0]
    assert 2 not in out
    assert out.get(5) == [(1, 2)]


def test_last_j_overlap_guard_relative_quirk():
    # reference stores last_j as the *relative* offset j (task_ner.py:643).
    # Because the scan breaks on any intervening start, an emitted span
    # (i, i+j) implies no start exists in (i, i+j], so a later start i' is
    # always >= i+j+1 > j and the "i' <= last_j" skip can never fire —
    # faithfully-mirrored dead code. Trace: i=0 (cat 2) breaks on the new
    # start at 1; i=1 (cat 3) breaks on the start at 2; i=2 pairs with the
    # cat-3 end at 3.
    sp, ep = probs_from([2, 3, 3, 0], [0, 0, 2, 3])
    out = decode_ents(sp, ep, [4])[0]
    assert out == {3: [(2, 3)]}


def test_confidence_zeroing():
    sp, ep = probs_from([0, 2, 0], [0, 2, 0], conf=0.6)
    assert decode_ents(sp, ep, [3], confidence=0.5)[0] == {2: [(1, 1)]}
    assert decode_ents(sp, ep, [3], confidence=0.7)[0] == {}


def test_batch_lens_truncation():
    sp, ep = probs_from([0, 0, 2], [0, 0, 2])
    assert decode_ents(sp, ep, [2])[0] == {}  # labeled pos beyond text_len


def test_tokenize_offsets_roundtrip():
    text = "def foo(a):\n    y = bar(a)\n"
    tokens, starts, ends = tokenize_with_offsets(text)
    for t, s, e in zip(tokens, starts, ends):
        assert text[s:e] == t


def test_rule_labels_code_sample():
    text = '"""module pkg.mod"""\nimport numpy\ndef foo(a):\n    y = bar(a)\n'
    ments = extract_mentions(text)
    got = {(cat, m) for cat, _, _, m, _ in ments}
    from theta_spark.config import LABEL2ID

    assert (LABEL2ID["module"], "pkg.mod") in got
    assert (LABEL2ID["library"], "numpy") in got
    assert (LABEL2ID["function"], "foo") in got
    assert (LABEL2ID["variable"], "y") in got
    assert (LABEL2ID["call"], "bar") in got


def test_mention_slice_identity_on_corpus(docs50):
    for d in docs50:
        for cat, cs, ce, mention, _ in extract_mentions(d.content):
            assert d.content[cs : ce + 1] == mention


def test_cut_identifier_never_labeled():
    # a segment ending mid-identifier must not emit the truncated token
    text = "def foo(a):\n    y = long_name"
    ments = extract_mentions(text, visible_start=True)
    assert all(m != "long_name" for _, _, _, m, _ in ments)


def test_labels_to_probs_rows_are_simplex():
    tokens, starts, ends, sl, el, pr = rule_labels("def foo(a):\n")
    sp, ep = labels_to_probs(sl, el, pr)
    assert np.allclose(sp.sum(axis=1), 1.0)
    assert np.allclose(ep.sum(axis=1), 1.0)
