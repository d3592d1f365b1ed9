"""T1/T2 HF-tokenizer bridge: adapter tested against a fake exposing the
exact HF fast-tokenizer call signature (transformers itself is not in the
sandbox; the fake reproduces its documented output shape —
batch_encode_plus with return_offsets_mapping, task_ner.py:86-101)."""

import pytest

from theta_spark.operators.hf_bridge import HFTokenizerAdapter, load_hf_tokenizer


class FakeHFTokenizer:
    """Whitespace 'wordpiece': emits [CLS]/[SEP] as (0,0) offsets like a
    real HF fast tokenizer, honors truncation/max_length."""

    def __call__(self, texts, return_offsets_mapping=True, add_special_tokens=True,
                 truncation=True, max_length=512):
        assert return_offsets_mapping
        all_offsets = []
        for t in texts:
            offs = [(0, 0)] if add_special_tokens else []
            pos = 0
            for w in t.split(" "):
                if w:
                    offs.append((pos, pos + len(w)))
                pos += len(w) + 1
            if add_special_tokens:
                offs.append((0, 0))
            if truncation:
                offs = offs[:max_length]
            all_offsets.append(offs)
        return {"offset_mapping": all_offsets}


def test_adapter_maps_hf_offsets_to_engine_contract():
    ad = HFTokenizerAdapter(FakeHFTokenizer())
    tokens, starts, ends = ad.tokenize_with_offsets("def foo  bar")
    assert tokens == ["def", "foo", "bar"]
    assert starts == [0, 4, 9]
    assert ends == [3, 7, 12]  # exclusive, like scoring.tokenize_with_offsets
    # slice identity — the property every downstream decode relies on
    text = "def foo  bar"
    for tok, s, e in zip(tokens, starts, ends):
        assert text[s:e] == tok


def test_adapter_drops_special_tokens_and_batches():
    ad = HFTokenizerAdapter(FakeHFTokenizer(), max_length=4)
    outs = ad.tokenize_batch(["a b c d e f", "x"])
    # max_length=4 with [CLS] -> 3 real tokens survive truncation
    assert outs[0][0] == ["a", "b", "c"]
    assert outs[1][0] == ["x"]
    # no (0,0) specials leak through
    for tokens, starts, ends in outs:
        assert all(e > s for s, e in zip(starts, ends))


def test_load_hf_tokenizer_raises_clear_error_without_transformers():
    with pytest.raises(ImportError, match="transformers is not installed"):
        load_hf_tokenizer("bert-base-cased")


# =====================================================================
# Golden WordPiece fixture (T1/W5). `transformers` cannot run in this
# image, so the fixture is a spec-faithful implementation of the PUBLIC
# WordPiece algorithm (greedy longest-match-first with ## continuations,
# BERT basic pre-tokenization: whitespace split + punctuation isolation)
# producing the exact fast-tokenizer output shape — input_ids +
# offset_mapping, (0,0) specials/pads, truncation keeping max_length-2
# pieces — with expected outputs written down by hand below, NOT computed
# by the code under test.
# =====================================================================

_PUNCT = set(",.()=:;!?[]{}\"'`")

_VOCAB = {
    "[PAD]": 0, "[UNK]": 100, "[CLS]": 101, "[SEP]": 102,
    "def": 200, "foo": 201, "bar": 202, "play": 203, "##ing": 204,
    "##er": 205, "un": 206, "##believ": 207, "##able": 208, "self": 209,
    "value": 210, "##s": 211, "the": 212, "token": 213, "##ize": 214,
    "a": 215, "b": 216, "c": 217, "x": 218,
    "(": 300, ")": 301, "=": 302, ",": 303, ".": 304,
}


def _pre_tokenize(text):
    spans, i, n = [], 0, len(text)
    while i < n:
        ch = text[i]
        if ch.isspace():
            i += 1
            continue
        if ch in _PUNCT:
            spans.append((i, i + 1))
            i += 1
            continue
        j = i
        while j < n and not text[j].isspace() and text[j] not in _PUNCT:
            j += 1
        spans.append((i, j))
        i = j
    return spans


class MiniWordPiece:
    """Greedy longest-match-first WordPiece over _VOCAB with the HF fast
    call signature and output shape. `pad_to` emulates padding='max_length'
    ((0,0)-offset [PAD] rows, which the adapter must drop)."""

    def __init__(self, pad_to=None):
        self.pad_to = pad_to

    def _wordpiece(self, word):
        pieces, i = [], 0
        while i < len(word):
            j, cur = len(word), None
            while j > i:
                sub = ("##" if i > 0 else "") + word[i:j]
                if sub in _VOCAB:
                    cur = (sub, j)
                    break
                j -= 1
            if cur is None:
                return None  # whole word -> [UNK]
            pieces.append(cur[0])
            i = cur[1]
        return pieces

    def __call__(self, texts, return_offsets_mapping=True, add_special_tokens=True,
                 truncation=True, max_length=512):
        assert return_offsets_mapping
        ids_all, offs_all = [], []
        for t in texts:
            ids, offs = [], []
            for (ws, we) in _pre_tokenize(t):
                pieces = self._wordpiece(t[ws:we])
                if pieces is None:
                    ids.append(_VOCAB["[UNK]"])
                    offs.append((ws, we))
                    continue
                pos = ws
                for p in pieces:
                    plen = len(p) - 2 if p.startswith("##") else len(p)
                    ids.append(_VOCAB[p])
                    offs.append((pos, pos + plen))
                    pos += plen
            if truncation and add_special_tokens and len(ids) > max_length - 2:
                ids, offs = ids[: max_length - 2], offs[: max_length - 2]
            if add_special_tokens:
                ids = [_VOCAB["[CLS]"]] + ids + [_VOCAB["[SEP]"]]
                offs = [(0, 0)] + offs + [(0, 0)]
            if self.pad_to:
                while len(ids) < self.pad_to:
                    ids.append(_VOCAB["[PAD]"])
                    offs.append((0, 0))
            ids_all.append(ids)
            offs_all.append(offs)
        return {"input_ids": ids_all, "offset_mapping": offs_all}


# (text, expected tokens, expected starts, expected ends) — hand-derived
GOLDEN = [
    ("def foo bar", ["def", "foo", "bar"], [0, 4, 8], [3, 7, 11]),
    ("playing", ["play", "ing"], [0, 4], [4, 7]),                  # subword split
    ("player", ["play", "er"], [0, 4], [4, 6]),
    ("unbelievable", ["un", "believ", "able"], [0, 2, 8], [2, 8, 12]),
    ("zzz", ["zzz"], [0], [3]),                                     # [UNK] keeps word span
    ("foo(bar)", ["foo", "(", "bar", ")"], [0, 3, 4, 7], [3, 4, 7, 8]),
    ("value = tokens", ["value", "=", "token", "s"], [0, 6, 8, 13], [5, 7, 13, 14]),
    ("  def   foo ", ["def", "foo"], [2, 8], [5, 11]),              # multi-space
    ("", [], [], []),
    ("the the", ["the", "the"], [0, 4], [3, 7]),
    ("a,b", ["a", ",", "b"], [0, 1, 2], [1, 2, 3]),
    ("selfs", ["self", "s"], [0, 4], [4, 5]),
    ("xx", ["xx"], [0], [2]),                                       # no ##x continuation -> UNK
    ("def playing.", ["def", "play", "ing", "."], [0, 4, 8, 11], [3, 8, 11, 12]),
    ("tokenize", ["token", "ize"], [0, 5], [5, 8]),
    ("a b c x a b c x", ["a", "b", "c", "x"] * 2,
     [0, 2, 4, 6, 8, 10, 12, 14], [1, 3, 5, 7, 9, 11, 13, 15]),
    ("(foo)", ["(", "foo", ")"], [0, 1, 4], [1, 4, 5]),
    ("believ", ["believ"], [0], [6]),                               # ##-only piece at word start -> UNK
    ("uns", ["un", "s"], [0, 2], [2, 3]),
    ("value=value", ["value", "=", "value"], [0, 5, 6], [5, 6, 11]),
]


def test_wordpiece_golden_fixture_batch():
    """One batched adapter call over all 20 strings: every engine-contract
    output matches the hand-written expectation, and the slice identity
    text[s:e] == token holds everywhere (what every downstream decode
    relies on)."""
    ad = HFTokenizerAdapter(MiniWordPiece())
    outs = ad.tokenize_batch([g[0] for g in GOLDEN])
    for (text, exp_toks, exp_s, exp_e), (toks, ss, es) in zip(GOLDEN, outs):
        assert toks == exp_toks, (text, toks)
        assert ss == exp_s and es == exp_e, (text, ss, es)
        for tok, s, e in zip(toks, ss, es):
            assert text[s:e] == tok


def test_wordpiece_truncation_w5():
    """W5 truncation: max_length counts specials, so max_length=5 keeps 3
    pieces ([CLS] p1 p2 p3 [SEP]); subword pieces count individually
    ('playing' is 2 pieces)."""
    ad = HFTokenizerAdapter(MiniWordPiece(), max_length=5)
    toks, ss, es = ad.tokenize_with_offsets("a b c x a")
    assert toks == ["a", "b", "c"]
    toks, ss, es = ad.tokenize_with_offsets("playing playing")
    assert toks == ["play", "ing", "play"]  # cut mid-word, like real HF
    assert (ss, es) == ([0, 4, 8], [4, 7, 12])


def test_wordpiece_padding_dropped_w5():
    """W5 padding: [PAD] rows surface as (0,0) offsets and never reach the
    engine contract."""
    ad = HFTokenizerAdapter(MiniWordPiece(pad_to=16))
    toks, ss, es = ad.tokenize_with_offsets("def foo")
    assert toks == ["def", "foo"]
    assert all(e > s for s, e in zip(ss, es))


def test_encode_batch_positions_gather():
    """encode_batch keeps the full model id sequence (specials included)
    and positions[] maps engine tokens back to model rows — the gather a
    BertSpan head's per-position probs need before the shared decode."""
    ad = HFTokenizerAdapter(MiniWordPiece(pad_to=8))
    (ids, toks, ss, es, positions), = ad.encode_batch(["def playing"])
    assert ids == [101, 200, 203, 204, 102, 0, 0, 0]  # CLS def play ##ing SEP PAD...
    assert toks == ["def", "play", "ing"]
    assert positions == [1, 2, 3]
    assert [ids[p] for p in positions] == [200, 203, 204]
