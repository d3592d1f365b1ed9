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


# =====================================================================
# Golden byte-level BPE fixture (T1/W5, second tokenizer family). Code
# corpora are BPE-tokenized (GPT-2/RoBERTa/CodeLlama style), and BPE
# offsets behave differently from WordPiece in exactly the ways the
# adapter must survive:
#   - NO continuation prefix: 'hello' -> ['he','llo'], both plain text;
#   - the space is part of the FOLLOWING token (' foo' spans the space),
#     so engine token text legitimately starts with whitespace;
#   - merges apply by RANK priority, not left-to-right, so ' def' can
#     come out [' ','def'] even when (' ','d') is in the merge table;
#   - byte-level means a token boundary can fall INSIDE a multi-byte
#     char: HF resolves each fragment's offsets to the full char span,
#     so several tokens can carry the SAME (start,end) — the adapter
#     must emit them faithfully (downstream decode walks offsets, and
#     the adapter's token text is text[s:e] by construction, never the
#     model's piece string).
# The fixture is a spec-faithful implementation of the PUBLIC byte-level
# BPE algorithm (GPT-2 paper / openai/gpt-2 encoder.py; RoBERTa-style
# <s>/</s> specials with (0,0) offsets), with expected outputs hand-
# derived below, NOT computed by the code under test.
# =====================================================================

# merge table, rank-ordered (rank = index); token ids: single byte b -> b,
# merge rank r -> 300+r, specials 256/257/258
_BPE_MERGES = [
    (b"d", b"e"),        # 0 -> b"de"
    (b"de", b"f"),       # 1 -> b"def"       id 301
    (b" ", b"f"),        # 2 -> b" f"
    (b" f", b"o"),       # 3 -> b" fo"
    (b" fo", b"o"),      # 4 -> b" foo"      id 304
    (b"l", b"l"),        # 5 -> b"ll"
    (b"h", b"e"),        # 6 -> b"he"        id 306
    (b"ll", b"o"),       # 7 -> b"llo"       id 307
    (b"c", b"a"),        # 8 -> b"ca"
    (b"ca", b"f"),       # 9 -> b"caf"       id 309
    (b"\xc3", b"\xa9"),  # 10 -> "é" (U+00E9 as UTF-8)  id 310
]
_BPE_RANK = {pair: r for r, pair in enumerate(_BPE_MERGES)}
_BPE_ID = {a + b: 300 + r for r, (a, b) in enumerate(_BPE_MERGES)}
_BOS, _EOS, _BPAD = 256, 257, 258


class MiniByteBPE:
    """Byte-level BPE with the HF fast call signature and output shape.
    Pre-tokenization: GPT-2-style optional-leading-space word runs
    (`' ?\\S+'`) with stray whitespace as single-char pre-tokens. Offsets
    are char indices into the original string; a token whose bytes fall
    inside a multi-byte char gets that char's full span (the tokenizers-
    library byte->char resolution)."""

    def __init__(self, pad_to=None):
        self.pad_to = pad_to

    @staticmethod
    def _bpe(word):
        """word: list[bytes] single bytes -> merged list[bytes]. Lowest-
        rank adjacent pair merges first (first occurrence per step; re-
        scanning each step makes rank priority global, as in gpt-2)."""
        while len(word) > 1:
            best = None
            for i in range(len(word) - 1):
                r = _BPE_RANK.get((word[i], word[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                return word
            _, i = best
            word = word[:i] + [word[i] + word[i + 1]] + word[i + 2:]
        return word

    def __call__(self, texts, return_offsets_mapping=True, add_special_tokens=True,
                 truncation=True, max_length=512):
        import re

        assert return_offsets_mapping
        ids_all, offs_all = [], []
        for t in texts:
            ids, offs = [], []
            for m in re.finditer(r" ?\S+|\s", t):
                pt, c0 = m.group(), m.start()
                b2c = []  # byte index within pre-token -> char index in text
                for k, ch in enumerate(pt):
                    b2c.extend([c0 + k] * len(ch.encode("utf-8")))
                pieces = self._bpe([bytes([b]) for b in pt.encode("utf-8")])
                bpos = 0
                for p in pieces:
                    ids.append(_BPE_ID[p] if len(p) > 1 else p[0])
                    offs.append((b2c[bpos], b2c[bpos + len(p) - 1] + 1))
                    bpos += len(p)
            if truncation and add_special_tokens and len(ids) > max_length - 2:
                ids, offs = ids[: max_length - 2], offs[: max_length - 2]
            if add_special_tokens:  # RoBERTa-style <s>/</s>, (0,0) offsets
                ids = [_BOS] + ids + [_EOS]
                offs = [(0, 0)] + offs + [(0, 0)]
            if self.pad_to:
                while len(ids) < self.pad_to:
                    ids.append(_BPAD)
                    offs.append((0, 0))
            ids_all.append(ids)
            offs_all.append(offs)
        return {"input_ids": ids_all, "offset_mapping": offs_all}


# (text, expected tokens, expected starts, expected ends) — hand-derived
BPE_GOLDEN = [
    # space belongs to the FOLLOWING token (' foo' spans chars 3..7)
    ("def foo", ["def", " foo"], [0, 3], [3, 7]),
    # subword split WITHOUT a continuation prefix (vs WordPiece '##')
    ("hello", ["he", "llo"], [0, 2], [2, 5]),
    # rank priority: (d,e) fires before (' ',d) could, so ' def' comes
    # out [' ', 'def'] — merge order is global rank, not left-to-right
    ("def def", ["def", " ", "def"], [0, 3, 4], [3, 4, 7]),
    # 2-byte char WITH a merge: 'é' = c3 a9 merges to one full-char token
    ("café", ["caf", "é"], [0, 3], [3, 4]),
    # 2-byte char WITHOUT a merge: 'ù' = c3 b9 stays two byte fragments,
    # BOTH resolved to the full char span (3,4) — duplicate offsets are
    # legal BPE output and must pass through the adapter unchanged
    ("cafù", ["caf", "ù", "ù"], [0, 3, 3], [3, 4, 4]),
    # 4-byte emoji, no merges: four fragments all spanning char 2
    ("a \U0001F680", ["a", " ", "🚀", "🚀", "🚀", "🚀"],
     [0, 1, 2, 2, 2, 2], [1, 2, 3, 3, 3, 3]),
    # byte-level needs no punctuation pre-split: unmerged bytes surface
    # as single-char tokens
    ("(a)", ["(", "a", ")"], [0, 1, 2], [1, 2, 3]),
    ("", [], [], []),
]


def test_bpe_golden_fixture_batch():
    """One batched adapter call over the BPE goldens: engine-contract
    output matches the hand-written expectation and the slice identity
    text[s:e] == token holds everywhere (for byte-fragment tokens the
    token IS the full char the fragment sits in — by adapter
    construction, which is the correct engine-side view)."""
    ad = HFTokenizerAdapter(MiniByteBPE())
    outs = ad.tokenize_batch([g[0] for g in BPE_GOLDEN])
    for (text, exp_toks, exp_s, exp_e), (toks, ss, es) in zip(BPE_GOLDEN, outs):
        assert toks == exp_toks, (text, toks)
        assert ss == exp_s and es == exp_e, (text, ss, es)
        for tok, s, e in zip(toks, ss, es):
            assert text[s:e] == tok


def test_bpe_truncation_and_padding():
    """W5 on the BPE family: max_length counts <s>/</s>; pad rows are
    (0,0) and never reach the engine contract."""
    ad = HFTokenizerAdapter(MiniByteBPE(), max_length=3)
    toks, ss, es = ad.tokenize_with_offsets("def foo")
    assert (toks, ss, es) == (["def"], [0], [3])
    ad = HFTokenizerAdapter(MiniByteBPE(pad_to=12))
    toks, ss, es = ad.tokenize_with_offsets("hello")
    assert toks == ["he", "llo"]
    assert all(e > s for s, e in zip(ss, es))


def test_bpe_encode_batch_positions_gather():
    """encode_batch over BPE: untrimmed model ids (specials + pads kept)
    with positions[] selecting exactly the engine-contract rows."""
    ad = HFTokenizerAdapter(MiniByteBPE(pad_to=6))
    (ids, toks, ss, es, positions), = ad.encode_batch(["def foo"])
    assert ids == [_BOS, 301, 304, _EOS, _BPAD, _BPAD]
    assert toks == ["def", " foo"]
    assert positions == [1, 2]
    assert [ids[p] for p in positions] == [301, 304]


def test_bpe_fragment_offsets_are_monotone_nondecreasing():
    """The decode walk assumes starts are non-decreasing; duplicate
    full-char spans from byte fragments keep that invariant."""
    ad = HFTokenizerAdapter(MiniByteBPE())
    toks, ss, es = ad.tokenize_with_offsets("cafù x 🚀")
    assert ss == sorted(ss) and es == sorted(es)


def test_char_tokenizer_identity_offsets_and_unk():
    """T3 CNerTokenizer semantics: identity offset map, OOV -> [UNK]
    with offsets preserved, lower-case moves tokens not offsets, and
    text[s:e] always recovers the original char."""
    from theta_spark.operators.hf_bridge import CharTokenizer

    text = "aB 9"
    toks, s, e = CharTokenizer().tokenize_with_offsets(text)
    assert toks == ["a", "B", " ", "9"]
    assert s == [0, 1, 2, 3] and e == [1, 2, 3, 4]
    assert [text[a:b] for a, b in zip(s, e)] == list(text)

    toks, s, e = CharTokenizer(do_lower_case=True).tokenize_with_offsets(text)
    assert toks == ["a", "b", " ", "9"] and s == [0, 1, 2, 3]

    toks, s, e = CharTokenizer(vocab={"a", "b", "9"}, do_lower_case=True).tokenize_with_offsets(text)
    assert toks == ["a", "b", "[UNK]", "9"]
    assert s == [0, 1, 2, 3]  # UNK keeps its identity offsets


def test_char_tokenizer_batch_and_truncation():
    from theta_spark.operators.hf_bridge import CharTokenizer

    out = CharTokenizer(max_length=3).tokenize_batch(["abcdef", "x"])
    assert out[0] == (["a", "b", "c"], [0, 1, 2], [1, 2, 3])
    assert out[1] == (["x"], [0], [1])
