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
