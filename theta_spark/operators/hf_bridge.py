"""T1/T2: HuggingFace-tokenizer bridge onto the engine's offset contract.

The reference tokenizes with `tokenizer.batch_encode_plus(batch_texts,
..., return_offsets_mapping=True)` and feeds `offset_mapping` to its
span decode (theta/nlp/tasks/task_ner.py:86-101); the engine's scorers
consume the same contract as `tokenize_with_offsets(text) -> (tokens,
starts, ends)` with exclusive ends (operators/scoring.py:43-51).

`transformers` is not installed in this sandbox, so the bridge is
import-gated: `load_hf_tokenizer(name)` raises a clear error without the
package, while `HFTokenizerAdapter` accepts ANY object exposing the HF
fast-tokenizer call shape — `tok(texts, return_offsets_mapping=True,
add_special_tokens=..., truncation=..., max_length=...) -> mapping with
.input_ids / .offset_mapping` — and maps it onto the engine contract:

- special tokens ([CLS]/[SEP]/pad) arrive as (0, 0) offset pairs and are
  dropped, exactly what the reference's decode does by skipping
  zero-width offsets (task_ner.py:594-607 walks offset_mapping and a
  (0,0) token can never bound a span);
- HF offset ends are already exclusive — no shift needed;
- batching: `tokenize_batch` keeps the reference's one-call-per-Arrow-
  batch shape so a real fast tokenizer amortizes its Rust call overhead
  across the batch (the 10-100x batched-vs-per-row win the reference
  comments rely on).

A scorer built on this adapter plugs into the same fused mapInPandas
stage as RuleScorer/MLPScorer — the adapter is the missing piece between
the HF API and the `score_text` contract, tested against a fake with the
exact HF call signature (tests/test_hf_bridge.py) and against golden
fixtures for BOTH dominant tokenizer families:

- WordPiece (BERT): '##' continuation pieces, punctuation pre-split,
  (0,0) specials/pads (tests/test_hf_bridge.py::MiniWordPiece);
- byte-level BPE (GPT-2/RoBERTa/code models): NO continuation prefix,
  the space belongs to the FOLLOWING token, merges apply by global rank,
  and a token boundary may fall inside a multi-byte char — HF resolves
  each byte fragment to the full char span, so duplicate (start,end)
  pairs are legal output the adapter passes through unchanged; the
  engine-side token text is text[s:e] by construction, never the model's
  piece string (tests/test_hf_bridge.py::MiniByteBPE).
"""

from __future__ import annotations


def load_hf_tokenizer(name: str):
    """AutoTokenizer.from_pretrained, import-gated (transformers is not in
    the sandbox image; on a cluster, ship it via --py-files/conda env)."""
    try:
        from transformers import AutoTokenizer  # type: ignore
    except ImportError as e:  # pragma: no cover - sandbox has no transformers
        raise ImportError(
            "transformers is not installed; pass any tokenizer with the HF "
            "fast-tokenizer call shape to HFTokenizerAdapter instead"
        ) from e
    return AutoTokenizer.from_pretrained(name, use_fast=True)  # pragma: no cover


class HFTokenizerAdapter:
    """Wrap an HF(-shaped) fast tokenizer into the engine's
    tokenize_with_offsets contract."""

    def __init__(self, tokenizer, max_length: int = 512, add_special_tokens: bool = True):
        self._tok = tokenizer
        self.max_length = max_length
        self.add_special_tokens = add_special_tokens

    def tokenize_batch(self, texts: list) -> list:
        """[(tokens, starts, ends), ...] — one tokenizer call per batch
        (the reference's batch_encode_plus shape, task_ner.py:86-93)."""
        enc = self._tok(
            list(texts),
            return_offsets_mapping=True,
            add_special_tokens=self.add_special_tokens,
            truncation=True,
            max_length=self.max_length,
        )
        out = []
        for text, offsets in zip(texts, enc["offset_mapping"]):
            tokens, starts, ends = [], [], []
            for (s, e) in offsets:
                if e <= s:  # special/pad tokens surface as (0, 0): drop
                    continue
                tokens.append(text[s:e])
                starts.append(s)
                ends.append(e)
            out.append((tokens, starts, ends))
        return out

    def tokenize_with_offsets(self, text: str):
        """Single-text contract (operators/scoring.py:43-51)."""
        return self.tokenize_batch([text])[0]

    def encode_batch(self, texts: list) -> list:
        """Model-forward fidelity: per text (input_ids, tokens, starts,
        ends, positions) where input_ids is the UNTRIMMED id sequence a
        transformer consumes (specials/pads included — the encoder needs
        [CLS]/[SEP] context) and positions[i] is the model-sequence index
        of engine-contract token i. A BertSpan-style head emits per-model-
        position start/end probs; `probs[positions]` selects the rows the
        engine decode walks, exactly the reference's offset_mapping gather
        (task_ner.py:594-607)."""
        enc = self._tok(
            list(texts),
            return_offsets_mapping=True,
            add_special_tokens=self.add_special_tokens,
            truncation=True,
            max_length=self.max_length,
        )
        out = []
        for text, ids, offsets in zip(texts, enc["input_ids"], enc["offset_mapping"]):
            tokens, starts, ends, positions = [], [], [], []
            for pos, (s, e) in enumerate(offsets):
                if e <= s:  # special/pad tokens surface as (0, 0)
                    continue
                tokens.append(text[s:e])
                starts.append(s)
                ends.append(e)
                positions.append(pos)
            out.append((list(ids), tokens, starts, ends, positions))
        return out


class CharTokenizer:
    """T3 (theta/nlp/tokenizers/huggingface_tokenizer.py:140-171,
    CNerTokenizer): char-level tokenization — every character is one
    token, so the offset map is the identity (starts=i, ends=i+1), the
    degenerate case of the T1 contract. Faithful to the reference's
    rules:

    - `do_lower_case` lowers the TOKEN string only; offsets never move;
    - a char outside `vocab` surfaces as '[UNK]' (the reference's OOV
      substitution) but KEEPS its identity offsets — harmless to the
      engine's span decode, which reads text[s:e] by construction and
      never the token string;
    - `vocab=None` disables the OOV rule (identity tokens), the
      English/code default where the char alphabet IS the vocab.

    Same `tokenize_with_offsets` / `tokenize_batch` surface as
    HFTokenizerAdapter, so it plugs into the same batched scoring stage.
    """

    def __init__(self, vocab=None, do_lower_case: bool = False, max_length: int = 512):
        self.vocab = set(vocab) if vocab is not None else None
        self.do_lower_case = do_lower_case
        self.max_length = max_length

    def tokenize_with_offsets(self, text: str):
        tokens, starts, ends = [], [], []
        for i, c in enumerate(text[: self.max_length]):
            if self.do_lower_case:
                c = c.lower()
            if self.vocab is not None and c not in self.vocab:
                c = "[UNK]"
            tokens.append(c)
            starts.append(i)
            ends.append(i + 1)
        return tokens, starts, ends

    def tokenize_batch(self, texts: list) -> list:
        return [self.tokenize_with_offsets(t) for t in texts]
