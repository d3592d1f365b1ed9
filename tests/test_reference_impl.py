"""The pure-Python transcription of the reference dataflow (mini-theta)
must recover the planted gold mentions/triples exactly on the synthetic
corpus — this pins the *semantics* before the Spark engine is compared
against it (SURVEY.md §5.2 item 3)."""

from theta_spark.config import LABEL2ID
from theta_spark.corpus import generate_corpus
from theta_spark.reference_impl import (
    assemble_doc_triples,
    extract_doc_mentions,
    prf,
    reference_triples,
    segment_offsets,
)


def test_segment_offsets_match_reference_loop():
    # reference loop: while seg_offset < len(text) (task_ner.py:231)
    for n in [1, 62, 63, 64, 125, 126, 127, 200, 500]:
        text = "x" * n
        offs = segment_offsets(text, 126, 63)
        expect = list(range(0, n, 63))
        assert [s for s, _ in offs] == expect
        assert all(t == text[s : s + 126] for s, t in offs)


def test_doc_mentions_match_gold(docs50):
    for d in docs50:
        got = {
            (m["category"], m["start"], m["mention"])
            for m in extract_doc_mentions(d.content)
        }
        gold = set(d.mentions)
        assert got == gold, (d.doc_id, sorted(gold - got)[:3], sorted(got - gold)[:3])


def test_doc_triples_match_gold(docs50):
    ref = reference_triples(docs50)
    gold = {(s, p, o, d.doc_id) for d in docs50 for (s, p, o) in d.triples}
    p, r, f1 = prf(ref, gold)
    assert (p, r, f1) == (1.0, 1.0, 1.0), (sorted(gold - ref)[:5], sorted(ref - gold)[:5])


def test_dedup_preserves_first_occurrence_order():
    d = generate_corpus(5, seed=1)[3]
    ments = extract_doc_mentions(d.content)
    starts = [m["start"] for m in ments]
    keys = [(m["category_id"], m["start"], m["end"]) for m in ments]
    assert len(keys) == len(set(keys))
    # order-preserving: per segment ascending; global list begins at doc head
    assert starts[0] == min(starts)


def test_prf_zero_guards():
    assert prf(set(), set()) == (0.0, 0.0, 0.0)
    assert prf({1}, set()) == (0.0, 0.0, 0.0)
    assert prf(set(), {1}) == (0.0, 0.0, 0.0)


def test_assemble_handles_missing_module():
    ments = [
        {"category": "function", "category_id": LABEL2ID["function"], "start": 4,
         "end": 6, "mention": "foo", "indent": 0},
    ]
    assert assemble_doc_triples(ments, "d") == set()
