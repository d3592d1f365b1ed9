"""Fixture-generator invariants (SURVEY.md §5.2 item 4/5).

The gold tables are generated structurally; these invariants are what the
reference asserts at runtime (span slice identity, task_ner.py:212-218) plus
the layout guarantees the sliding-window proof relies on."""

from theta_spark.corpus import canonical_name, generate_corpus


def test_deterministic():
    a = generate_corpus(20, seed=42)
    b = generate_corpus(20, seed=42)
    assert [d.content for d in a] == [d.content for d in b]
    assert [d.mentions for d in a] == [d.mentions for d in b]


def test_span_slice_identity(docs50):
    # reference invariant: text[start : start+len(mention)] == mention
    for d in docs50:
        for cat, start, mention in d.mentions:
            assert d.content[start : start + len(mention)] == mention, (d.doc_id, cat, start)


def test_lines_shorter_than_stride(docs50):
    # every line <= 64 chars => every mention+context fits in one 126-char
    # segment given stride 63 (sliding-window recovery proof)
    for d in docs50:
        for line in d.content.split("\n"):
            assert len(line) <= 64, (d.doc_id, line)


def test_gold_triples_use_canonical_names(docs50):
    for d in docs50:
        for s, p, o in d.triples:
            if p != "instance_of":  # subject of instance_of is the raw var name
                assert s == canonical_name(s)
            assert o == canonical_name(o)


def test_hot_entity_present():
    docs = generate_corpus(200, seed=42)
    hot_docs = sum(1 for d in docs if any(o == "shared_util" for _, _, o in d.triples))
    assert hot_docs > 20  # ~20% of files hit the hot entity (skew exercise)


def test_alias_sites_exist(docs50):
    assert any("u.shared_util" in d.content or "u.helper" in d.content for d in docs50)
