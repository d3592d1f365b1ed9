"""Deterministic synthetic source-code corpus generator (FIXTURES.md §B).

Produces the input_hint-shaped table
    corpus(repo, path, commit, lang, content)
plus gold tables generated *structurally* (not by running the engine):
    gold_mentions(doc_id, category, start, mention)
    gold_triples(subj, pred, obj, doc_id)
    gold_entities(canonical, category, aliases)

Mention schema mirrors the reference tag dict {'category','start','mention'}
(/root/reference/theta/nlp/data/samples.py:247-258); char-offset invariant
content[start : start+len(mention)] == mention holds for every gold row
(the reference asserts the same at task_ner.py:212-218).

Layout guarantees used by tests:
- every physical line is <= 64 chars, so with seg_len=126 / stride=63 every
  line (hence every mention + its keyword context) lies fully inside at
  least one sliding-window segment (reference stride semantics,
  task_ner.py:184-186);
- ~20% of files call the hot entity `shared_util` (skew exercise);
- some call sites use a qualified alias `u.shared_util`-style dotted name so
  canonicalization has real work to do.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

LANGS = ["python", "java", "go"]
LIB_POOL = [
    "numpy",
    "os.path",
    "collections.abc",
    "jsonlib",
    "httpkit.client",
    "logkit",
]
HOT_FN = "shared_util"


@dataclass
class Doc:
    repo: str
    path: str
    commit: str
    lang: str
    content: str
    mentions: list = field(default_factory=list)  # (category, start, mention)
    triples: list = field(default_factory=list)   # (subj, pred, obj)

    @property
    def doc_id(self) -> str:
        return f"{self.repo}:{self.path}@{self.commit}"


class _Builder:
    """Appends text while recording (category, start, mention) gold rows."""

    def __init__(self):
        self.parts: list[str] = []
        self.pos = 0
        self.mentions: list[tuple[str, int, str]] = []

    def raw(self, s: str):
        self.parts.append(s)
        self.pos += len(s)

    def ent(self, category: str, mention: str):
        self.mentions.append((category, self.pos, mention))
        self.raw(mention)

    def text(self) -> str:
        return "".join(self.parts)


def _commit_of(repo: str, path: str) -> str:
    # md5 (not sha1): DuckDB 1.0 ships md5/sha256 only, and the kg_triples
    # oracle must rebuild doc_id = repo:path@commit in SQL
    return hashlib.md5(f"{repo}/{path}".encode()).hexdigest()


class KeyedDraws:
    """Deterministic keyed draws for corpus synthesis.

    Every 'random' decision of doc i is d(key, n) = first 8 md5 hex chars
    of '{seed}:{i}:{key}' mod n — a pure function of (seed, i, key), so

    - doc i's content is independent of generation order / executor
      placement (the property that lets synthesis distribute over
      spark.range), and
    - the DuckDB oracle replays the exact draw as
      ('0x' || substr(md5(seed || ':' || i || ':' || key), 1, 8))::BIGINT % n,
      which is what makes the flagship kg_triples query hash-checkable:
      the oracle derives the gold triple set structurally in SQL, fully
      independent of the engine's segment/score/decode/dedup dataflow.
    """

    def __init__(self, seed: int, i: int):
        self.seed, self.i = seed, i

    def d(self, key: str, n: int) -> int:
        h = hashlib.md5(f"{self.seed}:{self.i}:{key}".encode()).hexdigest()[:8]
        return int(h, 16) % n


def canonical_name(name: str) -> str:
    """Canonical entity id: last dotted component, lowered.

    `u.shared_util` and `shared_util` canonicalize identically; the engine
    must reach the same equivalence via normalization + LSH/CC.
    """
    return name.split(".")[-1].lower()


def generate_doc(rng: KeyedDraws, i: int) -> Doc:
    repo = f"org{i % 7}/proj{i % 13}"
    path = f"src/pkg{i % 5}/mod{i}.py"
    commit = _commit_of(repo, path)
    lang = LANGS[i % len(LANGS)]

    b = _Builder()
    module = f"pkg{i % 5}.mod{i}"
    triples: list[tuple[str, str, str]] = []
    mod_c = canonical_name(module)

    b.raw('"""module ')
    b.ent("module", module)
    b.raw('"""\n')

    # imports: n_libs consecutive pool entries from a drawn offset —
    # distinct without a sample-without-replacement loop, and replayable
    # as (libo + j) % 6 in SQL
    n_libs = 1 + rng.d("nlibs", 3)
    libo = rng.d("libo", len(LIB_POOL))
    libs = [LIB_POOL[(libo + j) % len(LIB_POOL)] for j in range(n_libs)]
    for lib in libs:
        b.raw("import ")
        b.ent("library", lib)
        b.raw("\n")
        triples.append((mod_c, "imports", canonical_name(lib)))
    b.raw("\n")

    # length profile: short (<126), medium, long (>3*126)
    profile = rng.d("prof", 4)
    n_classes = [0, 1, 1, 2][profile]
    n_funcs = [1, 2, 4, 7][profile]
    hot = rng.d("hot", 5) == 0

    known_callables: list[str] = [HOT_FN, f"helper{i % 9}"]
    class_names: list[str] = []

    for c in range(n_classes):
        cls = f"Handler{i % 11}_{c}"
        class_names.append(cls)
        b.raw("class ")
        b.ent("class", cls)
        b.raw(":\n")
        triples.append((mod_c, "defines", canonical_name(cls)))
        n_methods = 1 + rng.d(f"nm{c}", 2)
        for m in range(n_methods):
            meth = f"process{i % 11}_{c}_{m}"
            b.raw("    def ")
            b.ent("function", meth)
            b.raw("(self, x):\n")
            triples.append((canonical_name(cls), "contains", canonical_name(meth)))
            callee = HOT_FN if hot else known_callables[rng.d(f"mc{c}_{m}", 2)]
            var = f"y{m}"
            b.raw("        ")
            b.ent("variable", var)
            b.raw(" = ")
            b.ent("call", callee)
            b.raw("(x)\n")
            triples.append((canonical_name(meth), "calls", canonical_name(callee)))
            b.raw(f"        return {var}\n")
        b.raw("\n")

    for f in range(n_funcs):
        fn = f"helper{i % 9}_{f}"
        b.raw("def ")
        b.ent("function", fn)
        b.raw("(a, b):\n")
        triples.append((mod_c, "defines", canonical_name(fn)))
        if class_names and f == 0:
            cls = class_names[0]
            var = "h"
            b.raw("    ")
            b.ent("variable", var)
            b.raw(" = ")
            b.ent("call", cls)
            b.raw("()\n")
            triples.append((canonical_name(fn), "calls", canonical_name(cls)))
            triples.append((var, "instance_of", canonical_name(cls)))
        # qualified-alias call site ~30% of the time (canonicalization work)
        callee = HOT_FN if (hot and f % 2 == 0) else known_callables[rng.d(f"fc{f}", 2)]
        use_alias = rng.d(f"al{f}", 10) < 3
        callee_txt = f"u.{callee}" if use_alias else callee
        var = f"r{f}"
        b.raw("    ")
        b.ent("variable", var)
        b.raw(" = ")
        b.ent("call", callee_txt)
        b.raw("(a)\n")
        triples.append((canonical_name(fn), "calls", canonical_name(callee)))
        b.raw(f"    return {var}\n")
    content = b.text()
    return Doc(repo, path, commit, lang, content, b.mentions, triples)


def doc_rng(seed: int, i: int) -> KeyedDraws:
    """Per-doc draw source keyed (seed, i) — see KeyedDraws: order- and
    placement-independent AND replayable in DuckDB SQL."""
    return KeyedDraws(seed, i)


def generate_corpus(n_docs: int, seed: int = 42) -> list[Doc]:
    return [generate_doc(doc_rng(seed, i), i) for i in range(n_docs)]


# ---------------------------------------------------------------- Spark side

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"
GOLD_MENTIONS_SCHEMA = "doc_id string, category string, start int, mention string"
GOLD_TRIPLES_SCHEMA = "subj string, pred string, obj string, doc_id string"


def corpus_rows(docs: list[Doc]):
    return [(d.repo, d.path, d.commit, d.lang, d.content) for d in docs]


def gold_mention_rows(docs: list[Doc]):
    return [
        (d.doc_id, cat, start, mention)
        for d in docs
        for (cat, start, mention) in d.mentions
    ]


def gold_triple_rows(docs: list[Doc]):
    # de-duplicated per doc, as a set of (s,p,o,doc)
    out = set()
    for d in docs:
        for (s, p, o) in d.triples:
            out.add((s, p, o, d.doc_id))
    return sorted(out)


def corpus_df(spark, n_docs: int, seed: int = 42, num_partitions: int | None = None, with_docs: bool = True):
    """Synthesize the corpus as a DataFrame.

    Generation is distributed: spark.range(n_docs) -> mapInPandas, each
    executor generating its ids with the per-doc RNG — no driver-side list,
    no createDataFrame serialization wall at large n_docs. `with_docs=True`
    (small/test scale only) additionally returns the driver-side Doc list
    (with gold mentions/triples); pass False for bench-scale corpora.
    """
    num_partitions = num_partitions or max(8, n_docs // 2000)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = [generate_doc(doc_rng(seed, int(i)), int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "repo": [d.repo for d in rows],
                    "path": [d.path for d in rows],
                    "commit": [d.commit for d in rows],
                    "lang": [d.lang for d in rows],
                    "content": [d.content for d in rows],
                }
            )

    df = spark.range(n_docs).repartition(num_partitions).mapInPandas(gen, CORPUS_SCHEMA)
    docs = generate_corpus(n_docs, seed) if with_docs else None
    return df, docs
