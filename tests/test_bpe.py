"""BPE tokenizer training (functions/bpe.py) vs a pure-python replica:
same merges in the same order, deterministic tie-break, end-marker
semantics, early stop."""

from __future__ import annotations

import collections


def _py_bpe(texts, n_merges):
    """Definitional BPE on word types (Sennrich et al. 2016 Fig. 1) with
    the engine's conventions: lowercase/whitespace words, '</w>' marker,
    (count DESC, pair ASC) winner."""
    types = collections.Counter()
    for t in texts:
        for w in t.strip().lower().split():
            types[w] += 1
    symtab = {w: list(w) + ["</w>"] for w in types}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        for w, syms in symtab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += types[w]
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, cnt))
        for w, syms in symtab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symtab[w] = out
    return merges


def test_train_bpe_matches_python_replica(spark):
    from theta_spark.functions.bpe import train_bpe

    texts = [
        "low lower lowest low low",
        "new newer newest new",
        "wide wider widest",
        "low newer low",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    exp = _py_bpe(texts, 8)
    got = train_bpe(df, 8)
    assert got == exp, (got, exp)
    # merged symbols must compose: later merges may consume earlier ones
    assert any(len(a) > 1 or len(b) > 1 for a, b, _ in got[2:])


def test_train_bpe_early_stop_and_single_char(spark):
    from theta_spark.functions.bpe import train_bpe

    # "a" alone: syms = [a, </w>] -> exactly ONE possible merge, then done
    df = spark.createDataFrame([("a a a",)], "text string")
    got = train_bpe(df, 10)
    assert got == [("a", "</w>", 3)]
