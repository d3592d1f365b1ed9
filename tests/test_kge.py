"""functions/kge.py: fixed-point TransE vs a definitional Python replica,
partitioning invariance, and learning evidence (violations decrease)."""

from __future__ import annotations

import hashlib


from theta_spark.functions.kge import (
    init_embeddings,
    train_transe,
    transe_epoch,
    violation_count,
)


def _draw32_py(key: str, tag: str, seed: int) -> int:
    return int(hashlib.md5(f"{key}#{tag}#{seed}".encode()).hexdigest()[:8], 16)


def _init_py(ids, dim, tag, seed=42, half=100):
    mod = 2 * half + 1
    return {
        i: [_draw32_py(str(i), f"{tag}{p}", seed) % mod - half for p in range(dim)]
        for i in ids
    }


def _epoch_py(ent, rel, triples, dim, lr=1, margin=50):
    """Definitional full-batch TransE step over dict embeddings."""
    ed = {i: [0] * dim for i in ent}
    rd = {i: [0] * dim for i in rel}
    nviol = 0
    for h, r, t, tc in triples:
        pd = [ent[h][p] + rel[r][p] - ent[t][p] for p in range(dim)]
        nd = [ent[h][p] + rel[r][p] - ent[tc][p] for p in range(dim)]
        if sum(abs(x) for x in pd) + margin > sum(abs(x) for x in nd):
            nviol += 1
            sp = [(x > 0) - (x < 0) for x in pd]
            sn = [(x > 0) - (x < 0) for x in nd]
            for p in range(dim):
                ed[h][p] += sn[p] - sp[p]
                ed[t][p] += sp[p]
                ed[tc][p] -= sn[p]
                rd[r][p] += sn[p] - sp[p]
    return (
        {i: [ent[i][p] + lr * ed[i][p] for p in range(dim)] for i in ent},
        {i: [rel[i][p] + lr * rd[i][p] for p in range(dim)] for i in rel},
        nviol,
    )


def _tiny(spark, n_ent=12, dim=4):
    triples = [
        (h, r, t, tc)
        for h in range(4)
        for r in range(2)
        for t, tc in [((h * 3 + r) % n_ent, (h * 3 + r + 5) % n_ent)]
    ]
    tdf = spark.createDataFrame(triples, "h long, r long, t long, t_corr long")
    ids = spark.range(n_ent)
    ent = init_embeddings(ids, dim=dim, tag="kge")
    rel = init_embeddings(spark.range(2), dim=dim, tag="kger")
    ent_py = _init_py(range(n_ent), dim, "kge")
    rel_py = _init_py(range(2), dim, "kger")
    return tdf, ent, rel, ent_py, rel_py, triples


def test_init_matches_python_draws(spark):
    _, ent, _, ent_py, _, _ = _tiny(spark)
    got = {r["id"]: list(r["emb"]) for r in ent.collect()}
    assert got == ent_py


def test_epoch_matches_python_replica(spark):
    tdf, ent, rel, ent_py, rel_py, triples = _tiny(spark)
    for _ in range(3):
        ent, rel = transe_epoch(ent, rel, tdf, margin=50)
        # lineage discipline (see train_transe): each epoch references ent
        # 4x, so cut per epoch or plan size grows 4^epochs
        ent, rel = ent.localCheckpoint(eager=True), rel.localCheckpoint(eager=True)
        ent_py, rel_py, _ = _epoch_py(ent_py, rel_py, triples, 4, margin=50)
    assert {r["id"]: list(r["emb"]) for r in ent.collect()} == ent_py
    assert {r["id"]: list(r["emb"]) for r in rel.collect()} == rel_py


def test_training_partitioning_invariant(spark):
    tdf, ent, rel, *_ = _tiny(spark)
    e1, r1 = train_transe(ent.repartition(1), rel, tdf.repartition(1), epochs=2)
    e2, r2 = train_transe(ent.repartition(7), rel, tdf.repartition(5), epochs=2)
    assert {r["id"]: list(r["emb"]) for r in e1.collect()} == {
        r["id"]: list(r["emb"]) for r in e2.collect()
    }
    assert {r["id"]: list(r["emb"]) for r in r1.collect()} == {
        r["id"]: list(r["emb"]) for r in r2.collect()
    }


def test_violations_decrease(spark):
    """Margin violations at the final embeddings must be below the
    epoch-0 count — the integer margin steps actually separate positive
    from corrupted triples."""
    tdf, ent, rel, *_ = _tiny(spark, n_ent=20)
    v0 = violation_count(ent, rel, tdf, margin=50)
    ent_f, rel_f = train_transe(ent, rel, tdf, epochs=6)
    vf = violation_count(ent_f, rel_f, tdf, margin=50)
    assert vf < v0


def test_checkpoint_interval_bit_unobservable(spark):
    """Materialize points cannot change a bit: every-epoch cuts vs
    2-epoch cuts vs none (small enough to tolerate the 4^2 plan)."""
    tdf, ent, rel, *_ = _tiny(spark)
    e_none, _ = train_transe(ent, rel, tdf, epochs=2, checkpoint_every=0)
    e_one, _ = train_transe(ent, rel, tdf, epochs=2, checkpoint_every=1)
    assert {r["id"]: list(r["emb"]) for r in e_none.collect()} == {
        r["id"]: list(r["emb"]) for r in e_one.collect()
    }


def test_absent_entity_keeps_vector(spark):
    """An entity never touched by any triple must come out of training
    with its init vector unchanged (LEFT-join apply semantics)."""
    tdf, ent, rel, ent_py, _, triples = _tiny(spark, n_ent=30)
    touched = {x for h, r, t, tc in triples for x in (h, t, tc)}
    untouched = set(range(30)) - touched
    assert untouched  # fixture sanity
    ent_f, _ = train_transe(ent, rel, tdf, epochs=2)
    got = {r["id"]: list(r["emb"]) for r in ent_f.collect()}
    for i in untouched:
        assert got[i] == ent_py[i]


def test_warm_start_incremental_refresh(spark):
    """The incremental-KG story for embeddings (pagerank-warm-start
    analog): after a triple delta lands, training resumes FROM the prior
    embedding tables (train_transe takes ent/rel frames, not an RNG
    state), and a warm-started refresh on the merged triple set must (a)
    start from strictly fewer margin violations than a cold init on the
    same set, and (b) equal the cold run's result given the same number
    of FURTHER epochs from the same state — i.e. warm-starting is pure
    state reuse, not a different algorithm."""
    tdf, ent, rel, *_ = _tiny(spark, n_ent=20)
    # prior "run": 3 epochs on the base triples
    ent1, rel1 = train_transe(ent, rel, tdf, epochs=3)
    delta = spark.createDataFrame(
        [(5, 1, 11, 17), (6, 0, 12, 18)], "h long, r long, t long, t_corr long"
    )
    merged = tdf.unionByName(delta)
    # (a) the prior state transfers: fewer violations than cold init
    assert violation_count(ent1, rel1, merged) < violation_count(ent, rel, merged)
    # (b) pure state reuse: continuing from (ent1, rel1) is just transe
    e_warm, r_warm = train_transe(ent1, rel1, merged, epochs=2)
    e_chain, r_chain = train_transe(
        ent1.localCheckpoint(eager=True), rel1.localCheckpoint(eager=True), merged, epochs=2
    )
    assert {r["id"]: list(r["emb"]) for r in e_warm.collect()} == {
        r["id"]: list(r["emb"]) for r in e_chain.collect()
    }
