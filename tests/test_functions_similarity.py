"""Unit tests for similarity search (functions.similarity)."""

import math

import numpy as np

from theta_spark.functions.similarity import (
    brute_force_topk,
    cosine_near_dup_pairs,
    ivf_topk,
    with_unit_vec,
)


def _embeddings(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(40):
        v = rng.randn(8).astype(float)
        rows.append((i, [float(x) for x in v], i % 3))
    # plant a near-duplicate of vec 0 at id 100
    v0 = rows[0][1]
    rows.append((100, [x * 2.0 + 1e-3 for x in v0], 0))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_unit_vec_norm_one(spark):
    df = with_unit_vec(_embeddings(spark))
    for r in df.select("unit").collect():
        assert abs(sum(x * x for x in r.unit) - 1.0) < 1e-9


def test_brute_force_finds_planted_neighbor(spark):
    e = _embeddings(spark)
    q = e.filter("vec_id = 0")
    out = brute_force_topk(e, q, k=3).collect()
    assert out[0].neighbor_id == 100 and out[0].cos_sim > 0.999
    assert [r.rk for r in out] == [1, 2, 3]


def test_brute_force_matches_numpy(spark):
    e = _embeddings(spark)
    q = e.filter("vec_id = 5")
    got = [(r.neighbor_id, r.cos_sim) for r in brute_force_topk(e, q, k=5).collect()]
    rows = {r.vec_id: np.array(r.embedding) for r in e.collect()}
    qv = rows[5] / np.linalg.norm(rows[5])
    sims = sorted(
        ((round(float(np.dot(v / np.linalg.norm(v), qv)), 4), -i) for i, v in rows.items() if i != 5),
        reverse=True,
    )[:5]
    expect = [(-i, s) for s, i in sims]
    assert got == expect


def test_ivf_restricts_to_cell(spark):
    e = _embeddings(spark)
    q = e.filter("vec_id = 1")  # label 1
    out = ivf_topk(e, q, k=50).collect()
    labels = {r.vec_id: r.label for r in e.collect()}
    assert out and all(labels[r.neighbor_id] == 1 for r in out)


def test_cosine_near_dup_pairs_planted(spark):
    out = {(r.a, r.b) for r in cosine_near_dup_pairs(_embeddings(spark), threshold=0.99).collect()}
    assert (0, 100) in out
    assert len(out) == 1
