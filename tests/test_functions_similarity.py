"""Unit tests for similarity search (functions.similarity)."""

import math

import numpy as np

from theta_spark.functions.similarity import (
    brute_force_topk,
    cell_centroids,
    cosine_near_dup_pairs,
    ivf_topk,
    ivf_topk_multiprobe,
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


def test_cell_centroids_elementwise_mean(spark):
    e = _embeddings(spark)
    cents = {r.cell: list(r.cvec) for r in cell_centroids(e).collect()}
    rows = [(r.label, np.array(r.embedding)) for r in e.collect()]
    for cell in (0, 1, 2):
        units = [v / np.linalg.norm(v) for lbl, v in rows if lbl == cell]
        expect = [round(float(x), 6) for x in np.mean(units, axis=0)]
        assert cents[cell] == expect


def test_multiprobe_recall_dominates_single_probe(spark):
    """nprobe=2 candidates are a superset of the query's own-cell hits
    whenever the own cell ranks in the top 2 probes, and recall vs brute
    force never decreases going single -> multi."""
    e = _embeddings(spark)
    qs = e.filter("vec_id % 10 = 0")
    truth = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(e, qs, k=5).collect()
    }
    single = {
        (r.query_id, r.neighbor_id) for r in ivf_topk(e, qs, k=5).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk_multiprobe(e, qs, k=5, nprobe=2).collect()
    }
    assert len(multi & truth) >= len(single & truth)


def test_multiprobe_all_cells_equals_brute_force(spark):
    """Probing every cell degenerates to exact search: same pairs, sims,
    and ranks as the brute-force baseline."""
    e = _embeddings(spark)
    qs = e.filter("vec_id % 10 = 0")
    bf = sorted(map(tuple, brute_force_topk(e, qs, k=5).collect()))
    mp = sorted(map(tuple, ivf_topk_multiprobe(e, qs, k=5, nprobe=3).collect()))
    assert bf == mp


def test_cosine_near_dup_pairs_planted(spark):
    out = {(r.a, r.b) for r in cosine_near_dup_pairs(_embeddings(spark), threshold=0.99).collect()}
    assert (0, 100) in out
    assert len(out) == 1


def test_kmeans_cells_lloyd_deterministic_and_clusters(spark):
    """Lloyd's trainer: deterministic across runs, every vector assigned to
    a live cell, and the learned cells separate an obviously-clustered
    input (two orthogonal bundles -> members of each bundle share a cell)."""
    import numpy as np

    from theta_spark.functions.similarity import kmeans_cells_lloyd

    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):
        base = np.zeros(8)
        base[0 if i % 2 == 0 else 4] = 10.0  # two orthogonal bundles
        rows.append((i, (base + rng.normal(0, 0.1, 8)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    a1, c1 = kmeans_cells_lloyd(df, k=2, iters=2)
    a2, c2 = kmeans_cells_lloyd(df, k=2, iters=2)
    m1 = {r.vec_id: r.cell for r in a1.collect()}
    m2 = {r.vec_id: r.cell for r in a2.collect()}
    assert m1 == m2 and c1 == c2          # deterministic
    assert len(m1) == 40
    evens = {m1[i] for i in range(0, 40, 2)}
    odds = {m1[i] for i in range(1, 40, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_kmeans_assign_arrow_matches_literal(spark):
    """The broadcast-codebook Arrow assignment (scale path for large k) is
    bit-identical to the literal-codegen path on the same data — same
    half-up 1e-4 rounding, same lowest-cell tie rule — and the "auto"
    dispatch picks Arrow above literal_max_k (pinned: the 64-cell driver
    query exercises mapInPandas, not a 64-wide literal plan)."""
    import numpy as np

    from theta_spark.functions.similarity import kmeans_cells_lloyd

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(0, 1, 16).tolist()) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    for k, iters in ((6, 2), (24, 1)):
        a_lit, c_lit = kmeans_cells_lloyd(df, k=k, iters=iters, assign_impl="literal")
        a_arw, c_arw = kmeans_cells_lloyd(df, k=k, iters=iters, assign_impl="arrow")
        assert c_lit == c_arw  # identical trained codebook
        m_lit = {r.vec_id: r.cell for r in a_lit.collect()}
        m_arw = {r.vec_id: r.cell for r in a_arw.collect()}
        assert m_lit == m_arw and len(m_lit) == 120

    # chunked argmax: a chunk boundary inside the codebook changes nothing
    from theta_spark.functions.similarity import _assign_cells_arrow, with_unit_vec
    from pyspark.sql import functions as F

    u = with_unit_vec(df).select(F.col("vec_id").alias("_vid"), "unit")
    _, cents = kmeans_cells_lloyd(df, k=24, iters=1, assign_impl="arrow")
    whole = {r._vid: r.cell for r in _assign_cells_arrow(u, cents).collect()}
    chunked = {r._vid: r.cell for r in _assign_cells_arrow(u, cents, chunk_k=5).collect()}
    assert whole == chunked


def test_kmeans_auto_dispatch_threshold(spark):
    """auto == literal at k<=literal_max_k and == arrow above: both sides
    of the threshold produce the same assignments as their forced twins."""
    import numpy as np

    from theta_spark.functions.similarity import kmeans_cells_lloyd

    rng = np.random.default_rng(11)
    rows = [(i, rng.normal(0, 1, 8).tolist()) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a_auto, c_auto = kmeans_cells_lloyd(df, k=20, iters=1, assign_impl="auto", literal_max_k=16)
    a_arw, c_arw = kmeans_cells_lloyd(df, k=20, iters=1, assign_impl="arrow")
    assert c_auto == c_arw
    assert {r.vec_id: r.cell for r in a_auto.collect()} == {
        r.vec_id: r.cell for r in a_arw.collect()
    }
