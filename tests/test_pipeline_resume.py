"""Checkpoint/resume semantics (north rule: every stage resumable with
per-stage lineage + metrics)."""

import json
import os

from theta_spark.pipeline import run_checkpointed, run_pipeline, stage_complete


def test_run_checkpointed_writes_manifest(spark, tmp_path):
    wd = str(tmp_path)
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).withColumnRenamed("id", "x")

    out = run_checkpointed(spark, wd, "s1", build)
    assert out.count() == 10
    assert calls["n"] == 1
    assert stage_complete(wd, "s1")
    manifest = json.load(open(os.path.join(wd, "s1", "_STAGE_MANIFEST.json")))
    assert manifest["rows_out"] == 10
    assert "wall_ms" in manifest and "schema" in manifest

    # resume: build NOT called again
    out2 = run_checkpointed(spark, wd, "s1", build)
    assert out2.count() == 10
    assert calls["n"] == 1

    # resume=False: rebuild
    run_checkpointed(spark, wd, "s1", build, resume=False)
    assert calls["n"] == 2


def test_full_pipeline_resume(spark, corpus50, tmp_path):
    wd = str(tmp_path / "run")
    r1 = run_pipeline(spark, corpus50, wd)
    n_triples = r1["triples"].count()
    n_nodes = r1["nodes"].count()
    assert n_triples > 0 and n_nodes > 0
    for stage in ["mentions", "triples", "nodes", "edge_provenance", "edges"]:
        assert stage_complete(wd, stage)

    # resume from snapshots: same results without recompute (pass a corpus
    # that would fail if evaluated)
    bad = corpus50.filter("1=0")
    r2 = run_pipeline(spark, bad, wd)
    assert r2["triples"].count() == n_triples
    assert r2["nodes"].count() == n_nodes


def test_edges_aggregate_hot_entity(spark, corpus50, tmp_path):
    wd = str(tmp_path / "run2")
    r = run_pipeline(spark, corpus50, wd)
    edges = {(e.subj, e.pred, e.obj): e.n_docs for e in r["edges"].collect()}
    hot = [(k, v) for k, v in edges.items() if k[2] == "shared_util" and k[1] == "calls"]
    assert hot, "hot entity shared_util must appear as a call target"


def test_edge_provenance_carries_sha_invariant(spark, corpus50, docs50, tmp_path):
    """The graph layer keeps the input_hint sha256 invariant: every
    edge_provenance row's sha256 equals sha256(content) of its source
    document, and the edges table is exactly the provenance aggregation
    (so every edge is auditable back to document contents)."""
    import hashlib

    wd = str(tmp_path / "run3")
    r = run_pipeline(spark, corpus50, wd)
    sha_by_id = {d.doc_id: hashlib.sha256(d.content.encode()).hexdigest() for d in docs50}
    prov = r["edge_provenance"].collect()
    assert prov
    for row in prov:
        assert row.sha256 == sha_by_id[row.doc_id], row
    # edges == groupBy of provenance (same keys, same doc counts)
    from collections import Counter

    agg = Counter((p.subj, p.pred, p.obj) for p in prov)
    edges = {(e.subj, e.pred, e.obj): e.n_docs for e in r["edges"].collect()}
    assert edges == dict(agg)


def test_per_partition_lineage_and_audit(spark, tmp_path):
    """North rule: per-partition lineage + metrics. Each stage records one
    row per output file (rows, content fingerprint); audit_stage diffs a
    re-fingerprint of the snapshot against the record (clean snapshot ->
    empty diff; corrupted snapshot -> the damaged file surfaces)."""
    from theta_spark.pipeline import audit_stage, run_checkpointed, stage_lineage

    wd = str(tmp_path)
    run_checkpointed(
        spark, wd, "s1",
        lambda: spark.range(1000).selectExpr("id AS x", "id % 7 AS y").repartition(4),
    )
    lin = stage_lineage(spark, wd, "s1")
    rows = lin.collect()
    assert len(rows) == 4, [r.file for r in rows]
    assert sum(r.rows_out for r in rows) == 1000
    assert all(r.fingerprint is not None for r in rows)
    assert audit_stage(spark, wd, "s1").count() == 0

    # corrupt one data file -> audit flags exactly the damaged partitions
    import glob
    import os

    victim = sorted(glob.glob(os.path.join(wd, "s1", "part-*.parquet")))[0]
    os.remove(victim)
    bad = audit_stage(spark, wd, "s1").collect()
    assert len(bad) >= 1


def test_empty_corpus_pipeline_and_resume(spark, tmp_path):
    """A corpus yielding zero mentions must produce empty (but readable)
    stage snapshots — including the PARTITIONED nodes/edges stages, whose
    zero-row write emits no parquet data files (schema comes from the
    manifest) — and resume cleanly."""
    from theta_spark.config import PipelineConfig
    from theta_spark.corpus import CORPUS_SCHEMA
    from theta_spark.pipeline import run_pipeline

    rows = [("r", "a.py", "c1", "python", "   \n\n  "), ("r", "b.py", "c2", "python", "#")]
    corpus = spark.createDataFrame(rows, CORPUS_SCHEMA)
    wd = str(tmp_path / "wd")
    stages = run_pipeline(spark, corpus, wd, PipelineConfig(), resume=False)
    assert {k: v.count() for k, v in stages.items()} == {
        "mentions": 0, "triples": 0, "nodes": 0, "canon_map": 0,
        "edge_provenance": 0, "edges": 0,
        # the scored-docs registry still records both docs: zero-yield docs
        # are exactly what it exists to witness (incremental delta)
        "scored_docs": 2,
    }
    resumed = run_pipeline(spark, corpus, wd, PipelineConfig(), resume=True)
    assert resumed["edges"].count() == 0
    assert set(resumed["edges"].columns) == {"subj", "pred", "obj", "n_docs"}
    # lineage audit works on the empty partitioned snapshot too
    from theta_spark.pipeline import audit_stage

    assert audit_stage(spark, wd, "edges").count() == 0
