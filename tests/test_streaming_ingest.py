"""Streaming incremental KG ingest (streaming/ingest.py): the streaming
twin of run_pipeline_incremental — registry-deduped epochs, keep-latest
supersede for changed docs, crash-replay idempotence, and the batch graph
finalize over the accumulated stream."""

from pyspark.sql import functions as F

from theta_spark.config import PipelineConfig
from theta_spark.corpus import CORPUS_SCHEMA, corpus_rows, generate_corpus
from theta_spark.pipeline import extract_triples
from theta_spark.streaming.ingest import (
    attach_stream_incremental,
    finalize_graph,
    process_corpus_batch_incremental,
    read_resolved_stage,
)


def _run_wave(spark, src, out, ckpt):
    stream = spark.readStream.schema(CORPUS_SCHEMA).parquet(src)
    q = attach_stream_incremental(stream, out, ckpt)
    q.awaitTermination(180)


def test_incremental_stream_two_waves(spark, tmp_path):
    docs = generate_corpus(15, seed=42)
    rows_v1 = corpus_rows(docs)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # wave 1: the full corpus v1
    spark.createDataFrame(rows_v1, schema=CORPUS_SCHEMA).write.mode("overwrite").parquet(src)
    _run_wave(spark, src, out, ckpt)
    reg0 = spark.read.parquet(out + "/scored_docs")
    assert reg0.count() == 15

    # wave 2: 1 changed doc (same repo/path/commit => same doc_id, new
    # sha), 1 changed-to-EMPTY doc (its v2 yields nothing), 1 brand-new
    # doc, 2 unchanged re-arrivals
    changed = rows_v1[0]
    changed_v2 = (changed[0], changed[1], changed[2], changed[3],
                  changed[4] + "\ndef extra_fn(x):\n    return x\n")
    emptied = rows_v1[1]
    emptied_v2 = (emptied[0], emptied[1], emptied[2], emptied[3], "# nothing here\n")
    new_doc = ("wave2repo", "brand_new.py", "c9", "python",
               "def wave_two_fn(a, b):\n    return a + b\n")
    wave2 = [changed_v2, emptied_v2, new_doc, rows_v1[2], rows_v1[3]]
    spark.createDataFrame(wave2, schema=CORPUS_SCHEMA).write.mode("append").parquet(src)
    _run_wave(spark, src, out, ckpt)

    # delta-proportional: epoch 1 scored ONLY the 2 changed + 1 new doc
    # (unchanged re-arrivals are anti-joined away by the registry)
    reg = spark.read.parquet(out + "/scored_docs")
    assert reg.where(F.col("epoch") == 1).count() == 3

    # keep-latest resolution equals a full batch recompute on the FINAL
    # corpus (14 unchanged v1 + changed v2 + emptied v2 + new doc)
    final_rows = [changed_v2, emptied_v2, new_doc] + rows_v1[2:]
    final_corpus = spark.createDataFrame(final_rows, schema=CORPUS_SCHEMA)
    want = {(r.subj, r.pred, r.obj, r.doc_id)
            for r in extract_triples(final_corpus, PipelineConfig()).collect()}
    got = {(r.subj, r.pred, r.obj, r.doc_id)
           for r in read_resolved_stage(spark, out, "triples")
           .select("subj", "pred", "obj", "doc_id").collect()}
    assert got == want

    # the changed-to-empty doc's v1 rows are SUPERSEDED, not resurrected
    # (resolution keys off the scored_docs registry, which witnesses the
    # zero-yield re-score; the triples table itself cannot)
    emptied_id = f"{emptied[0]}:{emptied[1]}@{emptied[2]}"
    assert not [t for t in got if t[3] == emptied_id]

    # graph finalize over the accumulated stream == batch graph layer on
    # the final corpus
    gdir = str(tmp_path / "graph")
    stages = finalize_graph(spark, out, gdir)
    from theta_spark.pipeline import build_nodes_edges, extract_mentions_df

    cfg = PipelineConfig()
    _, batch_edges, _ = build_nodes_edges(
        extract_triples(final_corpus, cfg), extract_mentions_df(final_corpus, cfg), cfg
    )
    cols = ["subj", "pred", "obj", "n_docs"]
    got_e = {tuple(r) for r in stages["edges"].select(*cols).collect()}
    want_e = {tuple(r) for r in batch_edges.select(*cols).collect()}
    assert got_e == want_e


def test_epoch_replay_idempotent_incremental(spark, tmp_path):
    """A crash-replayed epoch recomputes the SAME delta (prior registry is
    read strictly below the replayed epoch) and overwrites its own
    directories — no duplicates, no empty-delta erasure."""
    docs = generate_corpus(8, seed=3)
    out = str(tmp_path / "out")
    batch0 = spark.createDataFrame(corpus_rows(docs), schema=CORPUS_SCHEMA)
    process_corpus_batch_incremental(batch0, out, 0)
    n_triples = spark.read.parquet(out + "/triples").count()
    n_reg = spark.read.parquet(out + "/scored_docs").count()
    assert n_reg == 8 and n_triples > 0

    # replay epoch 0 verbatim: identical outputs, not empty (the epoch-0
    # registry rows must NOT mask epoch 0's own delta) and not doubled
    process_corpus_batch_incremental(batch0, out, 0)
    assert spark.read.parquet(out + "/triples").count() == n_triples
    assert spark.read.parquet(out + "/scored_docs").count() == n_reg

    # an unchanged corpus as epoch 1 scores nothing
    process_corpus_batch_incremental(batch0, out, 1)
    reg = spark.read.parquet(out + "/scored_docs")
    assert reg.where(F.col("epoch") == 1).count() == 0
    assert reg.count() == n_reg


def test_compact_epochs_preserves_registry_resolution_and_delta(spark, tmp_path):
    """~20 epochs, then compaction (VERDICT r4 #4): the stage roots shrink
    to O(1) directories while (a) resolved reads of every stage are
    unchanged, (b) the full (doc_id, sha256) registry pair set is unchanged
    — including NON-latest pairs, so a doc that REVERTS to an old content
    hash is still skipped — and (c) the next epoch computes the exact same
    delta as an uncompacted copy. Replay idempotence survives compaction."""
    import shutil

    from theta_spark.streaming.ingest import (
        _registry_epoch_dirs,
        compact_epochs,
    )

    docs = generate_corpus(16, seed=9)
    rows = corpus_rows(docs)

    def mutate(row, tag):
        return (row[0], row[1], row[2], row[3],
                row[4] + f"\ndef mutated_{tag}(x):\n    return x\n")

    out = str(tmp_path / "out")

    def run_epoch(target, epoch, wave):
        batch = spark.createDataFrame(wave, schema=CORPUS_SCHEMA)
        process_corpus_batch_incremental(batch, target, epoch)

    # epochs 0..13: introduce one new doc each plus a re-arrival of the
    # previous one; epochs 14..17: churn — doc0 v2, doc0 v3, doc1 v2,
    # doc2 v2 (so doc0 has TWO superseded pairs in the registry)
    doc0_v2, doc0_v3 = mutate(rows[0], "a"), mutate(rows[0], "b")
    doc1_v2, doc2_v2 = mutate(rows[1], "c"), mutate(rows[2], "d")
    for e in range(14):
        wave = [rows[e]] + ([rows[e - 1]] if e else [])
        run_epoch(out, e, wave)
    for e, wave in ((14, [doc0_v2, rows[5]]), (15, [doc0_v3]),
                    (16, [doc1_v2, rows[7]]), (17, [doc2_v2])):
        run_epoch(out, e, wave)

    def resolved(target):
        return {
            stage: {tuple(r) for r in read_resolved_stage(spark, target, stage).collect()}
            for stage in ("mentions", "triples", "scored_docs")
        }

    def pairs(target):
        return {(r.doc_id, r.sha256)
                for r in spark.read.parquet(target + "/scored_docs")
                .select("doc_id", "sha256").collect()}

    before_resolved, before_pairs = resolved(out), pairs(out)
    control = str(tmp_path / "control")
    shutil.copytree(out, control)

    stats = compact_epochs(spark, out, floor=18)
    assert stats["removed_dirs"] > 0

    # O(1) directories: exactly the two base slots (registry) / one (rows)
    assert _registry_epoch_dirs(spark, out, "scored_docs") == ["epoch=16", "epoch=17"]
    assert _registry_epoch_dirs(spark, out, "mentions") == ["epoch=17"]
    assert _registry_epoch_dirs(spark, out, "triples") == ["epoch=17"]

    assert resolved(out) == before_resolved
    assert pairs(out) == before_pairs

    # epoch 18 on both copies: 1 brand-new doc, 1 changed doc, 1 unchanged
    # re-arrival, and doc0 REVERTED to its superseded v2 content — the
    # hist slot must keep that pair so the revert is NOT re-scored
    new_doc = ("cmpct", "fresh.py", "c1", "python",
               "def fresh_fn(a):\n    return a\n")
    wave18 = [new_doc, mutate(rows[3], "e"), rows[4], doc0_v2]
    run_epoch(out, 18, wave18)
    run_epoch(control, 18, wave18)

    def epoch18(target):
        return {(r.doc_id, r.sha256)
                for r in spark.read.parquet(target + "/scored_docs")
                .where(F.col("epoch") == 18).collect()}

    got, want = epoch18(out), epoch18(control)
    assert got == want and len(got) == 2  # new + changed only
    assert resolved(out) == resolved(control)

    # replay idempotence after compaction
    run_epoch(out, 18, wave18)
    assert epoch18(out) == want
    assert resolved(out) == resolved(control)

    # recompacting with a higher floor folds the base again
    compact_epochs(spark, out, floor=19)
    assert _registry_epoch_dirs(spark, out, "scored_docs") == ["epoch=17", "epoch=18"]
    assert resolved(out) == resolved(control)
    assert pairs(out) == pairs(control)


def test_stream_cardinality_hll_matches_batch_and_survives_compaction(spark, tmp_path):
    """The per-epoch HLL register commits max-merge to the EXACT batch
    sketch over the full (doc_id, sha256) registry — after multi-wave
    ingest (adds + changes), after a replayed epoch, and after
    compaction folds the register epochs into one base table."""
    from theta_spark.functions.sketch import hll_estimate
    from theta_spark.streaming.ingest import (
        HLL_B,
        compact_epochs,
        read_stream_cardinality,
    )

    docs = generate_corpus(12, seed=7)
    rows_v1 = corpus_rows(docs)
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    spark.createDataFrame(rows_v1, schema=CORPUS_SCHEMA).write.mode("overwrite").parquet(src)
    _run_wave(spark, src, out, ckpt)
    ch = rows_v1[0]
    wave2 = [
        (ch[0], ch[1], ch[2], ch[3], ch[4] + "\ndef tail():\n    pass\n"),
        ("w2", "new.py", "c1", "python", "def f():\n    return 1\n"),
        rows_v1[1],  # unchanged re-arrival: no new version
    ]
    spark.createDataFrame(wave2, schema=CORPUS_SCHEMA).write.mode("append").parquet(src)
    _run_wave(spark, src, out, ckpt)

    def batch_expect():
        reg = spark.read.parquet(out + "/scored_docs").select("doc_id", "sha256").distinct()
        return hll_estimate(
            reg.select(F.concat_ws("|", "doc_id", "sha256").alias("vkey")), "vkey", b=HLL_B
        ).collect()[0]

    exp = batch_expect()
    assert exp.est >= 1  # 14 versions; HLL at m=256 lands near it
    got = read_stream_cardinality(spark, out).collect()[0]
    assert (got.s_scaled, got.est, got.v_empty) == (exp.s_scaled, exp.est, exp.v_empty)

    # replay epoch 1 (crash-redelivery): registers overwritten, same sketch
    wave2_df = spark.createDataFrame(wave2, schema=CORPUS_SCHEMA)
    process_corpus_batch_incremental(wave2_df, out, 1)
    got2 = read_stream_cardinality(spark, out).collect()[0]
    assert got2.s_scaled == exp.s_scaled

    # compaction folds register epochs into one base dir; estimate unmoved
    import os

    compact_epochs(spark, out, floor=2)
    assert os.listdir(out + "/hll_versions") != []
    dirs = [d for d in os.listdir(out + "/hll_versions") if d.startswith("epoch=")]
    assert dirs == ["epoch=1"]
    got3 = read_stream_cardinality(spark, out).collect()[0]
    assert (got3.s_scaled, got3.est) == (exp.s_scaled, exp.est)
