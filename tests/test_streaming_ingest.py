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
