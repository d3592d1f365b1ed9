"""Streaming composition (completeness note + foreachBatch bridge).

The reference is batch-only — SURVEY.md §2.11: no watermarks, event-time
windows, or stateful operators exist anywhere in the snapshot; its only
"windows" are the text sliding windows of §2.3, and resumability is
checkpoint/snapshot-based. The north rule therefore requires no Structured
Streaming.

For pipelines that *arrive* as streams (e.g. a commit firehose feeding the
corpus table), the batch stages compose unchanged under foreachBatch: each
micro-batch is a corpus DataFrame, and `attach_stream` appends mentions +
triples to the same snapshot layout `run_pipeline` resumes from.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from theta_spark.config import PipelineConfig
from theta_spark.operators.triples import assemble_triples
from theta_spark.pipeline import extract_mentions_df


def process_corpus_batch(batch_df: DataFrame, out_dir: str, cfg: PipelineConfig | None = None) -> None:
    """foreachBatch body: corpus micro-batch -> append mentions + triples
    parquet under `out_dir` (same layout as run_pipeline stages)."""
    cfg = cfg or PipelineConfig()
    mentions = extract_mentions_df(batch_df, cfg)
    mentions.write.mode("append").parquet(f"{out_dir}/mentions")
    assemble_triples(mentions).write.mode("append").parquet(f"{out_dir}/triples")


def attach_stream(corpus_stream: DataFrame, out_dir: str, checkpoint_dir: str, cfg: PipelineConfig | None = None):
    """corpus readStream -> writeStream.foreachBatch(extraction). Returns
    the StreamingQuery (caller awaits/stops). Exactly-once via the
    streaming checkpoint + idempotent per-batch parquet appends."""
    return (
        corpus_stream.writeStream.option("checkpointLocation", checkpoint_dir)
        .foreachBatch(lambda df, _epoch: process_corpus_batch(df, out_dir, cfg))
        .trigger(availableNow=True)
        .start()
    )
