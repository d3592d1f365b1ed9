"""Fused tokenize+score+decode stage as a mapInPandas over segments.

This is the engine's single Python compute stage (SURVEY.md §2.14): one
doc-segment row in -> N mention rows out, Arrow-batched, no per-row Spark
UDFs. The heavy lifting per batch is numpy inside
theta_spark.operators.scoring; a real transformer model slots in behind the
same (seg_texts -> spans) contract (reference model heads M1-M9,
theta/nlp/tasks/task_ner.py:348-445, theta/nlp/tasks/ner_models.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from theta_spark.operators.scoring import extract_mentions

MENTION_RAW_SCHEMA = (
    "doc_id string, seg_id int, s_seg int, category_id int, "
    "start int, end int, mention string, indent int"
)


def score_and_decode(seg_df: DataFrame, confidence: float = 0.0) -> DataFrame:
    """segments(doc_id, seg_id, s_seg, seg_text) -> raw mentions in the
    *segment* frame (start/end are seg-local char offsets)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "seg_id": [], "s_seg": [], "category_id": [],
                "start": [], "end": [], "mention": [], "indent": [],
            }
            for doc_id, seg_id, s_seg, seg_text in zip(
                pdf["doc_id"], pdf["seg_id"], pdf["s_seg"], pdf["seg_text"]
            ):
                for cat, cs, ce, mention, indent in extract_mentions(
                    seg_text, confidence, visible_start=(s_seg == 0)
                ):
                    out["doc_id"].append(doc_id)
                    out["seg_id"].append(seg_id)
                    out["s_seg"].append(s_seg)
                    out["category_id"].append(cat)
                    out["start"].append(cs)
                    out["end"].append(ce)
                    out["mention"].append(mention)
                    out["indent"].append(indent)
            yield pd.DataFrame(out)

    cols = seg_df.select("doc_id", "seg_id", "s_seg", "seg_text")
    return cols.mapInPandas(run, MENTION_RAW_SCHEMA)
