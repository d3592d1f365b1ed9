"""P6 train-path label encoding (reference theta/nlp/tasks/task_ner.py:131-166).

The training-data export a user of a training pipeline needs: gold tags
(category_id, doc-global char span) projected into each sliding-window
segment as per-token start_ids/end_ids arrays —

    start_ids[char2token[tag.start - s_seg]] = category_id
    end_ids[char2token[tag.end   - s_seg]] = category_id

using the P5 offset maps (task_ner.py:42-65), with a tag contributing only
when its span lies fully inside the segment: a tag cut by the window edge
is skipped there and recovered whole from the 50%-overlap neighbor
(task_ner.py:149-160 boundary checks).

Spark shape: tag->segment assignment is a containment join (the same
SURVEY.md §2.12 shape as p4_interval_containment) followed by one
per-segment grouping shuffle; only the tokenizer-dependent encode runs in
the shared Arrow stage (tokenize_with_offsets / offset_maps — the same
code the inference path uses, so train and inference can never disagree
about tokenization). Output arrays are segment-local and length n_tokens,
ready to collate into training tensors.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENCODED_SCHEMA = (
    "doc_id long, seg_id int, s_seg int, n_tokens int, "
    "start_ids array<int>, end_ids array<int>"
)


def encode_labels(segs: DataFrame, tags: DataFrame) -> DataFrame:
    """segments(doc_id, seg_id, s_seg, seg_text) x tags(doc_id,
    category_id, start, end [doc-global chars, end inclusive]) ->
    (doc_id, seg_id, s_seg, n_tokens, start_ids, end_ids).

    Every segment emits a row (untagged segments get all-zero arrays); a
    tag is encoded into every segment that fully contains it. Tag chars
    not covered by a token (char2token = -1) are skipped — tags are
    expected to align with token boundaries, as the reference's
    char-offset gold does."""
    s = segs.select("doc_id", "seg_id", "s_seg", "seg_text")
    t = tags.select(
        F.col("doc_id").alias("t_doc_id"), "category_id",
        F.col("start").alias("t_start"), F.col("end").alias("t_end"),
    )
    joined = s.join(
        t,
        (s["doc_id"] == t["t_doc_id"])
        & (t["t_start"] >= s["s_seg"])
        & (t["t_end"] <= s["s_seg"] + F.length(s["seg_text"]) - 1),
        "left",
    )
    grouped = joined.groupBy("doc_id", "seg_id", "s_seg", "seg_text").agg(
        F.collect_list(F.struct("category_id", "t_start", "t_end")).alias("seg_tags")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from theta_spark.operators.scoring import offset_maps, tokenize_with_offsets

        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "seg_id", "s_seg", "n_tokens", "start_ids", "end_ids")}
            for doc_id, seg_id, s_seg, seg_text, seg_tags in zip(
                pdf["doc_id"], pdf["seg_id"], pdf["s_seg"], pdf["seg_text"], pdf["seg_tags"]
            ):
                tokens, _, _ = tokenize_with_offsets(seg_text)
                n = len(tokens)
                char2token, _ = offset_maps(seg_text)
                start_ids = np.zeros(n, dtype=np.int32)
                end_ids = np.zeros(n, dtype=np.int32)
                for tag in seg_tags:
                    cat, gs, ge = tag["category_id"], tag["t_start"], tag["t_end"]
                    if cat is None:  # left-join null: segment has no tags
                        continue
                    # Arrow hands struct fields over as nullable (possibly
                    # float) scalars — force int before indexing
                    ti = char2token[int(gs) - int(s_seg)]
                    tj = char2token[int(ge) - int(s_seg)]
                    if ti < 0 or tj < 0:
                        continue
                    start_ids[ti] = cat
                    end_ids[tj] = cat
                out["doc_id"].append(doc_id)
                out["seg_id"].append(seg_id)
                out["s_seg"].append(s_seg)
                out["n_tokens"].append(n)
                out["start_ids"].append(start_ids.tolist())
                out["end_ids"].append(end_ids.tolist())
            yield pd.DataFrame(out)

    return grouped.mapInPandas(run, ENCODED_SCHEMA)
