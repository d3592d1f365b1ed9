"""Sliding-window segmentation (SURVEY.md W1/W2) as pure column expressions.

Reference semantics (theta/nlp/tasks/task_ner.py:183-233):
    seg_len = max_length - 2; seg_stride = seg_len // 2
    offsets 0, stride, 2*stride, ... while offset < len(text)
    seg_text = text[s_seg : s_seg + seg_len]

Implemented with F.sequence + posexplode + substring — no Python loop, no
UDF; Catalyst sees a narrow fan-out and the parquet scan keeps pushdown.
`F.sequence(0, length-1, stride)` yields exactly the reference's offsets
because its last element is the largest multiple of stride <= length-1,
i.e. the last offset with offset < len(text).

The reference stores e_seg = min(s_seg+seg_len-1, len(seg_text)-1)
(task_ner.py:188-193) — a latent quirk (correct only for s_seg=0, and only
consumed on the training path). We store the true inclusive end
s_seg + len(seg_text) - 1; the differential harness mirrors the engine's
observable outputs, which do not depend on the quirk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def segment(df: DataFrame, text_col: str = "text", seg_len: int = 126, seg_stride: int = 63) -> DataFrame:
    """df(..., text) -> df(..., seg_id, s_seg, e_seg, seg_text); 1 row per window."""
    offsets = F.sequence(F.lit(0), F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)), F.lit(seg_stride))
    seg = df.select(
        "*",
        F.posexplode(offsets).alias("seg_id", "s_seg"),
    ).withColumn(
        "seg_text", F.substring(F.col(text_col), F.col("s_seg") + 1, seg_len)
    )
    return seg.withColumn("e_seg", F.col("s_seg") + F.length("seg_text") - 1).filter(
        F.length("seg_text") > 0
    )


def clean_text(col, strip: bool = True, collapse_ws: bool = False):
    """P1 (templates/ner/ner_data.py:12-20, README.md:162-165): normalize
    text before encoding. Offsets shift with edits, so the default is the
    reference's conservative strip-only behavior. Python str.strip()
    removes ALL whitespace (Spark's trim only spaces), so strip is a
    regexp over \\s at both ends."""
    out = (
        F.regexp_replace(F.regexp_replace(col, r"^\s+", ""), r"\s+$", "") if strip else col
    )
    if collapse_ws:
        out = F.regexp_replace(out, r"[ \t]+", " ")
    return out


def filter_no_entity_segments(seg_df: DataFrame, preserve_no_entity: bool = False, tags_col: str = "seg_tags") -> DataFrame:
    """W4 (task_ner.py:220-226, flag at arguments.py:122-126): on the
    training-encode path, drop segments containing no tags unless the
    preserve flag is set."""
    if preserve_no_entity:
        return seg_df
    return seg_df.filter(F.size(F.col(tags_col)) > 0)


def project_tags_into_segments(seg_df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """P4 (task_ner.py:196-218): keep tags fully inside [s_seg, e_seg],
    shifting starts into the segment frame. `tags` is
    array<struct<category:string, start:int, mention:string>>."""
    inside = F.filter(
        F.col(tags_col),
        lambda t: (t["start"] >= F.col("s_seg"))
        & (t["start"] + F.length(t["mention"]) - 1 <= F.col("e_seg")),
    )
    shifted = F.transform(
        inside,
        lambda t: F.struct(
            t["category"].alias("category"),
            (t["start"] - F.col("s_seg")).cast("int").alias("start"),
            t["mention"].alias("mention"),
        ),
    )
    return seg_df.withColumn("seg_tags", shifted)
