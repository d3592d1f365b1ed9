"""Structured Streaming operators: watermarked windowed aggregation and
custom stateful sessionization.

The reference is batch-only (SURVEY.md §2.11), so these are the
Spark-first *additions* a streaming deployment of the engine needs:
events arriving as a stream (commit firehose, telemetry) get event-time
windowed aggregates with late-data handling, and gaps-and-islands
sessionization — the streaming twin of the batch `d3_gaps_islands`
query — as an `applyInPandasWithState` operator carrying per-user state
across micro-batches.

Scale shape: both operators shuffle once on their grouping key
(window/event_type, user_id) and hold state proportional to the number
of OPEN groups, not the stream length; the state store is per-partition
and checkpoint-backed on a cluster, so 10^9 users partition horizontally
exactly like a batch groupBy.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

SESSION_SCHEMA = (
    "user_id bigint, session_start long, session_end long, n_events bigint, first_event bigint"
)
_STATE_SCHEMA = "start long, last long, n long, first_event long"


def windowed_event_counts(
    events: DataFrame,
    window_dur: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """(ts, event_type, ...) stream -> (window_start, event_type, n_events):
    event-time tumbling (or sliding, when `slide` is given) window counts
    with a watermark bounding how late data may arrive. Works identically
    on a batch DataFrame (the watermark is skipped there), which is what
    the batch-equivalence test exploits."""
    ts = F.col(ts_col).cast("timestamp_ltz")
    win = F.window(ts, window_dur, slide) if slide else F.window(ts, window_dur)
    base = events.withColumn("_ts", ts)
    if events.isStreaming:
        base = base.withWatermark("_ts", watermark)
    return (
        base.groupBy(win.alias("window"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").cast("long").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def _session_walk(key, pdfs, state, gap: int) -> Iterator[pd.DataFrame]:
    """Per-user session walk. State = (start, last, n, first_event) of the
    OPEN session; a row more than `gap` after `last` closes the open
    session (emitted) and opens a new one. Rows are sorted per micro-batch
    (in-order within a batch; cross-batch order is arrival order — the
    standard stateful-streaming contract, with late rows a watermark
    concern). On event-time timeout (watermark passed gap beyond the last
    event) the open session is flushed and state cleared."""
    (user_id,) = key
    cols = ["user_id", "session_start", "session_end", "n_events", "first_event"]

    if state.hasTimedOut:
        if state.exists:
            start, last, n, first_event = state.get
            state.remove()
            yield pd.DataFrame([(user_id, start, last, n, first_event)], columns=cols)
        return

    if state.exists:
        start, last, n, first_event = state.get
    else:
        start = last = first_event = None
        n = 0

    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["_ts_s", "event_id"])
        for ts_s, eid in zip(pdf["_ts_s"], pdf["event_id"]):
            ts_s, eid = int(ts_s), int(eid)
            if last is not None and ts_s - last > gap:
                out.append((user_id, start, last, n, first_event))
                start, n, first_event = None, 0, None
            if start is None:
                start, first_event = ts_s, eid
            last = ts_s
            n += 1
    state.update((start, last, n, first_event))
    # flush the open session once the watermark passes gap beyond its last
    # event. Registered UNCONDITIONALLY (not only when the watermark is
    # already nonzero): during the FIRST micro-batch the watermark is still
    # 0, and a timeout never registered never fires — a user whose events
    # all arrive in that batch would otherwise keep an open tail forever.
    # The timestamp always exceeds the current watermark (required by
    # EventTimeTimeout) because rows below the watermark are dropped before
    # this operator, so last >= watermark here.
    state.setTimeoutTimestamp((last + gap + 1) * 1000)
    if out:
        yield pd.DataFrame(out, columns=cols)


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, ts, event_id) stream -> COMPLETED sessions
    (user_id, session_start, session_end, n_events, first_event) via
    applyInPandasWithState — the streaming twin of the batch
    `d3_gaps_islands` query. A session closes when its user's next event
    is > gap_sec later (emitted immediately) or when the watermark passes
    gap_sec beyond its last event (event-time timeout flush). The open
    tail session per user stays in state until one of those happens —
    exactly the semantics a resumable streaming sessionizer must have.

    Also runs on a BATCH DataFrame (applyInPandasWithState is
    streaming-only, so the batch path reuses the SAME walk through
    applyInPandas with a stub state): emits every session except each
    user's open tail — the equivalence test compares this against
    `d3_gaps_islands` directly."""
    ts = F.col(ts_col).cast("timestamp_ltz")
    base = events.withColumn("_ts", ts).withColumn("_ts_s", F.col("_ts").cast("long"))

    if events.isStreaming:
        def func(key, pdfs, state):
            return _session_walk(key, pdfs, state, gap_sec)

        base = base.withWatermark("_ts", watermark)
        return base.groupBy("user_id").applyInPandasWithState(
            func, SESSION_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )

    def batch_func(key, pdf):
        frames = list(_session_walk(key, [pdf], _BatchState(), gap_sec))
        if frames:
            return pd.concat(frames, ignore_index=True)
        return pd.DataFrame(
            {
                c: pd.Series(dtype="int64")
                for c in ["user_id", "session_start", "session_end", "n_events", "first_event"]
            }
        )

    return base.groupBy("user_id").applyInPandas(batch_func, SESSION_SCHEMA)


class _BatchState:
    """Stub GroupState for the batch path of sessionize_stream: no prior
    state, no timeout, updates discarded (the open tail stays unemitted,
    matching the streaming append semantics before any timeout)."""

    hasTimedOut = False
    exists = False

    def update(self, value):
        self.value = value

    def remove(self):  # pragma: no cover - never hit without timeouts
        pass

    def setTimeoutTimestamp(self, ms):
        pass
