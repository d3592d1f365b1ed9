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
# open-session walk state + the event-time buffer: events above the
# watermark wait here (as parallel ts/event_id arrays) until the watermark
# passes them, so cross-batch out-of-order arrivals sessionize in EVENT
# time, not arrival order
_STATE_SCHEMA = (
    "start long, last long, n long, first_event long, "
    "buf_ts array<long>, buf_eid array<long>"
)


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


_SESSION_COLS = ["user_id", "session_start", "session_end", "n_events", "first_event"]


def _walk_sorted(user_id, events, start, last, n, first_event, gap: int):
    """The pure gaps-and-islands walk over time-ordered events: a row more
    than `gap` after `last` closes the open session and opens a new one.
    Returns (closed session tuples, open-session state)."""
    out = []
    for ts_s, eid in events:
        if last is not None and ts_s - last > gap:
            out.append((user_id, start, last, n, first_event))
            start, n, first_event = None, 0, None
        if start is None:
            start, first_event = ts_s, eid
        last = ts_s
        n += 1
    return out, (start, last, n, first_event)


def _session_walk(key, pdfs, state, gap: int) -> Iterator[pd.DataFrame]:
    """Per-user EVENT-TIME session walk. New rows first land in a state
    buffer; only events at or below the current watermark are walked (in
    (ts, event_id) order) — Spark guarantees no later-arriving row can
    have a smaller event time than the watermark, so the walked prefix is
    final and a within-watermark out-of-order arrival in a LATER
    micro-batch sessionizes exactly as the batch twin would (arrival order
    is irrelevant). The open session is flushed once the watermark passes
    `gap` beyond its last event — at that point no admissible event can
    extend it; buffered events above the watermark wake the key via an
    event-time timeout when the watermark reaches them."""
    (user_id,) = key

    if state.exists:
        start, last, n, first_event, buf_ts, buf_eid = state.get
        buf = list(zip(buf_ts, buf_eid))
    else:
        start = last = first_event = None
        n = 0
        buf = []

    if not state.hasTimedOut:
        for pdf in pdfs:
            buf.extend(zip((int(t) for t in pdf["_ts_s"]), (int(e) for e in pdf["event_id"])))
    buf.sort()

    wm_s = state.getCurrentWatermarkMs() // 1000
    final = [ev for ev in buf if ev[0] <= wm_s]
    buf = buf[len(final):]
    out, (start, last, n, first_event) = _walk_sorted(
        user_id, final, start, last, n, first_event, gap
    )
    if last is not None and wm_s - last > gap:
        # no admissible event can extend the open session: every buffered
        # event and every future arrival has ts > wm > last + gap
        out.append((user_id, start, last, n, first_event))
        start = last = first_event = None
        n = 0

    if last is None and not buf:
        if state.exists:
            state.remove()
    else:
        state.update((start, last, n, first_event,
                      [t for t, _ in buf], [e for _, e in buf]))
        # wake when the watermark next crosses a decision point: the
        # earliest buffered event (to finalize it) or gap past the open
        # session's last event (to flush the tail). Registered
        # UNCONDITIONALLY — during the FIRST micro-batch the watermark is
        # still 0 and a timeout never registered never fires. The
        # max(.., wm_s + 1) keeps it strictly above the current watermark
        # (required by EventTimeTimeout).
        wake = []
        if buf:
            wake.append(buf[0][0] + 1)
        if last is not None:
            wake.append(last + gap + 1)
        state.setTimeoutTimestamp(max(min(wake), wm_s + 1) * 1000)
    if out:
        yield pd.DataFrame(out, columns=_SESSION_COLS)


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, ts, event_id) stream -> COMPLETED sessions
    (user_id, session_start, session_end, n_events, first_event) via
    applyInPandasWithState — the streaming twin of the batch
    `d3_gaps_islands` query, EVENT-TIME correct across micro-batches:
    events buffer in state until the watermark passes them, so a
    within-watermark late event arriving a batch after a newer one still
    sessionizes exactly as the batch walk over globally time-sorted rows
    (tested: tests/test_streaming_stateful.py cross-batch out-of-order
    equivalence). A session is emitted once the watermark passes its
    closing gap (or the event-time timeout flushes the open tail); the
    open tail below watermark+gap stays in state — exactly the semantics
    a resumable streaming sessionizer must have.

    State size per user is the open session tuple plus only the events
    inside the watermark delay (bounded by the lateness bound x event
    rate), partitioned horizontally on user_id like any groupBy.

    Also runs on a BATCH DataFrame (applyInPandasWithState is
    streaming-only, so the batch path runs the SAME pure walk over the
    complete sorted history via applyInPandas): emits every session except
    each user's open tail — the equivalence test compares this against
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
        (user_id,) = key
        pdf = pdf.sort_values(["_ts_s", "event_id"])
        events_sorted = zip((int(t) for t in pdf["_ts_s"]), (int(e) for e in pdf["event_id"]))
        closed, _open_tail = _walk_sorted(user_id, events_sorted, None, None, 0, None, gap_sec)
        if closed:
            return pd.DataFrame(closed, columns=_SESSION_COLS)
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in _SESSION_COLS})

    return base.groupBy("user_id").applyInPandas(batch_func, SESSION_SCHEMA)
