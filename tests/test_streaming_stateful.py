"""Watermarked windowed aggregation + applyInPandasWithState
sessionization (streaming/stateful.py): cross-batch state carry on a
multi-file stream, batch/stream equivalence, and the timeout flush."""

import pandas as pd

from theta_spark.streaming.stateful import (
    _session_walk,
    sessionize_stream,
    windowed_event_counts,
)

EV_SCHEMA = "user_id bigint, ts string, event_id bigint, event_type string"


def _events(spark):
    # user 1: two sessions (gap at 02:00), then a far-future sentinel that
    # closes the second; user 2: one session closed by its sentinel.
    rows = [
        (1, "2024-01-01 00:00:00", 1, "a"),
        (1, "2024-01-01 00:10:00", 2, "a"),
        (1, "2024-01-01 02:00:00", 3, "b"),
        (1, "2024-01-01 02:05:00", 4, "b"),
        (2, "2024-01-01 00:00:00", 5, "a"),
        (2, "2024-01-01 00:20:00", 6, "b"),
        # user 3: one event in the FIRST micro-batch only — its session can
        # close only via the event-time timeout, after OTHER users' later
        # events advance the global watermark past last+gap (regression
        # guard: a timeout must be registered even when the registering
        # batch's watermark is still 0)
        (3, "2024-01-01 00:00:00", 9, "a"),
        # sentinels: far enough ahead that every real session closes by
        # gap-crossing inside the walk (their own sessions stay open: the
        # watermark = global-max-ts - delay can never pass THEIR last+gap)
        (1, "2024-06-01 00:00:00", 7, "z"),
        (2, "2024-06-01 00:00:00", 8, "z"),
    ]
    return spark.createDataFrame(rows, EV_SCHEMA)


EXPECTED_SESSIONS = {
    # (user_id, n_events, first_event)
    (1, 2, 1),  # 00:00-00:10
    (1, 2, 3),  # 02:00-02:05
    (2, 2, 5),  # 00:00-00:20
}
# user 3's lone session closes by timeout in the STREAM run only (batch
# mode has no watermark; its tail stays open there)
TIMEOUT_SESSION = (3, 1, 9)


def test_sessionize_batch_emits_closed_sessions(spark):
    got = {
        (r.user_id, r.n_events, r.first_event)
        for r in sessionize_stream(_events(spark), gap_sec=1800).collect()
    }
    assert got == EXPECTED_SESSIONS


def test_sessionize_stream_carries_state_across_batches(spark, tmp_path):
    """Each parquet file becomes its own micro-batch (maxFilesPerTrigger=1)
    in arrival order; sessions spanning files must still close correctly,
    proving the state survives between batches."""
    df = _events(spark)
    src = str(tmp_path / "src")
    # file-per-slice, written in time order; option latestFirst stays off so
    # Spark picks them up oldest-modified-first
    import time

    slices = [
        df.filter("event_id in (1, 2, 5, 9)"),
        df.filter("event_id in (3, 6)"),
        df.filter("event_id in (4, 7, 8)"),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(f"{src}/f{i}")
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    stream = (
        spark.readStream.schema(_events(spark).schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )
    out = sessionize_stream(stream, gap_sec=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.n_events, r.first_event)
        for r in spark.sql("select * from sessions_out").collect()
    }
    # every gap-closed session emitted exactly once; user 3's lone session
    # MUST have been flushed by the event-time timeout (its timeout was
    # registered in batch 1 while the watermark was still 0, and fired
    # after the sentinels advanced the watermark); the sentinels' own tail
    # sessions stay open (the watermark never passes the global max ts)
    assert EXPECTED_SESSIONS | {TIMEOUT_SESSION} == got, got


def test_timeout_flushes_open_session():
    """Watermark passes gap beyond the open session's last event -> the
    tail is emitted and state cleared (no buffered events remain)."""

    class TimedOutState:
        hasTimedOut = True
        exists = True
        get = (100, 200, 3, 42, [], [])  # open session, empty buffer
        removed = False

        def remove(self):
            self.removed = True

        def getCurrentWatermarkMs(self):
            return (200 + 1800 + 1) * 1000  # gap passed

    st = TimedOutState()
    frames = list(_session_walk((7,), [], st, 1800))
    assert st.removed
    assert len(frames) == 1
    assert frames[0].iloc[0].tolist() == [7, 100, 200, 3, 42]


def test_timeout_finalizes_buffered_events_in_event_time():
    """A timeout with buffered events walks the ones at/below the
    watermark in EVENT-time order, closes gap-separated sessions, keeps
    the still-open tail + above-watermark remainder in state."""

    class St:
        hasTimedOut = True
        exists = True
        # buffered out of arrival order: 5000 arrived before 100/200
        get = (None, None, 0, None, [5000, 100, 200], [13, 11, 12])
        updated = None

        def remove(self):
            raise AssertionError("state must be kept (open tail + buffer)")

        def update(self, value):
            self.updated = value

        def setTimeoutTimestamp(self, ms):
            self.timeout_ms = ms

        def getCurrentWatermarkMs(self):
            return 5000 * 1000  # events <= 5000s are final

    st = St()
    frames = list(_session_walk((7,), [], st, gap := 1800))
    # events 100, 200 form one session (closed by the 5000s event's gap);
    # the 5000s event stays as the open tail
    assert len(frames) == 1
    assert frames[0].iloc[0].tolist() == [7, 100, 200, 2, 11]
    start, last, n, first_event, buf_ts, buf_eid = st.updated
    assert (start, last, n, first_event) == (5000, 5000, 1, 13)
    assert buf_ts == [] and buf_eid == []
    assert st.timeout_ms == (5000 + gap + 1) * 1000


def test_sessionize_stream_out_of_order_matches_batch(spark, tmp_path):
    """THE event-time correctness case: within-watermark events arriving a
    micro-batch AFTER newer events must sessionize exactly like the batch
    walk over globally time-sorted rows — both the session split and
    first_event identity. Arrival-order walks get both wrong (user 6's
    03:00 event arriving first would absorb the 00:00 event into one
    backwards session; user 5's first_event would be the later-timestamped
    arrival)."""
    import time

    rows = [
        # user 5: one session, events arrive newest-first across batches
        (5, "2024-01-01 00:10:00", 11, "a"),   # batch 0
        (5, "2024-01-01 00:00:00", 10, "a"),   # batch 1 (older ts!)
        # user 6: two gap-separated sessions, newest-first arrival
        (6, "2024-01-01 03:00:00", 21, "a"),   # batch 0
        (6, "2024-01-01 00:00:00", 20, "a"),   # batch 1 (older ts!)
        # sentinels advance the watermark far past everything real
        (5, "2024-06-01 00:00:00", 98, "z"),   # batch 2
        (6, "2024-06-01 00:00:00", 99, "z"),   # batch 2
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    src = str(tmp_path / "ooo_src")
    slices = [
        df.filter("event_id in (11, 21)"),
        df.filter("event_id in (10, 20)"),
        df.filter("event_id in (98, 99)"),
    ]
    for i, s in enumerate(slices):
        s.coalesce(1).write.parquet(f"{src}/f{i}")
        time.sleep(1.1)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", True)
        .parquet(src)
    )
    # 30-day watermark: the out-of-order arrivals must be IN-watermark late
    # (the contract under test); with the default 1h bound the 00:00 events
    # would be dropped as too-late once the 03:00 event advanced the
    # watermark, which is correct but a different scenario
    q = (
        sessionize_stream(stream, gap_sec=1800, watermark="30 days")
        .writeStream.format("memory")
        .queryName("ooo_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ooo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.sql(
            "select user_id, session_start, session_end, n_events, first_event from ooo_sessions"
        ).collect()
    }
    batch_twin = {
        tuple(r)
        for r in sessionize_stream(df, gap_sec=1800)
        .select("user_id", "session_start", "session_end", "n_events", "first_event")
        .collect()
    }
    assert got == batch_twin, (got, batch_twin)
    # and the specific event-time facts an arrival-order walk gets wrong:
    by_user_first = {(r[0], r[4]) for r in got}
    assert (5, 10) in by_user_first          # first_event is the EARLIEST ts
    assert {r[0] for r in got} == {5, 6}
    assert len([r for r in got if r[0] == 6]) == 2  # the gap split survived


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    df = _events(spark)
    src = str(tmp_path / "wsrc")
    df.write.parquet(src)
    expected = {
        (r.window_start, r.event_type, r.n_events)
        for r in windowed_event_counts(df, "10 minutes").collect()
    }

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = windowed_event_counts(stream, "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "wckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type, r.n_events)
        for r in spark.sql("select * from win_out").collect()
    }
    assert got == expected
