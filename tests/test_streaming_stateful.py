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
    class TimedOutState:
        hasTimedOut = True
        exists = True
        get = (100, 200, 3, 42)
        removed = False

        def remove(self):
            self.removed = True

    st = TimedOutState()
    frames = list(_session_walk((7,), [], st, 1800))
    assert st.removed
    assert len(frames) == 1
    assert frames[0].iloc[0].tolist() == [7, 100, 200, 3, 42]


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
