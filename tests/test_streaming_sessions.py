"""Stateful streaming sessionization test: state must stitch sessions
across micro-batches (separate stream restarts sharing a checkpoint),
matching the batch lag+cumsum twin's semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from music_streaming_etl_spark.streaming.sessions import start_session_stream

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").option(
        "header", True
    ).csv(path)


def test_sessions_stitch_across_batches(spark, tmp_path):
    stream_dir = str(tmp_path / "in")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 6, 25, 10, 0, 0)

    # batch 1: user 1 two close events; user 2 one event
    _write(
        spark,
        [(1, 1, t), (2, 1, t + dt.timedelta(minutes=5)), (3, 2, t)],
        stream_dir,
    )
    q = start_session_stream(spark, stream_dir, SCHEMA, target, ckpt)
    q.awaitTermination(120)
    out = {r["user_id"]: r for r in spark.read.parquet(target).collect()}
    assert out[1]["session_id"] == 0 and out[1]["n_events"] == 2
    assert out[2]["session_id"] == 0 and out[2]["n_events"] == 1

    # batch 2: user 1 event within gap (same session), then one far
    # beyond the gap (new session) — state must carry last_ts over
    _write(
        spark,
        [
            (4, 1, t + dt.timedelta(minutes=20)),
            (5, 1, t + dt.timedelta(hours=3)),
        ],
        stream_dir,
    )
    q2 = start_session_stream(spark, stream_dir, SCHEMA, target, ckpt)
    q2.awaitTermination(120)
    out2 = {r["user_id"]: r for r in spark.read.parquet(target).collect()}
    assert out2[1]["session_id"] == 1  # second session opened
    assert out2[1]["n_events"] == 1  # only the far event in it
    assert out2[2]["session_id"] == 0  # untouched user keeps state


def test_finalizing_sessions_emit_closed_on_watermark(spark, tmp_path):
    """EventTimeTimeout: a silent user's session closes (emitted once
    with closed=true, state freed) when the watermark passes
    last_ts + gap; active users keep streaming closed=false updates."""
    from music_streaming_etl_spark.streaming.sessions import (
        sessionize_stream_finalizing,
    )

    stream_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "rows")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 6, 25, 10, 0, 0)

    def drain():
        events = (
            spark.readStream.schema(SCHEMA)
            .option("header", True)
            .option("maxFilesPerTrigger", 1)
            .csv(stream_dir)
        )
        sess = sessionize_stream_finalizing(
            events, gap_seconds=1800, watermark_delay="10 minutes"
        )

        def sink(batch, _id):
            if not batch.isEmpty():
                batch.write.mode("append").parquet(out_dir)

        q = (
            sess.writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # batch 1: user 1 active; batch 2: only user 2, 3h later —
    # watermark jumps past user 1's gap end; batch 3 fires the timeout
    _write(spark, [(1, 1, t), (2, 1, t + dt.timedelta(minutes=5))], stream_dir)
    drain()
    _write(spark, [(3, 2, t + dt.timedelta(hours=3))], stream_dir)
    drain()
    _write(spark, [(4, 2, t + dt.timedelta(hours=3, minutes=1))], stream_dir)
    drain()

    rows = spark.read.parquet(out_dir).collect()
    closed = [r for r in rows if r["closed"] and r["user_id"] == 1]
    assert len(closed) == 1
    assert closed[0]["session_id"] == 0 and closed[0]["n_events"] == 2
    assert closed[0]["last_ts"] == t + dt.timedelta(minutes=5)
    # user 2 still open — no closed row for them
    assert not [r for r in rows if r["closed"] and r["user_id"] == 2]


def test_native_session_window_emits_closed_sessions(spark, tmp_path):
    """Engine-native session_window under a watermark: sessions merge
    gap-adjacent events server-side and emit once closed; a session
    still open at the watermark stays unemitted. Matches the batch
    sessionize_native [start, last+gap) close rule."""
    import time

    from music_streaming_etl_spark.streaming.sessions import (
        sessionize_stream_native,
    )

    stream_dir = str(tmp_path / "in")
    t0 = dt.datetime(2024, 6, 25, 10, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    # user 1: two events 10 min apart (one session), then a 40-min gap
    # event (second session). The late high-watermark event at +300
    # advances event time far enough to close everything.
    _write(
        spark,
        [
            (1, 1, ts(0)),
            (2, 1, ts(10)),
            (3, 1, ts(50)),
            (4, 2, ts(0)),
            (5, 99, ts(300)),  # watermark pusher
        ],
        stream_dir,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("header", True)
        .csv(stream_dir)
    )
    out = sessionize_stream_native(stream, gap="30 minutes", watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("native_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # one more empty-ish trigger so the advanced watermark finalizes
        _write(spark, [(6, 99, ts(301))], stream_dir)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.sql("SELECT * FROM native_sessions").collect()
    }
    # user 1 session A: [10:00, 10:40) = last(10:10)+30min, 2 events
    assert rows[(1, ts(0), ts(40))] == 2
    # user 1 session B: [10:50, 11:20), 1 event
    assert rows[(1, ts(50), ts(80))] == 1
    # user 2: single-event session
    assert rows[(2, ts(0), ts(30))] == 1
