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
