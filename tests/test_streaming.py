"""Streaming KPI pipeline test: drop CSV batches into a directory,
drain with availableNow, assert windowed KPIs land in the upsert
target — including a late-data second batch that must *replace* the
affected window rows, not duplicate them."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.streaming.kpis import (
    read_top_artists,
    start_artist_count_stream,
    start_kpi_stream,
)


def _write_csv(spark, rows, path):
    df = spark.createDataFrame(
        rows, "user_id int, track_id string, listen_time timestamp"
    )
    df.coalesce(1).write.mode("append").option("header", True).csv(path)


@pytest.fixture()
def songs(spark):
    return spark.createDataFrame(
        [("t1", "rock", 100), ("t2", "jazz", 200)],
        "track_id string, track_genre string, duration_ms int",
    )


def test_streaming_windowed_upsert(spark, songs, tmp_path):
    stream_dir = str(tmp_path / "in")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 6, 25, 10, 15)

    _write_csv(
        spark,
        [(1, "t1", t), (2, "t1", t.replace(minute=40)), (1, "t2", t.replace(hour=11))],
        stream_dir,
    )
    q = start_kpi_stream(spark, stream_dir, songs, target, ckpt)
    q.awaitTermination(120)

    out = {
        (r["hour"], r["track_genre"]): r
        for r in spark.read.parquet(target).collect()
    }
    assert out[(10, "rock")]["listen_count"] == 2
    assert out[(11, "jazz")]["listen_count"] == 1
    assert out[(10, "rock")]["date"] == dt.date(2024, 6, 25)

    # late batch into the 10:00 window → window re-emitted, upsert
    # must REPLACE the (window, genre) row
    _write_csv(spark, [(3, "t1", t.replace(minute=50))], stream_dir)
    q2 = start_kpi_stream(spark, stream_dir, songs, target, ckpt)
    q2.awaitTermination(120)

    out2 = {
        (r["hour"], r["track_genre"]): r
        for r in spark.read.parquet(target).collect()
    }
    assert out2[(10, "rock")]["listen_count"] == 3
    assert out2[(10, "rock")]["unique_listeners"] == 3
    assert len([k for k in out2 if k[1] == "rock" and k[0] == 10]) == 1


def test_streaming_top_artists(spark, tmp_path):
    songs = spark.createDataFrame(
        [("t1", "art_a"), ("t2", "art_b"), ("t3", "art_c")],
        "track_id string, artists string",
    )
    stream_dir = str(tmp_path / "in2")
    counts_path = str(tmp_path / "counts")
    ckpt = str(tmp_path / "ckpt2")
    t = dt.datetime(2024, 6, 25, 10, 5)

    # hour 10: art_a ×2, art_b ×1 (and an unknown track → null artist dropped)
    _write_csv(
        spark,
        [(1, "t1", t), (2, "t1", t), (3, "t2", t), (4, "t_unknown", t)],
        stream_dir,
    )
    q = start_artist_count_stream(spark, stream_dir, songs, counts_path, ckpt)
    q.awaitTermination(120)

    top = read_top_artists(spark, counts_path, k=2).collect()
    by_rank = {r["rank"]: (r["artists"], r["plays"]) for r in top}
    assert by_rank == {1: ("art_a", 2), 2: ("art_b", 1)}

    # late batch: art_b gets 2 more plays in hour 10 → overtakes art_a
    _write_csv(
        spark,
        [(5, "t2", t.replace(minute=40)), (6, "t2", t.replace(minute=50))],
        stream_dir,
    )
    q2 = start_artist_count_stream(spark, stream_dir, songs, counts_path, ckpt)
    q2.awaitTermination(120)
    top2 = read_top_artists(spark, counts_path, k=2).collect()
    by_rank2 = {r["rank"]: (r["artists"], r["plays"]) for r in top2}
    assert by_rank2 == {1: ("art_b", 3), 2: ("art_a", 2)}
