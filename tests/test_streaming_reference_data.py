"""Streaming mode on the reference repo's REAL stream files: drop the
three streams*.csv into a watch directory batch-by-batch, drain with
availableNow, and reconcile the windowed totals against the known
34,038-event volume — state must stitch correctly when the remaining
files arrive in a second run over the same checkpoint."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.streaming.kpis import start_kpi_stream

REF_STREAMS = "/root/reference/data/streams"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF_STREAMS}/streams1.csv"),
    reason="reference data not present",
)


def test_streaming_reference_volume(spark, tmp_path):
    stream_dir = tmp_path / "in"
    stream_dir.mkdir()
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # synth songs covering every track (so nothing drops on the genre
    # filter and totals reconcile exactly)
    tracks = (
        spark.read.option("header", True)
        .csv([f"{REF_STREAMS}/streams{i}.csv" for i in (1, 2, 3)])
        .select("track_id")
        .distinct()
    )
    songs = tracks.select(
        "track_id",
        F.concat(F.lit("genre_"), F.substring("track_id", 1, 1)).alias("track_genre"),
        F.lit(200000).alias("duration_ms"),
    )

    # batch 1: two files
    for i in (1, 2):
        shutil.copy(f"{REF_STREAMS}/streams{i}.csv", stream_dir / f"s{i}.csv")
    # 25h watermark: the third file replays the WHOLE day, so the
    # allowed lateness must cover it (with the default 1h watermark
    # the engine correctly drops those events as late — that
    # trade-off is exactly what the watermark knob is for)
    q = start_kpi_stream(
        spark, str(stream_dir), songs, target, ckpt, watermark="25 hours"
    )
    q.awaitTermination(300)
    total1 = (
        spark.read.parquet(target).agg(F.sum("listen_count")).collect()[0][0]
    )
    assert total1 == 2 * 11_346

    # batch 2: the third file — windows re-emit, upsert must converge
    # to the full-day totals, not double-count
    shutil.copy(f"{REF_STREAMS}/streams3.csv", stream_dir / "s3.csv")
    q2 = start_kpi_stream(
        spark, str(stream_dir), songs, target, ckpt, watermark="25 hours"
    )
    q2.awaitTermination(300)
    final = spark.read.parquet(target)
    assert final.agg(F.sum("listen_count")).collect()[0][0] == 34_038
    hours = sorted(r["hour"] for r in final.select("hour").distinct().collect())
    assert hours == list(range(24))
