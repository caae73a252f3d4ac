"""End-to-end pipeline test: CSV fixtures on disk → extract →
validate → KPIs → CSV load, checking the loaded files have the
reference's exact shape (incl. the list-literal top_artists string)
and that validation failures abort the run."""

from __future__ import annotations

import csv
import datetime as dt
import glob

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.validation import ValidationError
from music_streaming_etl_spark.plans.pipeline import extract_streams, run_pipeline


@pytest.fixture()
def dims(spark):
    songs = spark.createDataFrame(
        [
            (1, "t1", "art_a", "alb", "song_a", "rock", 100),
            (2, "t2", "art_b", "alb", "song_b", "jazz", 200),
        ],
        "id int, track_id string, artists string, album_name string,"
        " track_name string, track_genre string, duration_ms int",
    )
    users = spark.createDataFrame(
        [(1, "u1", 30, "US", dt.date(2024, 1, 1))],
        "user_id int, user_name string, user_age int, user_country string,"
        " created_at date",
    )
    return songs, users


def _write_stream_files(tmp_path, n_files=2):
    paths = []
    for i in range(n_files):
        p = tmp_path / f"streams{i}.csv"
        with open(p, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(["user_id", "track_id", "listen_time"])
            w.writerow([1, "t1", f"2024-06-25 0{i}:10:00"])
            w.writerow([1, "t2", f"2024-06-25 0{i}:20:00"])
        paths.append(str(p))
    return paths


def test_pipeline_end_to_end(spark, dims, tmp_path):
    songs, users = dims
    paths = _write_stream_files(tmp_path)
    streams = extract_streams(spark, paths)
    genre_out = str(tmp_path / "genre")
    hourly_out = str(tmp_path / "hourly")
    report = run_pipeline(
        spark, streams, songs, users, genre_out=genre_out, hourly_out=hourly_out
    )
    assert report.genre_rows == 2  # (rock, jazz) × one date
    assert report.hourly_rows == 2  # hours 0 and 1
    assert all(c.passed for c in report.input_checks + report.output_checks)

    # loaded CSV must be reference-shaped: header + list-literal array
    hourly_file = glob.glob(f"{hourly_out}/part-*.csv")[0]
    with open(hourly_file) as fh:
        rows = list(csv.DictReader(fh))
    assert sorted(r["hour"] for r in rows) == ["0", "1"]
    assert rows[0]["top_artists"] in ("['art_a', 'art_b']", "['art_b', 'art_a']")
    assert set(rows[0].keys()) == {
        "hour", "unique_listeners", "top_artists", "track_diversity_index",
    }


def test_pipeline_aborts_on_null_keys(spark, dims, tmp_path):
    songs, users = dims
    streams = spark.createDataFrame(
        [(1, None, dt.datetime(2024, 6, 25, 1))],
        "user_id int, track_id string, listen_time timestamp",
    )
    with pytest.raises(ValidationError, match="streams_no_nulls"):
        run_pipeline(spark, streams, songs, users)


def test_pipeline_aborts_on_empty(spark, dims):
    songs, users = dims
    empty = spark.createDataFrame(
        [], "user_id int, track_id string, listen_time timestamp"
    )
    with pytest.raises(ValidationError, match="streams_nonempty"):
        run_pipeline(spark, empty, songs, users)
