"""End-to-end golden test for the compute_kpis plan on music-domain
fixtures shaped like the reference's data (FIXTURES.md §1), asserting
the pandas-semantics edge cases bit-for-bit:

- stream row with a track_id absent from songs → NULL genre → excluded
  from genre_kpis but still counted in hourly_kpis' denominator;
- mode tie → lexicographically smallest track_name;
- top_artists ordered by (count DESC, name ASC), max 5;
- diversity = distinct non-null track ÷ ALL rows.

Reference semantics: dags/music_streaming_etl_dags.py:172-211.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.functions.scalars import python_list_literal
from music_streaming_etl_spark.plans.kpis import compute_kpis

T0 = dt.datetime(2024, 6, 25, 10, 0, 0)


@pytest.fixture(scope="module")
def fixtures(spark):
    users = spark.createDataFrame(
        [
            (1, "u1", 30, "US", dt.date(2024, 1, 1)),
            (2, "u2", 40, "DE", dt.date(2024, 1, 2)),
        ],
        "user_id int, user_name string, user_age int, user_country string, created_at date",
    )
    songs = spark.createDataFrame(
        [
            # track_id, artists, track_name, track_genre, duration_ms
            ("t1", "art_a", "song_b", "rock", 100),
            ("t2", "art_a", "song_a", "rock", 300),
            ("t3", "art_b", "song_c", "jazz", None),
        ],
        "track_id string, artists string, track_name string, track_genre string, duration_ms int",
    ).select(
        F.lit(1).alias("id"),
        "track_id",
        "artists",
        F.lit("alb").alias("album_name"),
        "track_name",
        "track_genre",
        "duration_ms",
    )
    streams = spark.createDataFrame(
        [
            # hour 10: t1 ×2, t2 ×2 (mode tie: song_a vs song_b both 2)
            (1, "t1", T0),
            (2, "t1", T0),
            (1, "t2", T0),
            (2, "t2", T0),
            # hour 11: t3 once + an orphan track (no song row)
            (1, "t3", T0.replace(hour=11)),
            (2, "t_missing", T0.replace(hour=11)),
        ],
        "user_id int, track_id string, listen_time timestamp",
    )
    return streams, songs, users


def test_genre_kpis_golden(spark, fixtures):
    streams, songs, users = fixtures
    res = compute_kpis(streams, songs, users, cache=False)
    rows = {r["track_genre"]: r for r in res.genre_kpis.collect()}
    # orphan track (NULL genre) dropped entirely — pandas groupby dropna
    assert set(rows) == {"rock", "jazz"}
    rock = rows["rock"]
    assert rock["date"] == dt.date(2024, 6, 25)
    assert rock["listen_count"] == 4
    assert rock["avg_track_duration"] == pytest.approx(200.0)
    # tie between song_a (2) and song_b (2) → lexicographically smallest
    assert rock["most_popular_track"] == "song_a"
    jazz = rows["jazz"]
    assert jazz["listen_count"] == 1
    assert jazz["avg_track_duration"] is None  # all-null durations → pandas NaN


def test_hourly_kpis_golden(spark, fixtures):
    streams, songs, users = fixtures
    res = compute_kpis(streams, songs, users, cache=False)
    rows = {r["hour"]: r for r in res.hourly_kpis.collect()}
    assert set(rows) == {10, 11}
    h10 = rows[10]
    assert h10["unique_listeners"] == 2
    # art_a plays 4× — only artist in hour 10
    assert h10["top_artists"] == ["art_a"]
    # 2 distinct tracks / 4 rows
    assert h10["track_diversity_index"] == pytest.approx(0.5)
    h11 = rows[11]
    # orphan row still counts: 2 distinct non-null of 2 rows = 1.0
    assert h11["unique_listeners"] == 2
    assert h11["track_diversity_index"] == pytest.approx(1.0)
    assert h11["top_artists"] == ["art_b"]  # orphan's NULL artist dropped


def test_list_literal_csv_boundary(spark):
    df = spark.createDataFrame([(["a", "b"],), ([],)], "arr array<string>")
    got = [r["s"] for r in df.select(python_list_literal("arr").alias("s")).collect()]
    assert got == ["['a', 'b']", "[]"]


def test_list_literal_matches_python_repr_on_quotes(spark):
    """Element quoting must follow Python repr rules — pandas to_csv
    writes str(list), so "Guns N' Roses" switches to double quotes."""
    cases = [
        ["Guns N' Roses", "AC/DC"],          # single quote → double-quoted
        ['She said "hi"'],                   # double quote → single-quoted
        ["""mix 'o' "q" """.strip()],        # both → backslash-escaped '
        ["back\\slash"],                     # backslash doubles
        ["plain"],
    ]
    df = spark.createDataFrame([(c,) for c in cases], "arr array<string>")
    got = [
        r["s"] for r in df.select(python_list_literal("arr").alias("s")).collect()
    ]
    assert got == [str(c) for c in cases]
