"""Tests for the PDF-spec popularity index and engagement-based
most-popular-track (the deliverables the reference DAG skipped)."""

from __future__ import annotations

import pytest

from music_streaming_etl_spark.plans.popularity import (
    engagement_top_track,
    popularity_index,
)


def test_popularity_index_blend(spark):
    # t1: 3 plays / 2 listeners (max on both) → index 1.0
    # t2: 1 play / 1 listener → 0.6*(1/3) + 0.4*(1/2) = 0.4
    plays = spark.createDataFrame(
        [("t1", 1), ("t1", 1), ("t1", 2), ("t2", 2)],
        "track_id string, user_id int",
    )
    idx = {
        r["track"]: r["popularity_index"]
        for r in popularity_index(plays, "track_id", "user_id").collect()
    }
    assert idx["t1"] == 1.0
    assert idx["t2"] == pytest.approx(0.6 / 3 + 0.4 / 2)


def test_engagement_beats_raw_frequency(spark):
    # t_narrow: 4 plays from ONE user; t_broad: 3 plays from 3 users.
    # Frequency mode would pick t_narrow; engagement picks t_broad
    # when breadth dominates: idx(narrow)=.6*1+.4*(1/3)=.733,
    # idx(broad)=.6*.75+.4*1=.85
    plays = spark.createDataFrame(
        [
            ("rock", "t_narrow", 1),
            ("rock", "t_narrow", 1),
            ("rock", "t_narrow", 1),
            ("rock", "t_narrow", 1),
            ("rock", "t_broad", 1),
            ("rock", "t_broad", 2),
            ("rock", "t_broad", 3),
            (None, "t_hidden", 9),  # null genre dropped
        ],
        "genre string, track_id string, user_id int",
    )
    out = engagement_top_track(plays, "genre", "track_id", "user_id").collect()
    assert len(out) == 1
    assert out[0]["genre"] == "rock"
    assert out[0]["track"] == "t_broad"
