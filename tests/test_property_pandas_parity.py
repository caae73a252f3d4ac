"""Property-based differential test: the engine's KPI semantics vs an
independent pandas implementation of the reference's documented
behavior (SURVEY.md §2.4) on randomized inputs.

The pandas twin here is written from the SURVEY spec (groupby-dropna,
mode()[0] tie-break, value_counts top-k, nunique/len diversity) — it
is the *semantic oracle*, exercising edge cases fixed fixtures miss:
all-null groups, single-row groups, orphan tracks, tie pileups.
"""

from __future__ import annotations

import datetime as dt
import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from music_streaming_etl_spark.plans.kpis import compute_kpis

TRACKS = ["t1", "t2", "t3", "t_orphan"]
NAMES = ["song_a", "song_b"]
GENRES = ["rock", "jazz", None]

song_rows = st.lists(
    st.tuples(
        st.sampled_from(["t1", "t2", "t3"]),
        st.sampled_from(NAMES),
        st.sampled_from(GENRES),
        st.one_of(st.none(), st.integers(50, 500)),
    ),
    min_size=1,
    max_size=3,
    unique_by=lambda r: r[0],
)

stream_rows = st.lists(
    st.tuples(
        st.integers(1, 4),
        st.sampled_from(TRACKS),
        st.integers(0, 2),  # hour
    ),
    min_size=1,
    max_size=25,
)


def pandas_genre_kpis(streams: pd.DataFrame, songs: pd.DataFrame) -> pd.DataFrame:
    merged = streams.merge(songs, on="track_id", how="left")
    merged["date"] = merged["listen_time"].dt.date
    out = []
    # pandas groupby drops NaN group keys (the reference's semantics)
    for (genre, date), grp in merged.dropna(subset=["track_genre"]).groupby(
        ["track_genre", "date"]
    ):
        modes = grp["track_name"].mode()
        out.append(
            {
                "track_genre": genre,
                "date": date,
                "listen_count": int(grp["track_id"].count()),
                "avg_track_duration": grp["duration_ms"].mean(),
                "most_popular_track": modes[0] if len(modes) else None,
            }
        )
    return pd.DataFrame(out)


def pandas_hourly_kpis(streams: pd.DataFrame, songs: pd.DataFrame) -> pd.DataFrame:
    merged = streams.merge(songs, on="track_id", how="left")
    merged["hour"] = merged["listen_time"].dt.hour
    out = []
    for hour, grp in merged.groupby("hour"):
        vc = grp["artists"].value_counts()
        # engine-defined tie-break: count DESC, name ASC
        ranked = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append(
            {
                "hour": int(hour),
                "unique_listeners": int(grp["user_id"].nunique()),
                "top_artists": [name for name, _ in ranked[:5]],
                "track_diversity_index": grp["track_id"].nunique() / len(grp),
            }
        )
    return pd.DataFrame(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(songs=song_rows, streams=stream_rows)
def test_kpis_match_pandas_semantics(spark, songs, streams):
    songs_pdf = pd.DataFrame(
        songs, columns=["track_id", "track_name", "track_genre", "duration_ms"]
    )
    songs_pdf["artists"] = songs_pdf["track_name"].str.replace("song", "art")
    streams_pdf = pd.DataFrame(
        streams, columns=["user_id", "track_id", "hour"]
    )
    streams_pdf["listen_time"] = streams_pdf["hour"].map(
        lambda h: dt.datetime(2024, 6, 25, int(h), 30)
    )
    streams_pdf = streams_pdf.drop(columns=["hour"])

    songs_df = spark.createDataFrame(
        songs_pdf.assign(id=1, album_name="x")[
            ["id", "track_id", "artists", "album_name", "track_name",
             "track_genre", "duration_ms"]
        ],
        "id int, track_id string, artists string, album_name string,"
        " track_name string, track_genre string, duration_ms int",
    )
    users_df = spark.createDataFrame(
        [(i, f"u{i}", 30, "US", dt.date(2024, 1, 1)) for i in range(1, 5)],
        "user_id int, user_name string, user_age int, user_country string,"
        " created_at date",
    )
    streams_df = spark.createDataFrame(
        streams_pdf[["user_id", "track_id", "listen_time"]],
        "user_id int, track_id string, listen_time timestamp",
    )

    res = compute_kpis(streams_df, songs_df, users_df, cache=False)

    got_genre = {
        (r["track_genre"], r["date"]): r for r in res.genre_kpis.collect()
    }
    exp_genre = pandas_genre_kpis(streams_pdf, songs_pdf)
    assert len(got_genre) == len(exp_genre)
    for _, e in exp_genre.iterrows():
        g = got_genre[(e["track_genre"], e["date"])]
        assert g["listen_count"] == e["listen_count"]
        if pd.isna(e["avg_track_duration"]):
            assert g["avg_track_duration"] is None
        else:
            assert math.isclose(
                g["avg_track_duration"], e["avg_track_duration"], rel_tol=1e-9
            )
        assert g["most_popular_track"] == e["most_popular_track"]

    got_hourly = {r["hour"]: r for r in res.hourly_kpis.collect()}
    exp_hourly = pandas_hourly_kpis(streams_pdf, songs_pdf)
    assert len(got_hourly) == len(exp_hourly)
    for _, e in exp_hourly.iterrows():
        h = got_hourly[e["hour"]]
        assert h["unique_listeners"] == e["unique_listeners"]
        assert (h["top_artists"] or []) == e["top_artists"]
        assert math.isclose(
            h["track_diversity_index"], e["track_diversity_index"], rel_tol=1e-9
        )
