"""Popularity index + engagement-based most-popular-track — the
assignment-spec deliverables the reference never implemented
(``1-- ETL with Airflow.pdf`` p.1-2; SURVEY.md intro: "in-scope
stretch goals". The DAG only computes a frequency mode,
``dags/music_streaming_etl_dags.py:190-193``).

Definition (documented here since the PDF leaves the formula open):

    popularity_index(track) =
        0.6 · plays(track)   / max_plays_over_all_tracks
      + 0.4 · listeners(track) / max_listeners_over_all_tracks

— a [0,1] blend of raw volume and audience breadth. The
engagement-based most-popular-track per genre is the argmax of the
index with (index DESC, track ASC) total order.

Scale: one groupBy(track) for the engagement counts, a global 1-row
max broadcast back, and a tiny per-genre argmax — the fact table is
touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def popularity_index(
    plays: DataFrame,
    track_col: str,
    user_col: str,
    weight_plays: float = 0.6,
    weight_listeners: float = 0.4,
) -> DataFrame:
    """Per-track engagement metrics + normalized popularity index.
    Returns (track, n_plays, n_listeners, popularity_index)."""
    per_track = plays.groupBy(F.col(track_col).alias("track")).agg(
        F.count(F.lit(1)).alias("n_plays"),
        F.countDistinct(user_col).alias("n_listeners"),
    )
    maxes = per_track.agg(
        F.max("n_plays").alias("__mp"), F.max("n_listeners").alias("__ml")
    )
    return per_track.crossJoin(F.broadcast(maxes)).select(
        "track",
        "n_plays",
        "n_listeners",
        # raw final (round-7 sweep): fixed-order quotients/products of
        # exact counts and literal weights — bit-identical across
        # engines; ROUND(DOUBLE, 6) is the anova-class ambiguity
        (
            F.col("n_plays").cast("double") / F.col("__mp").cast("double")
            * weight_plays
            + F.col("n_listeners").cast("double") / F.col("__ml").cast("double")
            * weight_listeners
        ).alias("popularity_index"),
    )


def engagement_top_track(
    plays: DataFrame,
    genre_col: str,
    track_col: str,
    user_col: str,
) -> DataFrame:
    """Per-genre most popular track by engagement (not raw frequency):
    argmax popularity_index with (index DESC, track ASC) tie-break.
    Null genres dropped (reference groupby semantics)."""
    idx = popularity_index(plays, track_col, user_col)
    genres = (
        plays.filter(F.col(genre_col).isNotNull())
        .select(F.col(genre_col).alias("genre"), F.col(track_col).alias("track"))
        .distinct()
    )
    joined = genres.join(idx, "track")
    w = Window.partitionBy("genre").orderBy(
        F.desc("popularity_index"), F.asc("track")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("genre", "track", "popularity_index")
    )
