"""Stream-stream join (SURVEY.md §2.7 surface completion): the
impression→action attribution shape — two live streams joined on a key
with an event-time range condition.

Structured Streaming buffers BOTH sides in state; the watermarks plus
the time-range predicate are what make that state bounded: once the
watermark passes ``attribution window + lateness``, buffered rows are
evicted. Without the range condition Spark would have to keep every
row forever — so the operator REQUIRES it rather than defaulting it.

Scale: state is partitioned by the join key (shuffle on key per
micro-batch, same layout as the stateful sessionizer); state size is
O(rows inside the attribution window per key), independent of stream
length. The batch twin (identical semantics on bounded data) is the
same ``join`` expression on static frames — the e2e test asserts
stream == batch on the same files.

Reference anchor: the reference has no streaming at all (hourly Airflow
batches, ``dags/music_streaming_etl_dags.py:332-356``); this is the
engine's continuous upgrade of the same enrich-join step (``:178-179``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMPRESSION_SCHEMA = T.StructType(
    [
        T.StructField("imp_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("track_id", T.StringType()),
        T.StructField("imp_ts", T.TimestampType()),
    ]
)

PLAY_SCHEMA = T.StructType(
    [
        T.StructField("play_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("track_id", T.StringType()),
        T.StructField("play_ts", T.TimestampType()),
    ]
)


def attribute_plays(
    impressions: DataFrame,
    plays: DataFrame,
    attribution_minutes: int = 30,
    imp_lateness: str = "20 minutes",
    play_lateness: str = "10 minutes",
) -> DataFrame:
    """Inner-join each play to the impressions of the same
    (user, track) shown in the preceding ``attribution_minutes`` —
    works identically on streaming and static inputs (the batch twin
    used by the test). Watermarks only attach to streaming frames."""
    imp = impressions
    pl = plays
    if imp.isStreaming:
        imp = imp.withWatermark("imp_ts", imp_lateness)
    if pl.isStreaming:
        pl = pl.withWatermark("play_ts", play_lateness)
    cond = (
        (imp["user_id"] == pl["user_id"])
        & (imp["track_id"] == pl["track_id"])
        & (pl["play_ts"] >= imp["imp_ts"])
        & (
            pl["play_ts"]
            <= imp["imp_ts"] + F.expr(f"INTERVAL {attribution_minutes} MINUTES")
        )
    )
    return imp.join(pl, cond, "inner").select(
        pl["play_id"],
        imp["imp_id"],
        pl["user_id"],
        pl["track_id"],
        imp["imp_ts"],
        pl["play_ts"],
    )


def start_attribution_stream(
    spark,
    imp_dir: str,
    play_dir: str,
    target_path: str,
    checkpoint_dir: str,
    attribution_minutes: int = 30,
):
    """File-source streams → stream-stream attribution join → append
    parquet sink (inner joins emit once per match; append is exactly
    right — no upsert needed)."""
    imps = (
        spark.readStream.schema(IMPRESSION_SCHEMA)
        .option("header", True)
        .csv(imp_dir)
    )
    plays = (
        spark.readStream.schema(PLAY_SCHEMA)
        .option("header", True)
        .csv(play_dir)
    )
    joined = attribute_plays(imps, plays, attribution_minutes)
    return (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", target_path)
        .trigger(availableNow=True)
        .start()
    )


def attribute_plays_outer(
    impressions: DataFrame,
    plays: DataFrame,
    attribution_minutes: int = 30,
    imp_lateness: str = "20 minutes",
    play_lateness: str = "10 minutes",
) -> DataFrame:
    """LEFT-OUTER stream-stream variant: every impression emits — with
    its attributed play when one lands inside the window, or with NULL
    play columns once the watermark proves no play can still arrive.
    The null rows are the "unattributed spend" report an inner join
    silently drops.

    Semantics note (Structured Streaming contract): the null-padded
    row for an unmatched impression is emitted only AFTER the
    watermark passes the end of its attribution window — correctness
    requires the engine to know no counterexample can arrive. State
    stays bounded exactly as in the inner form.
    """
    imp = impressions
    pl = plays
    if imp.isStreaming:
        imp = imp.withWatermark("imp_ts", imp_lateness)
    if pl.isStreaming:
        pl = pl.withWatermark("play_ts", play_lateness)
    cond = (
        (imp["user_id"] == pl["user_id"])
        & (imp["track_id"] == pl["track_id"])
        & (pl["play_ts"] >= imp["imp_ts"])
        & (
            pl["play_ts"]
            <= imp["imp_ts"] + F.expr(f"INTERVAL {attribution_minutes} MINUTES")
        )
    )
    return imp.join(pl, cond, "leftOuter").select(
        imp["imp_id"],
        imp["user_id"],
        imp["track_id"],
        imp["imp_ts"],
        pl["play_id"],
        pl["play_ts"],
    )
