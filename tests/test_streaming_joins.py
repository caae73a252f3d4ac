"""Stream-stream attribution join e2e: two CSV file streams drained
with availableNow must produce exactly what the batch twin produces on
the same files — including the attribution-window boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from music_streaming_etl_spark.streaming.joins import (
    IMPRESSION_SCHEMA,
    PLAY_SCHEMA,
    attribute_plays,
    start_attribution_stream,
)


def _ts(h, m):
    return dt.datetime(2024, 6, 25, h, m)


IMPS = [
    (100, 1, "t1", _ts(10, 0)),   # attributed by play at 10:20
    (101, 1, "t1", _ts(10, 15)),  # ALSO attributed (two imps, one play)
    (102, 2, "t1", _ts(10, 0)),   # wrong user for p2 → no match
    (103, 3, "t9", _ts(9, 0)),    # play comes 90 min later → outside window
]
PLAYS = [
    (200, 1, "t1", _ts(10, 20)),
    (201, 3, "t9", _ts(10, 30)),
    (202, 4, "t1", _ts(10, 20)),  # user never saw an impression
]


def _write(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).option("header", True).csv(path)


def test_stream_stream_join_matches_batch_twin(spark, tmp_path):
    imp_dir, play_dir = str(tmp_path / "imps"), str(tmp_path / "plays")
    target, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write(spark, IMPS, IMPRESSION_SCHEMA, imp_dir)
    _write(spark, PLAYS, PLAY_SCHEMA, play_dir)

    q = start_attribution_stream(spark, imp_dir, play_dir, target, ckpt)
    q.awaitTermination(120)

    got = sorted(
        (r["play_id"], r["imp_id"])
        for r in spark.read.parquet(target).collect()
    )

    batch = attribute_plays(
        spark.createDataFrame(IMPS, IMPRESSION_SCHEMA),
        spark.createDataFrame(PLAYS, PLAY_SCHEMA),
    )
    want = sorted(
        (r["play_id"], r["imp_id"]) for r in batch.collect()
    )
    assert got == want == [(200, 100), (200, 101)]


def test_stream_stream_join_state_is_keyed_and_windowed(spark, tmp_path):
    """The streaming plan must carry both watermarks and a
    StreamingSymmetricHashJoin (keyed state), proving state eviction is
    in play rather than an unbounded buffer."""
    imp_dir, play_dir = str(tmp_path / "i2"), str(tmp_path / "p2")
    _write(spark, IMPS, IMPRESSION_SCHEMA, imp_dir)
    _write(spark, PLAYS, PLAY_SCHEMA, play_dir)
    imps = (
        spark.readStream.schema(IMPRESSION_SCHEMA).option("header", True).csv(imp_dir)
    )
    plays = (
        spark.readStream.schema(PLAY_SCHEMA).option("header", True).csv(play_dir)
    )
    joined = attribute_plays(imps, plays)
    assert joined.isStreaming
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan
    assert plan.count("EventTimeWatermark") == 2


def test_outer_attribution_emits_unmatched_after_watermark(spark, tmp_path):
    """leftOuter stream-stream: matched impressions emit with their
    play; unmatched ones emit null-padded only once the watermark
    passes their attribution window end."""
    import datetime as dt

    from music_streaming_etl_spark.streaming.joins import (
        IMPRESSION_SCHEMA,
        PLAY_SCHEMA,
        attribute_plays_outer,
    )

    imp_dir = str(tmp_path / "imps")
    play_dir = str(tmp_path / "plays")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 7, 1, 12, 0, 0)

    def drain():
        imps = (
            spark.readStream.schema(IMPRESSION_SCHEMA)
            .option("header", True).csv(imp_dir)
        )
        plays = (
            spark.readStream.schema(PLAY_SCHEMA)
            .option("header", True).csv(play_dir)
        )
        q = (
            attribute_plays_outer(imps, plays)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .format("parquet").option("path", out)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    def w(rows, schema, d):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).option("header", True).csv(d)

    # imp 1 gets a play inside 30 min; imp 2 never matches
    w([(1, 10, "tr_a", t), (2, 20, "tr_b", t)], IMPRESSION_SCHEMA, imp_dir)
    w([(100, 10, "tr_a", t + dt.timedelta(minutes=5))], PLAY_SCHEMA, play_dir)
    drain()
    # advance BOTH watermarks far past imp 2's window end (t+30m+20m)
    w([(3, 30, "tr_c", t + dt.timedelta(hours=3))], IMPRESSION_SCHEMA, imp_dir)
    w([(101, 30, "tr_c", t + dt.timedelta(hours=3))], PLAY_SCHEMA, play_dir)
    drain()
    drain()  # one more cycle so state eviction emits the null row

    rows = {r["imp_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[1]["play_id"] == 100          # matched inside window
    assert 2 in rows and rows[2]["play_id"] is None  # emitted null-padded
