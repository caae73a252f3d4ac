"""Streaming exact-dedup test: duplicate content arriving within the
watermark horizon is suppressed, including across micro-batch runs
sharing a checkpoint (state carries the seen fingerprints)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from music_streaming_etl_spark.streaming.dedup import start_dedup_stream

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def _write(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").option(
        "header", True
    ).csv(path)


def test_streaming_dedup_suppresses_rearrivals(spark, tmp_path):
    stream_dir = str(tmp_path / "in")
    target = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = dt.datetime(2024, 6, 25, 10, 0)

    _write(
        spark,
        [
            (1, "alpha beta gamma", t),
            (2, "ALPHA  beta gamma", t),  # dup after normalization
            (3, "unique content one", t),
        ],
        stream_dir,
    )
    q = start_dedup_stream(spark, stream_dir, SCHEMA, target, ckpt)
    q.awaitTermination(120)
    ids1 = sorted(r["doc_id"] for r in spark.read.parquet(target).collect())
    assert len(ids1) == 2  # one of {1,2} plus 3
    assert 3 in ids1

    # second batch re-sends the same content within the horizon plus
    # one new doc — only the new doc lands
    _write(
        spark,
        [
            (4, "alpha beta gamma", t + dt.timedelta(minutes=10)),
            (5, "unique content two", t + dt.timedelta(minutes=10)),
        ],
        stream_dir,
    )
    q2 = start_dedup_stream(spark, stream_dir, SCHEMA, target, ckpt)
    q2.awaitTermination(120)
    ids2 = sorted(r["doc_id"] for r in spark.read.parquet(target).collect())
    assert 5 in ids2
    assert 4 not in ids2
    assert len(ids2) == 3
