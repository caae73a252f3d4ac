"""Hand-computed unit tests for the round-6 time-series operators:
integer-exact EWMA (gap-aware calendar weights) and sweep-line peak
concurrency (day clipping, boundary tie order)."""

from __future__ import annotations

import datetime as dt

from music_streaming_etl_spark.operators.timeseries import (
    ewma_halflife_1d,
    peak_concurrency,
)


def test_ewma_weights_and_gap_awareness(spark):
    # key "a": days 1,2,4 (day 3 missing) with cents 100, 200, 400
    daily = spark.createDataFrame(
        [
            ("a", dt.date(2024, 1, 1), 100),
            ("a", dt.date(2024, 1, 2), 200),
            ("a", dt.date(2024, 1, 4), 400),
            ("b", dt.date(2024, 1, 1), 7),
        ],
        "k string, d date, cents long",
    )
    out = {
        (r["k"], r["d"]): r["ewma_cents"]
        for r in ewma_halflife_1d(daily, ["k"], "d", "cents", lookback_days=3).collect()
    }
    # day1: only itself → 100
    assert out[("a", dt.date(2024, 1, 1))] == 100.0
    # day2: (200*8 + 100*4) / (8+4) = 2000/12
    assert out[("a", dt.date(2024, 1, 2))] == 2000 / 12
    # day4: lags 0,2,3 → (400*8 + 200*2 + 100*1) / (8+2+1) = 3700/11
    assert out[("a", dt.date(2024, 1, 4))] == 3700 / 11
    # keys never mix
    assert out[("b", dt.date(2024, 1, 1))] == 7.0
    assert len(out) == 4


def test_ewma_lookback_truncation(spark):
    # a value exactly lookback+1 days old contributes nothing
    daily = spark.createDataFrame(
        [
            ("a", dt.date(2024, 1, 1), 1000),
            ("a", dt.date(2024, 1, 5), 16),
        ],
        "k string, d date, cents long",
    )
    out = {
        r["d"]: r["ewma_cents"]
        for r in ewma_halflife_1d(daily, ["k"], "d", "cents", lookback_days=3).collect()
    }
    assert out[dt.date(2024, 1, 5)] == 16.0  # day1 is 4 days back > lookback 3


def _t(h, m=0):
    return dt.datetime(2024, 6, 25, h, m)


def test_peak_concurrency_overlap_and_touch(spark):
    iv = spark.createDataFrame(
        [
            (_t(9), _t(11)),       # A
            (_t(10), _t(12)),      # B overlaps A → 2
            (_t(11), _t(13)),      # C starts exactly when A ends:
                                   # [start, end) — NOT concurrent
                                   # with A, so the peak stays 2
            (_t(20), _t(21)),      # isolated
        ],
        "s timestamp, e timestamp",
    )
    (row,) = peak_concurrency(iv, "s", "e").collect()
    assert row["day"] == dt.date(2024, 6, 25)
    assert row["peak_concurrent"] == 2


def test_peak_concurrency_multiday_clip(spark):
    # one interval spanning midnight counts on BOTH days; a second
    # day-2 interval overlaps its tail
    iv = spark.createDataFrame(
        [
            (dt.datetime(2024, 6, 25, 23), dt.datetime(2024, 6, 26, 2)),
            (dt.datetime(2024, 6, 26, 1), dt.datetime(2024, 6, 26, 3)),
        ],
        "s timestamp, e timestamp",
    )
    out = {r["day"]: r["peak_concurrent"] for r in peak_concurrency(iv, "s", "e").collect()}
    assert out == {dt.date(2024, 6, 25): 1, dt.date(2024, 6, 26): 2}
