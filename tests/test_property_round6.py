"""Property-based differential tests for the round-6 operators:

- asof_join (all three directions + tolerance) vs pandas
  ``merge_asof`` — the independent semantic oracle for the
  at-or-before / at-or-after / nearest contracts;
- peak_concurrency vs a brute-force event-boundary sweep in Python;
- ewma_halflife_1d vs a direct O(n·L) Python recomputation of the
  truncated calendar-weighted definition.

Randomized inputs hit the edges fixed fixtures miss: empty sides,
all-colliding timestamps, midnight-straddling intervals, gap runs.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from music_streaming_etl_spark.operators.asof import asof_join
from music_streaming_etl_spark.operators.timeseries import (
    ewma_halflife_1d,
    peak_concurrency,
)

BASE = dt.datetime(2024, 6, 25)

_SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

left_times = st.lists(st.integers(0, 120), min_size=1, max_size=8)
right_times = st.lists(st.integers(0, 120), min_size=0, max_size=8)


@st.composite
def asof_case(draw):
    lts = draw(left_times)
    rts = draw(right_times)
    direction = draw(st.sampled_from(["backward", "forward", "nearest"]))
    tol = draw(st.one_of(st.none(), st.integers(1, 40)))
    return lts, rts, direction, tol


@given(asof_case())
@_SLOW
def test_asof_matches_pandas_merge_asof(spark, case):
    lts, rts, direction, tol = case
    # unique right timestamps: merge_asof's behavior on exact right
    # duplicates is unspecified without a seq column — the seq path
    # has its own unit tests
    rts = sorted(set(rts))
    lpdf = pd.DataFrame(
        {
            "ts": [BASE + dt.timedelta(minutes=m) for m in sorted(lts)],
            "event_id": range(len(lts)),
        }
    )
    rpdf = pd.DataFrame(
        {
            # explicit datetime dtype — an empty list would otherwise
            # infer float64 and merge_asof rejects the key mismatch
            "ts": pd.to_datetime([BASE + dt.timedelta(minutes=m) for m in rts]),
            "px": [f"p{m}" for m in rts],
        }
    )
    expect = pd.merge_asof(
        lpdf,
        rpdf,
        on="ts",
        direction=direction,
        tolerance=None if tol is None else pd.Timedelta(minutes=tol),
    )
    left = spark.createDataFrame(
        [(int(r.event_id), 1, r.ts.to_pydatetime()) for r in lpdf.itertuples()],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, r.ts.to_pydatetime(), r.px) for r in rpdf.itertuples()]
        or [(None, None, None)],
        "k long, ts timestamp, px string",
    )
    if len(rpdf) == 0:
        right = right.filter("k IS NOT NULL")
    got = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(
            left,
            right,
            key="k",
            left_ts="ts",
            right_ts="ts",
            value_cols=["px"],
            direction=direction,
            tolerance_seconds=None if tol is None else tol * 60,
        ).collect()
    }
    for r in expect.itertuples():
        want = None if pd.isna(r.px) else r.px
        assert got[r.event_id] == want, (direction, tol, lts, rts)


intervals = st.lists(
    st.tuples(st.integers(0, 2000), st.integers(1, 900)),  # (start_min, dur_min)
    min_size=1,
    max_size=12,
)


@given(intervals)
@_SLOW
def test_peak_concurrency_matches_bruteforce(spark, ivs):
    rows = [
        (BASE + dt.timedelta(minutes=s), BASE + dt.timedelta(minutes=s + d))
        for s, d in ivs
    ]
    df = spark.createDataFrame(rows, "s timestamp, e timestamp")
    got = {
        r["day"]: r["peak_concurrent"]
        for r in peak_concurrency(df, "s", "e").collect()
    }
    # brute force: true half-open [start, end) concurrency evaluated
    # at every clip-start instant (ends process before starts, so the
    # maximum is attained at some start); a day whose only clips are
    # empty ([T, T)) reports peak 0 — same as the operator
    # every day each interval SPANS (interior days of multi-midnight
    # intervals included), matching the operator's sequence() explode
    days = sorted({
        (BASE + dt.timedelta(minutes=s)).date() + dt.timedelta(days=k)
        for s, d in ivs
        for k in range(
            ((BASE + dt.timedelta(minutes=s + d)).date()
             - (BASE + dt.timedelta(minutes=s)).date()).days + 1
        )
    })
    expect = {}
    for day in days:
        d0 = dt.datetime.combine(day, dt.time())
        d1 = d0 + dt.timedelta(days=1)
        clipped = [
            (max(s, d0), min(e, d1))
            for s, e in rows
            if s <= d1 and e >= d0 and max(s, d0) <= min(e, d1)
        ]
        if not clipped:
            continue
        peak = 0
        for t in sorted({c for c, _ in clipped}):
            cur = sum(1 for cs, ce in clipped if cs <= t < ce)
            peak = max(peak, cur)
        expect[day] = peak
    assert got == expect, (ivs, got, expect)


daily_series = st.lists(
    st.tuples(st.integers(0, 40), st.integers(-1000, 100000)),  # (day_off, cents)
    min_size=1,
    max_size=15,
    unique_by=lambda r: r[0],
)


@given(daily_series, st.integers(1, 6))
@_SLOW
def test_ewma_matches_bruteforce(spark, series, lookback):
    d0 = dt.date(2024, 1, 1)
    rows = [("k", d0 + dt.timedelta(days=off), c) for off, c in series]
    df = spark.createDataFrame(rows, "k string, d date, cents long")
    got = {
        r["d"]: r["ewma_cents"]
        for r in ewma_halflife_1d(df, ["k"], "d", "cents", lookback_days=lookback).collect()
    }
    by_day = {d: c for _, d, c in rows}
    for _, d, _ in rows:
        num = den = 0
        for lag in range(lookback + 1):
            prev = d - dt.timedelta(days=lag)
            if prev in by_day:
                w = 1 << (lookback - lag)
                num += by_day[prev] * w
                den += w
        assert got[d] == num / den, (series, lookback, d)
