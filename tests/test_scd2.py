"""SCD2 history building: consecutive-duplicate collapse, interval
chaining, open current version, and the point-in-time join use case."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.scd import scd2_history


def _ts(h):
    return dt.datetime(2024, 1, 1, h, 0, 0)


def _feed(spark):
    rows = [
        # user 1: free -> free (re-observed, no new version) -> pro -> free
        Row(user_id=1, tier="free", ts=_ts(0), seq=0),
        Row(user_id=1, tier="free", ts=_ts(1), seq=1),
        Row(user_id=1, tier="pro", ts=_ts(2), seq=2),
        Row(user_id=1, tier="free", ts=_ts(3), seq=3),
        # user 2: single observation -> one open version
        Row(user_id=2, tier="pro", ts=_ts(5), seq=4),
        # user 3: null state is a real state; null -> pro is a change
        Row(user_id=3, tier=None, ts=_ts(0), seq=5),
        Row(user_id=3, tier=None, ts=_ts(1), seq=6),
        Row(user_id=3, tier="pro", ts=_ts(2), seq=7),
    ]
    return spark.createDataFrame(rows).repartition(4)


def test_scd2_collapses_and_chains(spark):
    hist = scd2_history(
        _feed(spark), ["user_id"], ["tier"], "ts", tiebreak=["seq"]
    ).orderBy("user_id", "valid_from")
    got = [
        (r.user_id, r.tier, r.valid_from.hour,
         None if r.valid_to is None else r.valid_to.hour, r.is_current)
        for r in hist.collect()
    ]
    assert got == [
        (1, "free", 0, 2, False),
        (1, "pro", 2, 3, False),
        (1, "free", 3, None, True),
        (2, "pro", 5, None, True),
        (3, None, 0, 2, False),
        (3, "pro", 2, None, True),
    ]


def test_scd2_point_in_time_join(spark):
    """The reason SCD2 exists: join a fact to the version valid at the
    fact's timestamp — every fact matches exactly one version."""
    hist = scd2_history(_feed(spark), ["user_id"], ["tier"], "ts", tiebreak=["seq"])
    facts = spark.createDataFrame(
        [
            Row(user_id=1, fact_ts=_ts(1)),   # during first 'free'
            Row(user_id=1, fact_ts=_ts(2)),   # boundary: starts 'pro'
            Row(user_id=1, fact_ts=_ts(23)),  # open current version
            Row(user_id=2, fact_ts=_ts(6)),
        ]
    )
    joined = facts.join(
        hist,
        (facts.user_id == hist.user_id)
        & (facts.fact_ts >= hist.valid_from)
        & (hist.valid_to.isNull() | (facts.fact_ts < hist.valid_to)),
    )
    got = sorted(
        (r.fact_ts.hour, r.tier) for r in joined.select("fact_ts", "tier").collect()
    )
    assert got == [(1, "free"), (2, "pro"), (6, "pro"), (23, "free")]
    # exactly one version per fact
    assert joined.count() == facts.count()
