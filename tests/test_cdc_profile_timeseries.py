"""snapshot_diff / apply_delta round trip, LOCF semantics, and the
one-pass profiler — the warehouse-maintenance operator block."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.cdc import apply_delta, snapshot_diff
from music_streaming_etl_spark.operators.profile import profile_columns
from music_streaming_etl_spark.operators.timeseries import locf


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k bigint, a string, b double")


def test_snapshot_diff_classifies_all_four(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0), (4, None, 4.0)])
    new = _snap(spark, [(2, "y", 2.0), (3, "z", 30.0), (4, None, 4.0), (5, "w", 5.0)])
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: "delete",
        2: "unchanged",
        3: "update",
        4: "unchanged",  # null-safe compare: None == None
        5: "insert",
    }


def test_snapshot_diff_null_vs_empty_string_differ(spark):
    """The digest must not conflate NULL with '' or with the literal
    sentinel-free rendering of adjacent columns."""
    old = _snap(spark, [(1, None, 1.0), (2, "a\x1fb", 2.0)])
    new = _snap(spark, [(1, "", 1.0), (2, "a", 2.0)])
    got = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "update", 2: "update"}


def test_apply_delta_reproduces_new_snapshot(spark):
    old = _snap(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _snap(spark, [(2, "y", 2.0), (3, "z", 30.0), (5, "w", 5.0)])
    diff = snapshot_diff(old, new, ["k"])
    rebuilt = apply_delta(old, new, diff, ["k"])
    assert sorted(map(tuple, rebuilt.collect())) == sorted(map(tuple, new.collect()))


def test_locf_carries_forward_and_leaves_leading_nulls(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(k=1, seq=0, ts=t0, v=None),
        Row(k=1, seq=1, ts=t0, v=10.0),   # same ts: seq breaks the tie
        Row(k=1, seq=2, ts=dt.datetime(2024, 1, 2), v=None),
        Row(k=1, seq=3, ts=dt.datetime(2024, 1, 3), v=20.0),
        Row(k=2, seq=4, ts=t0, v=None),   # never observed
    ]
    df = spark.createDataFrame(rows).repartition(3)
    got = {
        (r.k, r.seq): r.v_filled
        for r in locf(df, ["k"], ["ts", "seq"], ["v"]).collect()
    }
    assert got == {
        (1, 0): None,
        (1, 1): 10.0,
        (1, 2): 10.0,
        (1, 3): 20.0,
        (2, 4): None,
    }


def test_profile_columns_single_job_and_values(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 2.5), (2, None, 7.5)],
        "k bigint, s string, d double",
    )
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert set(prof) == {"k", "s", "d"}
    assert (prof["k"].n_rows, prof["k"].n_nulls, prof["k"].n_distinct) == (3, 0, 2)
    assert (prof["s"].n_nulls, prof["s"].n_distinct) == (1, 2)
    assert (prof["d"].min_value, prof["d"].max_value) == ("2.5", "7.5")
    # one aggregation pass: exactly one Aggregate over the scan, no union
    plan = profile_columns(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("union") == 0


def test_funnel_counts_ordering_semantics(spark):
    """Funnel steps must be STRICTLY ordered per user: a purchase
    before the first view doesn't count, a click at the exact view
    timestamp doesn't count (strict >)."""
    import datetime as dt

    from music_streaming_etl_spark.operators.timeseries import funnel_counts

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # user 1: full ordered funnel
        (1, s(0), "view"), (1, s(10), "click"), (1, s(20), "purchase"),
        # user 2: purchase BEFORE view — stops at view
        (2, s(5), "purchase"), (2, s(10), "view"),
        # user 3: click at the exact view timestamp — strict > rejects
        (3, s(0), "view"), (3, s(0), "click"),
        # user 4: never views — contributes nothing
        (4, s(0), "click"), (4, s(1), "purchase"),
        # user 5: view → click, second click later, no purchase
        (5, s(0), "view"), (5, s(1), "click"), (5, s(2), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = funnel_counts(df, "user_id", "ts", "event_type",
                        ["view", "click", "purchase"]).collect()[0]
    assert (out["n_view"], out["n_click"], out["n_purchase"]) == (4, 2, 1)


def test_funnel_single_shuffle_plan(spark, sf_dir):
    """However many steps, the funnel must cost ONE exchange on the
    user key (stacked same-partition windows) plus the 1-row final
    aggregate's single-partition exchange."""
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_funnel_conversion,
    )

    df = q_funnel_conversion(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
