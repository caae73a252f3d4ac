"""interval_join: equivalence to the naive theta join, boundary
semantics, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.joins import interval_join


def _naive(points, intervals, p, s, e):
    return points.join(
        intervals, (F.col(p) >= F.col(s)) & (F.col(p) < F.col(e))
    )


def test_interval_join_matches_naive_theta_join(spark):
    rng = random.Random(7)
    pts = spark.createDataFrame(
        [(i, rng.randint(0, 400)) for i in range(300)], "pid long, v long"
    )
    ivs = spark.createDataFrame(
        [
            (j, s, s + rng.randint(1, 60))
            for j in range(40)
            for s in [rng.randint(-20, 380)]
        ],
        "iid long, s long, e long",
    )
    for width in (7, 30, 100):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(pts, ivs, "v", "s", "e", width).collect()
        )
        want = sorted(
            (r["pid"], r["iid"]) for r in _naive(pts, ivs, "v", "s", "e").collect()
        )
        assert got == want, f"width={width}"


def test_interval_join_boundaries(spark):
    """start inclusive, end exclusive; empty/negative domains fine."""
    pts = spark.createDataFrame([(1, 10), (2, 20), (3, -5)], "pid long, v long")
    ivs = spark.createDataFrame([(100, 10, 20), (200, -10, 0)], "iid long, s long, e long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "v", "s", "e", 8).collect()
    )
    assert got == [(1, 100), (3, 200)]  # v=20 excluded (end-exclusive)


def test_interval_join_plans_no_nested_loop(spark, sf_dir):
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_range_join_windows,
    )

    plan = (
        q_range_join_windows(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
