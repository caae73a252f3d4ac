"""Continuous-aggregate invariants: rollup-of-rollup == direct
aggregate (exact measures), HLL union == direct sketch (mergeable
distinct), plus the grain guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.rollup import (
    hll_reaggregate,
    hll_rollup,
    reaggregate,
    time_rollup,
)


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet")


def test_reaggregate_equals_direct(spark, orders):
    daily = time_rollup(
        orders, "o_orderdate", "day", ["o_orderstatus"],
        {
            "revenue": F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double"),
            "n_orders": F.count(F.lit(1)).cast("bigint"),
        },
    )
    monthly = reaggregate(daily, "month", ["o_orderstatus"], ["revenue", "n_orders"])
    direct = (
        orders.withColumn("bucket", F.date_trunc("month", F.col("o_orderdate")))
        .groupBy("bucket", "o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    a = sorted(map(tuple, monthly.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b  # bit-for-bit, not approx


def test_hll_union_equals_direct_sketch(spark, orders):
    daily = hll_rollup(orders, "o_orderdate", "day", [], "o_custkey")
    merged = hll_reaggregate(daily, "month", [])
    direct = (
        orders.withColumn("bucket", F.date_trunc("month", F.col("o_orderdate")))
        .groupBy("bucket")
        .agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sketch"))
        .select(
            "bucket",
            F.hll_sketch_estimate("sketch").cast("bigint").alias("approx_distinct"),
        )
    )
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b  # union of same-lgK sketches is lossless


def test_hll_estimate_near_exact(spark, orders):
    merged = {
        r.bucket: r.approx_distinct
        for r in hll_reaggregate(
            hll_rollup(orders, "o_orderdate", "day", [], "o_custkey"), "month", []
        ).collect()
    }
    exact = {
        r.bucket: r.n
        for r in orders.withColumn(
            "bucket", F.date_trunc("month", F.col("o_orderdate"))
        )
        .groupBy("bucket")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(merged) == set(exact)
    for k, est in merged.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k])


def test_bad_grain_raises(spark, orders):
    with pytest.raises(ValueError, match="grain"):
        time_rollup(orders, "o_orderdate", "decade", [], {"n": F.count(F.lit(1))})


def test_hist_merge_equals_direct(spark, orders):
    """Daily→monthly histogram merge must equal the direct monthly
    histogram bit-for-bit — counts are integers, the merge is exact."""
    from music_streaming_etl_spark.operators.rollup import (
        hist_reaggregate,
        hist_rollup,
    )

    daily = hist_rollup(
        orders, "o_orderdate", "day", ["o_orderpriority"],
        "o_totalprice", 0.0, 500000.0, 1000,
    )
    merged = hist_reaggregate(daily, "month", ["o_orderpriority"])
    direct = hist_rollup(
        orders, "o_orderdate", "month", ["o_orderpriority"],
        "o_totalprice", 0.0, 500000.0, 1000,
    )
    key = lambda r: (r["bucket"], r["o_orderpriority"], r["bidx"])
    assert sorted(map(tuple, merged.collect()), key=lambda t: str(t)) == sorted(
        map(tuple, direct.collect()), key=lambda t: str(t)
    )


def test_hist_quantile_within_bucket_width(spark, orders):
    """The histogram p50 is the upper edge of the nearest-rank
    median's bucket: exact_value < est <= exact_value + width."""
    import math

    from music_streaming_etl_spark.operators.rollup import (
        hist_quantiles,
        hist_rollup,
    )

    hist = hist_rollup(
        orders, "o_orderdate", "month", [], "o_totalprice", 0.0, 500000.0, 1000
    )
    est = {
        r["bucket"]: r["est"]
        for r in hist_quantiles(hist, [], [0.5], 0.0, 500000.0, 1000).collect()
    }
    vals: dict = {}
    for r in orders.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("bucket"),
        "o_totalprice",
    ).collect():
        vals.setdefault(r["bucket"], []).append(r["o_totalprice"])
    assert est.keys() == vals.keys()
    for b, vs in vals.items():
        vs.sort()
        nearest_rank = vs[math.ceil(0.5 * len(vs)) - 1]
        assert nearest_rank < est[b] <= nearest_rank + 500.0


def test_cms_merge_equals_direct_and_bounds(spark):
    """Daily→monthly CMS merge equals the direct monthly sketch
    bit-for-bit, and every estimate obeys the one-sided CMS bound:
    exact ≤ est ≤ exact + collision mass (≲ N/width)."""
    import datetime as dt

    from music_streaming_etl_spark.operators.rollup import (
        cms_estimate,
        cms_reaggregate,
        cms_rollup,
    )

    rows = []
    base = dt.datetime(2024, 5, 1)
    for day in range(10):
        for u in range(100):
            # user u appears u+1 times on each of 10 days
            rows.extend(
                (base + dt.timedelta(days=day, seconds=i), u)
                for i in range(u + 1)
            )
    df = spark.createDataFrame(rows, "ts timestamp, user_id int")

    daily = cms_rollup(df, "ts", "day", [], "user_id", depth=4, width=256)
    merged = cms_reaggregate(daily, "month", [])
    direct = cms_rollup(df, "ts", "month", [], "user_id", depth=4, width=256)
    k = lambda r: (r["bucket"], r["row_i"], r["col_j"], r["cnt"])
    assert sorted(map(k, merged.collect())) == sorted(map(k, direct.collect()))

    probes = spark.range(0, 100).select(F.col("id").alias("user_id"))
    est = {
        r["user_id"]: r["est_count"]
        for r in cms_estimate(merged, probes, [], "user_id", depth=4, width=256).collect()
    }
    n_total = len(rows)
    for u in range(100):
        exact = (u + 1) * 10
        assert est[str(u)] >= exact, (u, est[str(u)], exact)
        assert est[str(u)] <= exact + 2 * n_total / 256 * 4  # loose ε bound
