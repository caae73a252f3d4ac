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
