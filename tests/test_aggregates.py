"""Unit tests for the deterministic aggregate operators (SURVEY.md
§2.4) on tiny literal frames — pins the pandas-compat edge cases:
mode tie-break, null handling, diversity denominator, null-group drop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.aggregates import (
    agg_count_distinct,
    agg_diversity_ratio,
    agg_mode,
    agg_topk_by_freq,
    drop_null_group_keys,
    topk_by_freq_ranked,
)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_mode_tie_break_lexicographic(spark):
    # b and a both appear twice in g1 → pandas mode()[0] picks 'a'
    df = _df(
        spark,
        [("g1", "b"), ("g1", "b"), ("g1", "a"), ("g1", "a"), ("g1", "c")],
        ["g", "v"],
    )
    out = agg_mode(df, ["g"], "v", "m").collect()
    assert out == [("g1", "a")] or (out[0]["g"], out[0]["m"]) == ("g1", "a")


def test_mode_ignores_nulls_and_empty_group_absent(spark):
    df = _df(
        spark,
        [("g1", "x"), ("g1", None), ("g1", None), ("g2", None)],
        ["g", "v"],
    )
    rows = {r["g"]: r["m"] for r in agg_mode(df, ["g"], "v", "m").collect()}
    # nulls never win even when most frequent; all-null group yields no row
    assert rows == {"g1": "x"}


def test_topk_rank_and_tie_break(spark):
    # counts: a=3, b=3, c=2, d=1 → order a(1), b(2), c(3), d(4)
    rows = [("h", v) for v in ["a", "a", "a", "b", "b", "b", "c", "c", "d"]]
    df = _df(spark, rows, ["g", "v"])
    ranked = topk_by_freq_ranked(df, ["g"], "v", 3).collect()
    got = {(r["rank"]): r["v"] for r in ranked}
    assert got == {1: "a", 2: "b", 3: "c"}
    arr = agg_topk_by_freq(df, ["g"], "v", 3, "top").collect()[0]["top"]
    assert arr == ["a", "b", "c"]


def test_topk_drops_null_values(spark):
    rows = [("h", None), ("h", None), ("h", "z")]
    df = _df(spark, rows, ["g", "v"])
    arr = agg_topk_by_freq(df, ["g"], "v", 5, "top").collect()[0]["top"]
    assert arr == ["z"]


def test_diversity_denominator_includes_nulls(spark):
    # 2 distinct non-null track of 4 total rows (one null) → 2/4
    df = _df(
        spark,
        [("h", "t1"), ("h", "t1"), ("h", "t2"), ("h", None)],
        ["g", "t"],
    )
    out = agg_diversity_ratio(df, ["g"], "t", "ix").collect()[0]
    assert out["ix"] == 0.5


def test_count_distinct_exact_and_approx(spark):
    df = _df(spark, [("g", i % 7) for i in range(100)], ["g", "u"])
    exact = agg_count_distinct(df, ["g"], "u", "n").collect()[0]["n"]
    approx = agg_count_distinct(df, ["g"], "u", "n", approximate=True).collect()[0][
        "n"
    ]
    assert exact == 7
    assert abs(approx - 7) <= 1


def test_drop_null_group_keys(spark):
    df = _df(spark, [("a", 1), (None, 2), ("b", 3)], ["g", "x"])
    kept = drop_null_group_keys(df, ["g"]).collect()
    assert sorted(r["g"] for r in kept) == ["a", "b"]


def test_revenue_percentiles_approx_tracks_exact(spark, sf_dir):
    """The sketch variant must stay within 2% relative error of the
    exact nearest-rank percentiles per segment — the bound that makes
    it a safe 100 TB drop-in."""
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_revenue_percentiles,
        q_revenue_percentiles_approx,
    )

    exact = {
        r["c_mktsegment"]: (r["p50"], r["p90"], r["p99"])
        for r in q_revenue_percentiles(spark, sf_dir).collect()
    }
    approx = {
        r["c_mktsegment"]: (r["p50"], r["p90"], r["p99"])
        for r in q_revenue_percentiles_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx) and exact
    for seg, vals in exact.items():
        for e, a in zip(vals, approx[seg]):
            assert abs(a - e) <= 0.02 * abs(e), (seg, e, a)
