"""Invariant checks on real testdata outputs (SURVEY §5's
property-style bounds: the facts that must hold regardless of data):
ratios in (0,1], hours in [0,23], top-k lengths ≤ k, quality scores in
[0,1], popularity index in (0,1], fingerprints well-formed."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_spark.plans.registry import REGISTRY


def _run(name, spark, sf_dir):
    fn, _ = REGISTRY[name]
    return fn(spark, sf_dir)


def test_diversity_and_hours_bounds(spark, sf_dir):
    rows = _run("hourly_kpis", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hour"] <= 23
        assert 0.0 < r["track_diversity_index"] <= 1.0
        assert r["unique_listeners"] >= 1


def test_topk_bounds(spark, sf_dir):
    rows = _run("agg_topk_by_freq", spark, sf_dir).collect()
    per_group = {}
    for r in rows:
        per_group.setdefault(r["hour"], []).append(r["rank"])
    for ranks in per_group.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_quality_scores_bounded(spark, sf_dir):
    rows = _run("text_stats", spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r["quality_score"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert r["n_tokens"] >= 1


def test_popularity_index_bounded(spark, sf_dir):
    rows = _run("popularity_index", spark, sf_dir).collect()
    assert any(r["popularity_index"] == 1.0 for r in rows) or all(
        r["popularity_index"] < 1.0 for r in rows
    )
    for r in rows:
        assert 0.0 < r["popularity_index"] <= 1.0


def test_fingerprints_wellformed(spark, sf_dir):
    rows = _run("doc_fingerprint", spark, sf_dir).collect()
    assert len({r["fingerprint"] for r in rows}) == len(rows)  # no dups in corpus
    for r in rows[:20]:
        assert len(r["fingerprint"]) == 32
        int(r["fingerprint"], 16)  # valid hex


def test_jaccard_pairs_bounded(spark, sf_dir):
    rows = _run("dedup_minhash", spark, sf_dir).collect()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert 0.0 < r["jaccard_sim"] <= 1.0


def test_round4_ops_handle_empty_input(spark):
    """Every round-4 operator must return an empty (not crashing, not
    null-row) frame on empty input — the behavior incremental
    pipelines hit on quiet days."""
    from music_streaming_etl_spark.operators.layout import zorder_values
    from music_streaming_etl_spark.operators.rollup import (
        cms_estimate,
        cms_reaggregate,
        cms_rollup,
        hist_quantiles,
        hist_reaggregate,
        hist_rollup,
    )
    from music_streaming_etl_spark.operators.sampling import seeded_shuffle
    from music_streaming_etl_spark.operators.skew import key_skew_profile

    empty_ev = spark.createDataFrame([], "ts timestamp, user_id long, v double")

    hist = hist_rollup(empty_ev, "ts", "day", [], "v", 0.0, 100.0, 10)
    assert hist.count() == 0
    assert hist_reaggregate(hist, "month", []).count() == 0
    assert hist_quantiles(hist, [], [0.5], 0.0, 100.0, 10).count() == 0

    cms = cms_rollup(empty_ev, "ts", "day", [], "user_id", depth=2, width=8)
    assert cms.count() == 0
    probes = spark.range(3).select(F.col("id").alias("user_id"))
    merged = cms_reaggregate(cms, "month", [])
    assert cms_estimate(merged, probes, [], "user_id", depth=2, width=8).count() == 0

    empty_kv = spark.createDataFrame([], "k long, v string")
    assert key_skew_profile(empty_kv, "k").count() == 0
    assert seeded_shuffle(empty_kv, "k", "s").count() == 0
    # zorder: the span aggregate yields one all-null row; the cross
    # join against zero data rows must still be empty
    assert zorder_values(empty_kv.select(F.col("k").alias("a"), F.col("k").alias("b")), ["a", "b"]).count() == 0


def test_round5_ops_handle_empty_input(spark):
    """Round-5 operators on empty input: empty output, no crash."""
    from music_streaming_etl_spark.operators.graph import pagerank
    from music_streaming_etl_spark.operators.timeseries import locf

    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty_edges, iterations=2).count() == 0

    empty_ts = spark.createDataFrame([], "k long, d date, v long")
    assert locf(empty_ts, ["k"], ["d"], ["v"]).count() == 0

    # observe() on an empty frame still yields a 0-count metrics row
    from music_streaming_etl_spark.operators.validation import (
        observation_result,
        observed_quality_metrics,
    )

    empty = spark.createDataFrame([], "id long, v string")
    observed, obs = observed_quality_metrics(empty, ["id", "v"])
    observed.write.format("noop").mode("overwrite").save()
    res = observation_result(obs, ["id", "v"])
    assert not res.passed  # nonempty check fails on 0 rows
    assert res.details["total_rows"] == 0
