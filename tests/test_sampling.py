"""Sampling determinism properties: partitioning-invariance (the whole
point vs df.sample), split stability under corpus growth, stratum
isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_val_split,
)


def test_sample_is_partitioning_invariant(spark):
    df = spark.range(0, 5000).selectExpr("id AS doc_id")
    a = set(
        r["doc_id"]
        for r in deterministic_sample(df.repartition(1), "doc_id", 0.3).collect()
    )
    b = set(
        r["doc_id"]
        for r in deterministic_sample(df.repartition(17), "doc_id", 0.3).collect()
    )
    assert a == b
    assert 0.25 < len(a) / 5000 < 0.35  # ~30%


def test_split_stable_under_growth(spark):
    small = spark.range(0, 1000).selectExpr("id AS doc_id")
    big = spark.range(0, 2000).selectExpr("id AS doc_id")
    s_small = {
        r["doc_id"]: r["split"]
        for r in train_val_split(small, "doc_id").collect()
    }
    s_big = {
        r["doc_id"]: r["split"] for r in train_val_split(big, "doc_id").collect()
    }
    # every original doc keeps its split when the corpus doubles
    assert all(s_big[k] == v for k, v in s_small.items())


def test_stratified_fractions_respected(spark):
    df = spark.range(0, 4000).selectExpr(
        "id AS doc_id", "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS lang"
    )
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.25, "de": 1.0})
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["de"] == 2000  # full stratum kept
    assert 400 < counts["en"] < 600  # ~25% of 2000
