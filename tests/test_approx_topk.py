"""approx_top_k sketch vs exact counts: on this corpus the sketch
capacity (default 10k items) far exceeds the vocabulary, so the
estimates must be EXACT — any deviation means the plumbing (explode,
struct unpack, cast) corrupted counts, not that the sketch 'was
approximate'."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_spark.plans.analytics_queries import q_approx_topk_tokens
from music_streaming_etl_spark.plans.testdata_queries import _t
from music_streaming_etl_spark.operators.text import tokens


def test_approx_topk_matches_exact_on_small_vocab(spark, sf_dir):
    approx = {
        r["token"]: r["n"] for r in q_approx_topk_tokens(spark, sf_dir).collect()
    }
    tok = _t(spark, sf_dir, "documents").select(
        F.explode(tokens("text")).alias("token")
    )
    exact = {
        r["token"]: r["n"]
        for r in tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(10)
        .collect()
    }
    assert len(approx) == 10
    # same counts for every reported token (ties at the cut line may
    # legitimately pick a different member, so compare count values
    # through the exact table rather than the exact top-10 set)
    full = {
        r["token"]: r["n"]
        for r in tok.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for t, n in approx.items():
        assert full[t] == n, (t, n, full[t])
    # and the reported counts dominate: the 10th approx count is >=
    # the true 10th-largest count only if the sketch kept the heavy
    # hitters — with capacity >> vocab it must equal the exact set's
    assert sorted(approx.values(), reverse=True) == sorted(
        exact.values(), reverse=True
    )
