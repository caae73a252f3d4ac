"""semantic_dedup keep/drop semantics and duplicate-span stats."""

from __future__ import annotations

from pyspark.sql import Row

from music_streaming_etl_spark.operators.dedup import duplicate_span_stats
from music_streaming_etl_spark.operators.similarity import semantic_dedup


def test_semdedup_drops_near_dup_keeps_lowest_id(spark):
    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0], label=0),
            Row(vec_id=2, embedding=[0.999, 0.01], label=0),   # dup of 1 -> drop
            Row(vec_id=3, embedding=[0.0, 1.0], label=0),      # orthogonal -> keep
            Row(vec_id=4, embedding=[1.0, 0.0], label=1),      # other cluster -> keep
        ]
    )
    kept = sorted(
        r.vec_id
        for r in semantic_dedup(emb, "vec_id", "embedding", "label", 0.9).collect()
    )
    assert kept == [1, 3, 4]


def test_semdedup_chain_drops_against_any_lower_id(spark):
    """2 dups 1 (dropped); 3 dups 2 but NOT 1. The one-pass rule still
    drops 3 — it duplicates a lower id, surviving or not. This is the
    documented streaming relaxation of the paper's greedy sweep (which
    would keep 3, having removed 2 first)."""
    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0], label=0),
            Row(vec_id=2, embedding=[0.9, 0.4359], label=0),
            Row(vec_id=3, embedding=[0.62, 0.7846], label=0),
        ]
    )
    # cos(1,2)≈0.90, cos(2,3)≈0.90, cos(1,3)≈0.62
    kept = sorted(
        r.vec_id
        for r in semantic_dedup(emb, "vec_id", "embedding", "label", 0.85).collect()
    )
    assert kept == [1]


def test_duplicate_spans_counts(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f"),          # spans: abcde bcdef
            Row(doc_id=2, text="a b c d e x"),          # shares abcde
            Row(doc_id=3, text="p q r s t"),            # unique single span
            Row(doc_id=4, text="x y"),                  # too short: no spans
        ]
    )
    got = {
        r.doc_id: (r.n_spans, r.n_shared_spans, r.dup_fraction)
        for r in duplicate_span_stats(docs, "doc_id", "text", span_n=5).collect()
    }
    assert got == {
        1: (2, 1, 0.5),
        2: (2, 1, 0.5),
        3: (1, 0, 0.0),
    }
    assert 4 not in got
