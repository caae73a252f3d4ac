"""MLlib MinHashLSH variant: same contract as the hand-rolled
pipeline; on the planted near-dup fixture both implementations must
find the same pair with the same (exact-Jaccard) similarity."""

from __future__ import annotations

import pytest

from music_streaming_etl_spark.operators.dedup import dedup_minhash_pairs
from music_streaming_etl_spark.operators.dedup_mllib import dedup_minhash_mllib

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
    (3, "completely different words about spark catalyst tungsten shuffles"),
    (4, "another unrelated document mentioning windows aggregates and joins"),
]


def test_mllib_finds_planted_pair_and_agrees_with_handrolled(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    mllib = dedup_minhash_mllib(df, "doc_id", "text", threshold=0.5).collect()
    hand = dedup_minhash_pairs(
        df, "doc_id", "text", threshold=0.5, shingle_n=3
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in mllib] == [(1, 2)]
    assert [(r["id_a"], r["id_b"]) for r in hand] == [(1, 2)]
    # both report EXACT jaccard (MLlib's dist = 1 - true jaccard)
    assert mllib[0]["jaccard_sim"] == pytest.approx(
        hand[0]["jaccard_sim"], abs=1e-6
    )
