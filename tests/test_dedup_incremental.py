"""Incremental dedup: a new ingest batch against a persisted corpus
MinHash index — near-dups of corpus docs are rejected with their
match, novel docs pass, and the corpus is never re-shingled."""

from __future__ import annotations

from music_streaming_etl_spark.operators.dedup import (
    dedup_incremental,
    minhash_index,
)

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog again and again today"),
    (2, "completely different words about spark catalyst tungsten shuffles"),
]
BATCH = [
    # near-dup of corpus doc 1 (one word changed)
    (101, "the quick brown fox jumps over the lazy dog again and again tomorrow"),
    # novel
    (102, "entirely new content with no overlap whatsoever in any shingle"),
]


def test_incremental_rejects_corpus_neardups(spark, tmp_path):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    sh, mins = minhash_index(corpus, "doc_id", "text", shingle_n=3)
    # persist the index (the production flow) and reload
    sh.write.parquet(str(tmp_path / "sh"))
    mins.write.parquet(str(tmp_path / "mins"))
    sh2 = spark.read.parquet(str(tmp_path / "sh"))
    mins2 = spark.read.parquet(str(tmp_path / "mins"))

    batch = spark.createDataFrame(BATCH, "doc_id long, text string")
    kept, matches = dedup_incremental(
        batch, "doc_id", "text", sh2, mins2, threshold=0.5, shingle_n=3
    )
    assert [r["doc_id"] for r in kept.collect()] == [102]
    m = matches.collect()
    assert len(m) == 1
    assert (m[0]["id_new"], m[0]["id_corpus"]) == (101, 1)
    assert m[0]["jaccard_sim"] > 0.5


def test_incremental_empty_batch_after_self_ingest(spark, tmp_path):
    """Re-ingesting the corpus itself rejects everything (jaccard 1)."""
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    sh, mins = minhash_index(corpus, "doc_id", "text", shingle_n=3)
    re_batch = spark.createDataFrame(
        [(900 + i, t) for i, t in CORPUS], "doc_id long, text string"
    )
    kept, matches = dedup_incremental(
        re_batch, "doc_id", "text", sh, mins, threshold=0.99, shingle_n=3
    )
    assert kept.count() == 0
    assert {r["jaccard_sim"] for r in matches.collect()} == {1.0}
