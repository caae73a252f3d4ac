"""Unit tests for the chunking / repetition / contamination /
unigram-LM / centroid operators on literal frames — pins the edge
cases the synthetic-corpus oracle can't see (short docs, stop-shingle
cap actually dropping rows, partitioning-independence of the decimal
centroid sums)."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.dedup import contamination_pairs
from music_streaming_etl_spark.operators.similarity import label_centroids
from music_streaming_etl_spark.operators.text import (
    chunk_documents,
    repetition_stats,
    unigram_commonness,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunk_documents_covers_every_token_with_overlap(spark):
    text = " ".join(f"t{i}" for i in range(10))
    df = _docs(spark, [(1, text)])
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, stride=3).collect()
    # starts at token 1, 4, 7, 10 -> 4 chunks; last is short
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert out[3].chunk_text == "t9" and out[3].n_chunk_tokens == 1
    assert [r.n_chunk_tokens for r in out[:3]] == [4, 4, 4]


def test_chunk_documents_short_doc_single_chunk(spark):
    out = chunk_documents(
        _docs(spark, [(1, "only three tokens")]), "doc_id", "text", 64, 48
    ).collect()
    assert len(out) == 1
    assert out[0].chunk_text == "only three tokens"
    assert out[0].n_chunk_tokens == 3


def test_repetition_stats_flags_boilerplate(spark):
    natural = "the quick brown fox jumps over the lazy dog today"
    spam = " ".join(["buy now cheap"] * 10)
    out = {
        r.doc_id: r
        for r in repetition_stats(
            _docs(spark, [(1, natural), (2, spam)]), "doc_id", "text"
        ).collect()
    }
    assert out[1].repeated_ngram_ratio < 0.2
    assert out[2].repeated_ngram_ratio > 0.8
    # short doc: fewer than n tokens -> zero ngrams, ratio 0
    short = repetition_stats(_docs(spark, [(3, "two words")]), "doc_id", "text")
    r = short.collect()[0]
    assert r.n_ngrams == 0 and r.repeated_ngram_ratio == 0.0


def test_contamination_cap_drops_boilerplate_shingles(spark):
    # both corpus docs share the 5-gram-rich template with BOTH bench
    # docs; with the df-cap at 1 the template shingles (df=2) vanish
    # and only the genuine unique overlap with bench doc 100 survives
    template = "common header one two three four five six seven eight"
    unique = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = _docs(spark, [(1, template + " " + unique), (2, template)])
    bench = _docs(
        spark, [(100, template + " " + unique), (101, template)]
    )
    capped = contamination_pairs(
        corpus, bench, "doc_id", "text", shingle_n=5, min_shared=3,
        max_shingle_df=1,
    ).collect()
    assert {(r.doc_id, r.bench_id) for r in capped} == {(1, 100)}
    uncapped = contamination_pairs(
        corpus, bench, "doc_id", "text", shingle_n=5, min_shared=3,
        max_shingle_df=None,
    ).collect()
    assert {(r.doc_id, r.bench_id) for r in uncapped} == {
        (1, 100), (1, 101), (2, 100), (2, 101)
    }


def test_unigram_commonness_orders_docs_by_rarity(spark):
    rows = [(i, "common words here") for i in range(10)] + [
        (99, "xylophone quixotic zephyr")
    ]
    out = {
        r.doc_id: r.mean_token_freq
        for r in unigram_commonness(
            _docs(spark, rows), "doc_id", "text"
        ).collect()
    }
    assert out[0] == 10.0  # every token occurs in all 10 copies
    assert out[99] == 1.0  # every token unique
    assert out[0] > out[99]


def test_label_centroids_partitioning_independent(spark):
    emb = spark.createDataFrame(
        [(i, i % 3, [float(i) / 7.0, -float(i) / 11.0]) for i in range(30)],
        ["vec_id", "label", "embedding"],
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    a = label_centroids(emb.repartition(1), "label", "embedding")
    b = label_centroids(emb.repartition(13, "vec_id"), "label", "embedding")
    rows_a = sorted(a.collect(), key=lambda r: (r.label, r.dim))
    rows_b = sorted(b.collect(), key=lambda r: (r.label, r.dim))
    assert [tuple(r) for r in rows_a] == [tuple(r) for r in rows_b]
    assert len(rows_a) == 6  # 3 labels x 2 dims
    assert all(r.n_vectors == 10 for r in rows_a)
