"""Distributed BPE vs a pure-Python reference (Sennrich et al. 2016):
identical merge lists and identical encodings, plus determinism
across partitionings."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Row

from music_streaming_etl_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_train,
    word_frequency_table,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


def _ref_train(texts, num_merges, min_pair_freq=2):
    """Reference BPE trainer: dict-of-tuples vocabulary, argmax with
    lexicographic tie-break."""
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + [END])] += 1
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += freq
        if not pairs:
            break
        # max count, then lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        (a, b) = best[0]
        merges.append((a, b))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def _ref_encode(word, merges):
    syms = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _docs(spark, n_parts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)]
    ).repartition(n_parts)


def test_train_matches_reference(spark):
    words = word_frequency_table(_docs(spark, 3), "text")
    got = bpe_train(words, num_merges=10)
    assert got == _ref_train(CORPUS, 10)
    assert len(got) == 10


def test_train_deterministic_across_partitionings(spark):
    m1 = bpe_train(word_frequency_table(_docs(spark, 1), "text"), 6)
    m8 = bpe_train(word_frequency_table(_docs(spark, 8), "text"), 6)
    assert m1 == m8


def test_encode_matches_reference(spark):
    merges = _ref_train(CORPUS, 8)
    out = {
        r.doc_id: r.bpe_tokens
        for r in bpe_encode(_docs(spark, 2), "text", merges).collect()
    }
    for i, t in enumerate(CORPUS):
        want = [s for w in t.lower().split() for s in _ref_encode(w, merges)]
        assert out[i] == want


def test_encode_handles_null_and_unseen(spark):
    merges = _ref_train(CORPUS, 4)
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="zzz low")]
    )
    got = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, "text", merges).collect()}
    assert got[1] == []
    assert got[2] == _ref_encode("zzz", merges) + _ref_encode("low", merges)


def test_early_stop_when_no_frequent_pairs(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="ab cd ef")])
    merges = bpe_train(word_frequency_table(df, "text"), 50, min_pair_freq=2)
    assert merges == []
