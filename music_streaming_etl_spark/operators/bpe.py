"""Byte-pair-encoding tokenizer, trained and applied distributed.

The engine's other token counters (``text.n_tokens_bpe``) are regex
heuristics; a real training pipeline tokenizes with a LEARNED BPE
vocabulary. Both halves are formulated for 100 TB:

- **Training never touches the corpus after one pass.** BPE statistics
  depend only on the *word-frequency table* (distinct word → count) —
  at web scale that's millions of rows where the corpus is trillions
  of tokens. ``bpe_train`` builds it with one exploded groupBy, then
  runs ``num_merges`` driver-coordinated iterations (the same
  iterate-on-aggregates pattern as the k-means codebook,
  ``similarity.kmeans_codebook``): each round one pair-count shuffle
  over the vocab frame + a 1-row argmax collect. The per-round merge
  rewrite is an Arrow-batched pandas UDF over the vocab frame only.
- **Encoding is embarrassingly parallel.** ``bpe_encode`` applies the
  learned merge list per row via a pandas UDF with a per-batch word
  cache (Zipf's law: a batch's distinct-word count is far below its
  token count, so each unique word is merged once per batch).

Determinism: merge selection breaks count ties lexicographically on
the pair, so the learned vocabulary is a pure function of the corpus —
rerun-stable across partitionings (the engine-wide total-order rule).
Matches the classic Sennrich et al. 2016 algorithm; verified
token-for-token against a pure-Python reference in
``tests/test_bpe.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens

END = "</w>"  # end-of-word marker: merges can't cross word boundaries


def word_frequency_table(df: DataFrame, text_col: str) -> DataFrame:
    """One corpus pass: distinct word → count."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")  # split('') yields [''] on empty docs
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_once_udf(a: str, b: str):
    merged = a + b

    @F.pandas_udf("array<string>")
    def merge_once(syms: pd.Series) -> pd.Series:
        def apply(s: list) -> list:
            out, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(apply)

    return merge_once


def bpe_train(
    words: DataFrame, num_merges: int, min_pair_freq: int = 2
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a word-frequency table
    (columns ``word``, ``freq``). Stops early when no pair reaches
    ``min_pair_freq``. Returns the ordered merge list."""
    vocab = words.select(
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))).alias("syms"),
        F.col("freq").cast("bigint").alias("freq"),
    ).localCheckpoint()  # cut lineage: each round builds on the last
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1).alias("a"),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1).alias("b"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("a"), F.asc("b")).limit(1).collect()
        if not top or top[0]["n"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _merge_once_udf(a, b)(F.col("syms")).alias("syms"), "freq"
        ).localCheckpoint()
    return merges


def _encode_word(word: str, merges: Sequence[tuple[str, str]]) -> list[str]:
    syms = list(word) + [END]
    for a, b in merges:
        out, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        if len(syms) == 1:
            break
    return syms


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list. Per-batch word
    cache: each distinct word in an Arrow batch is merged once."""
    merge_list = list(merges)

    @F.pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(text) -> list:
            if text is None:
                return []
            out: list[str] = []
            for w in text.lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, merge_list)
                out.extend(got)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, encode(F.col(text_col)))
