"""Unit tests for text-analysis + dedup operators on literal frames —
pins behavior the oracle harness can't see (true near-dups, exact
duplicates, short-doc edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.dedup import (
    dedup_exact,
    dedup_minhash_pairs,
    embedding_neardup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from music_streaming_etl_spark.operators.text import (
    doc_fingerprint,
    lang_id,
    n_tokens,
    n_tokens_bpe,
    shingles,
)


def test_dedup_exact_keeps_first_and_normalizes(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello  World", "a"),
            (2, "hello world", "b"),  # dup after normalization
            (3, "something else", "c"),
        ],
        "doc_id long, text string, src string",
    )
    out = dedup_exact(df, "text", "doc_id", ["src"]).collect()
    assert sorted((r["doc_id"], r["src"]) for r in out) == [(1, "a"), (3, "c")]


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c d",)], "text string")
    out = df.select(shingles("text", 3).alias("sh")).collect()
    assert out[0]["sh"] == []
    assert out[1]["sh"] == ["a b c", "b c d"]


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")
    far = "completely different words about spark catalyst tungsten shuffles"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = dedup_minhash_pairs(
        df, "doc_id", "text", threshold=0.5, num_hashes=16, num_bands=4, shingle_n=3
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["jaccard_sim"] > 0.5


def test_ngram_jaccard_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e", "s"), (2, "a b c d e", "s"), (3, "x y z w v", "s")],
        "doc_id long, text string, source string",
    )
    pairs = ngram_jaccard_pairs(
        df, "doc_id", "text", threshold=0.99, shingle_n=3, block_col="source"
    ).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard_sim"]) for r in pairs] == [(1, 2, 1.0)]


def test_simhash_identical_zero_hamming(spark):
    df = spark.createDataFrame(
        [(1, "same words here", "g"), (2, "same words here", "g"),
         (3, "utterly different tokens entirely", "g")],
        "doc_id long, text string, lang string",
    )
    pairs = simhash_near_pairs(df, "doc_id", "text", max_hamming=0, block_col="lang")
    got = [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()]
    assert got == [(1, 2, 0)]


def test_embedding_neardup_identical_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.001], 0), (3, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    pairs = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.99, bucket_col="label"
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_embedding_neardup_ragged_vectors_raise(spark):
    """ADVICE r4: ragged vector lengths within a bucket must raise a
    named error, not numpy's opaque shape failure (or the silent
    tolerance of the old positional-join form)."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0, 0.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    with _pytest.raises(Exception, match="ragged vector lengths"):
        embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.5, bucket_col="label"
        ).collect()


def test_winnow_k_overflow_guard(spark):
    """ADVICE r4: k ≥ 8 can overflow the int64 polynomial gram hash
    on non-ASCII text — construction must fail with the bound named,
    not ARITHMETIC_OVERFLOW mid-job."""
    import pytest as _pytest

    from music_streaming_etl_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame([(1, "abcdefghij")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="max supported k is 7"):
        winnow_fingerprints(df, "doc_id", "text", k=8)
    # k=7 stays inside int64 even at codepoint 0x10FFFF
    assert winnow_fingerprints(df, "doc_id", "text", k=7).count() > 0


def test_winnow_gen4_matches_reference_python(spark):
    """The r7 mapInPandas winnowing (doc-grain numpy) must reproduce
    the definition exactly at every boundary grain: n_grams < window
    (all-truncated tails), n_grams == window (exactly one full window
    — the off-by-one the sliding-view branch can hide), n_grams >
    window, and multi-char docs with repeats (distinct-fp dedup)."""
    from music_streaming_etl_spark.operators.text import (
        normalize_text,
        winnow_fingerprints,
    )

    k, w = 5, 4
    rows = [
        (1, "abcde"),            # n_grams = 1  (< window)
        (2, "abcdefg"),          # n_grams = 3  (< window)
        (3, "abcdefgh"),         # n_grams = 4  (== window)
        (4, "abcdefghij"),       # n_grams = 6  (> window)
        (5, "aaaaaaaaaaaa"),     # repeats -> single distinct fp
        (6, "ab"),               # shorter than k -> no rows
        (7, "Mixed  Case\tWS x"),  # normalization path
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id"], r["fp"])
        for r in winnow_fingerprints(df, "doc_id", "text", k=k, window=w)
        .collect()
    }

    # reference: the definition, straight-line Python
    norm = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", normalize_text("text").alias("n")
        ).collect()
    }
    want = set()
    for doc_id, s in norm.items():
        if len(s) < k:
            continue
        codes = [ord(c) for c in s]
        gh = [
            sum(codes[i + t] * 131**t for t in range(k))
            for i in range(len(codes) - k + 1)
        ]
        for p in range(len(gh)):
            want.add((doc_id, min(gh[p : p + w])))
    assert got == want
    assert not any(i == 6 for i, _ in got)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is here"),
            (2, "der hund und die katze ist das"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["p"] for r in df.select("doc_id", lang_id("text").alias("p")).collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello world, 42 times!",)], "text string")
    row = df.select(
        n_tokens("text").alias("ws"), n_tokens_bpe("text").alias("bpe")
    ).collect()[0]
    assert row["ws"] == 4
    # BPE-ish lexing: "Hello" " world" "," " 42" " times" "!"
    assert row["bpe"] == 6


def test_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [(1, "A  B\tC"), (2, "a b c")], "id long, text string"
    )
    fps = [r["fp"] for r in df.select(doc_fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_dedup_clusters_connected_components(spark):
    """Chain A-B-C collapses to one cluster labeled min(id); isolated
    pair and singleton stay separate; labels are the component minimum
    regardless of edge direction."""
    from music_streaming_etl_spark.operators.dedup import (
        dedup_clusters,
        dedup_keep_canonical,
    )

    ids = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    # components: {1,2,3,4} (chain, mixed direction), {5,6}, {7} singleton
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(ids, pairs, "doc_id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 7: 7}

    docs = ids.withColumn("payload", F.concat(F.lit("d"), F.col("doc_id")))
    kept = dedup_keep_canonical(
        docs,
        dedup_clusters(ids, pairs, "doc_id"),
        "doc_id",
        ["payload"],
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 5, 7]


def test_dedup_clusters_long_chain_converges(spark):
    """A 12-hop chain needs multiple propagation rounds — the fixpoint
    loop must converge and label everything with the chain minimum."""
    from music_streaming_etl_spark.operators.dedup import dedup_clusters

    n = 13
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = dedup_clusters(ids, pairs, "doc_id").collect()
    assert all(r["cluster_id"] == 0 for r in out) and len(out) == n


def test_fuzzy_pairs_matches_naive_levenshtein(spark):
    """Symmetric-delete blocking must find exactly the pairs the O(n²)
    scan finds — the exact-recall contract now covers the FULL
    Levenshtein metric, so the injected neighbors include
    substitutions, deletions, AND insertions (cross-length pairs the
    old slice scheme could never block together)."""
    import random

    from music_streaming_etl_spark.operators.dedup import fuzzy_pairs

    rng = random.Random(11)
    base = ["".join(rng.choice("abcd") for _ in range(8)) for _ in range(60)]
    # inject guaranteed distance-1 neighbors of all three edit kinds
    variants = [s[:3] + "x" + s[4:] for s in base[:20]]  # substitution
    variants += [s[:5] + s[6:] for s in base[20:35]]  # deletion
    variants += [s[:2] + "x" + s[2:] for s in base[35:50]]  # insertion
    rows = [(i, s) for i, s in enumerate(base + variants)]
    df = spark.createDataFrame(rows, "id long, s string")

    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in fuzzy_pairs(df, "id", "s", max_dist=1).collect()
    )
    a = df.selectExpr("id AS id_a", "s AS sa")
    b = df.selectExpr("id AS id_b", "s AS sb")
    naive = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("sa", "sb").cast("bigint"))
        .filter(F.col("dist") <= 1)
        .collect()
    )
    assert got == naive and len(got) >= 20


def test_fuzzy_pairs_plans_no_cartesian(spark, sf_dir):
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_fuzzy_name_pairs,
    )

    plan = (
        q_fuzzy_name_pairs(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_source_bytes_hadoop_fs_path(spark, sf_dir):
    """r10 (VERDICT r9 item 5): the lazy minhash regime decision must
    survive non-local filesystems. The Hadoop FileSystem branch is
    exercised through explicit file: URIs (the one scheme this sandbox
    has) and must agree exactly with os.path sizes; the dispatcher's
    local fast path must return the same number; unreadable input
    still degrades to None (the eager measured fallback), never
    throws."""
    import os

    from music_streaming_etl_spark.operators.dedup import (
        _hadoop_fs_bytes,
        _source_bytes,
    )

    path = f"{sf_dir}/documents.parquet"
    want = os.path.getsize(path)
    assert _hadoop_fs_bytes(spark, [f"file:{path}"]) == want
    assert _hadoop_fs_bytes(spark, [f"file:{path}", f"file:{path}"]) == 2 * want

    df = spark.read.parquet(path)
    assert _source_bytes(df) == want

    # non-file-backed frame -> None (fallback), not an exception
    assert _source_bytes(spark.range(5)) is None
