"""Deduplication operators for LLM training-data pipelines
(SURVEY.md §2.9 X1/X2 + build charter: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup).

Everything is DataFrame ops + higher-order array functions — no Python
UDFs, no MLlib dependency — so the same code path is oracle-checkable
(md5-based hashing reproduces in any engine) and scales: the only
shuffles are the group-bys/joins on hash keys.

Scale design:
- exact dedup: one shuffle on the content hash; keep-first resolved by
  ``min(struct(order_col, payload))`` — no window needed.
- MinHash LSH: signatures are per-row expressions (map-side);
  candidate generation shuffles on (band, band_signature) — only
  colliding docs meet, never the full cross product.
- pair verification joins shingle sets only for candidate pairs.
- SimHash: per-row 32-bit fingerprint; near-dup = bucket join on
  rotated prefixes or hamming filter on candidates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import doc_fingerprint, shingles, tokens


def dedup_exact(
    df: DataFrame,
    content_col: str,
    order_col: str,
    keep_cols: Sequence[str],
) -> DataFrame:
    """X1 — exact content dedup: md5-fingerprint the normalized
    content, keep the row with the smallest ``order_col`` per
    fingerprint. ``min(struct(...))`` instead of a window: one shuffle,
    no per-group sort."""
    fp = doc_fingerprint(content_col)
    packed = F.struct(F.col(order_col), *[F.col(c) for c in keep_cols])
    kept = (
        df.withColumn("__fp", fp)
        .groupBy("__fp")
        .agg(F.min(packed).alias("__keep"))
    )
    return kept.select(
        *[F.col(f"__keep.{c}") for c in (order_col, *keep_cols)]
    )


MINHASH_P = 2_147_483_647  # 2^31 − 1 (Mersenne prime)


def shingle_hashes(sh_col) -> F.Column:
    """One 60-bit md5-derived hash per shingle, reduced mod P. md5
    (not xxhash64/murmur) so any engine reproduces it; computed ONCE
    per shingle — the per-permutation values below are cheap linear
    maps of this array."""
    return F.transform(
        sh_col,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_P),
    )


def minhash_signature_from_hashes(hash_col, num_hashes: int = 16) -> F.Column:
    """MinHash signature as ``array<long>``: element *i* is
    ``min((aᵢ·h + bᵢ) mod P)`` over the shingle hashes — the classic
    universal-hash permutation family with fixed odd multipliers, so
    one md5 per shingle serves all permutations (16× fewer digest
    calls than hashing per-permutation)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(
            F.transform(
                hash_col,
                lambda h: ((2 * i + 1) * h + (1_000_003 * i + 12_345))
                % F.lit(MINHASH_P),
            )
        ),
    )


def lsh_bands(sig_col, num_bands: int, rows_per_band: int) -> F.Column:
    """Fold a signature into band keys: ``array<struct<band,key>>``;
    docs sharing any (band, key) are candidates."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.concat_ws(
                "#", F.slice(sig_col, b * rows_per_band + 1, rows_per_band)
            ).alias("key"),
        ),
    )


def jaccard(a, b) -> F.Column:
    """Exact Jaccard of two (distinct) arrays."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(
        F.array_union(a, b)
    ).cast("double")


def dedup_minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.85,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 1,
) -> DataFrame:
    """X2 — MinHash + LSH near-duplicate pairs with exact-Jaccard
    verification.

    Pipeline: per-doc signature (map-side) → explode band keys →
    self-join on (band, key) with id< id (shuffle meets only colliding
    docs) → distinct candidate pairs → verify exact Jaccard on the
    shingle sets → filter ≥ threshold.

    Returns (id_a, id_b, jaccard_sim), id_a < id_b.
    """
    rows_per_band = num_hashes // num_bands
    # staged withColumns so each array is materialized once per row —
    # inlining them would re-run the md5s per downstream reference
    # cache(): this frame feeds four consumers (both sides of the
    # band self-join and both sides of the verify join) — without it
    # the shingle+digest computation runs 4×. Materializing signatures
    # is also the production pattern at scale (they're reused across
    # incremental dedup runs).
    sh = (
        df.select(F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh"))
        .withColumn("__hs", shingle_hashes(F.col("sh")))
        .withColumn("sig", minhash_signature_from_hashes(F.col("__hs"), num_hashes))
        .select("id", "sh", "sig")
        .cache()
    )
    bands = sh.select(
        "id", F.explode(lsh_bands(F.col("sig"), num_bands, rows_per_band)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh_a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6).alias("jaccard_sim"),
        )
    )
    return verified.filter(F.col("jaccard_sim") >= threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    shingle_n: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """N-gram Jaccard near-dup without the LSH approximation: exact
    pairwise Jaccard, optionally blocked by ``block_col`` (e.g. a
    source/partition key) so the self-join is per-block instead of a
    full cross product. The honest O(n²) baseline MinHash is judged
    against."""
    sh = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
        shingles(text_col, shingle_n).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jaccard(F.col("a.sh"), F.col("b.sh")), 6).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def _token_hash32(tok) -> F.Column:
    """Deterministic 32-bit token hash from the first 8 hex chars of
    md5 (engine-portable, unlike xxhash64/murmur)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def simhash(text_col, bits: int = SIMHASH_BITS) -> F.Column:
    """X2b — SimHash fingerprint: for each bit j, sum ±1 over the
    doc's distinct tokens according to bit j of the token hash; bit j
    of the fingerprint = sign. Pure array expressions — per-row folds,
    no explode/shuffle. Bit positions unroll as a Python loop (masks
    are literals — Spark's shiftleft only shifts by a literal)."""
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(toks, _token_hash32)
    def vote_fn(mask: int):
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) > 0, 1
        ).otherwise(-1)

    fp = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0), vote_fn(1 << j))
        fp = fp + F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return fp


def hamming32(a, b) -> F.Column:
    """Hamming distance between two 32-bit simhashes via popcount of
    XOR (bit_count is native in Spark and DuckDB)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    block_col: str | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: fingerprint per row, candidate blocking
    (optional), hamming ≤ max_hamming. For true 100 TB scale the
    blocking key should be rotations/prefix tables of the fingerprint
    (multi-index); here the optional block_col plays that role."""
    fp = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
        simhash(text_col).alias("fp"),
    )
    a, b = fp.alias("a"), fp.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming32(F.col("a.fp"), F.col("b.fp")).cast("bigint").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    bucket_col: str | None = None,
) -> DataFrame:
    """X1c — near-duplicate vectors by cosine ≥ threshold.

    ``bucket_col`` is the IVF-style coarse quantizer (cluster/label
    id): the self-join runs within buckets only, turning O(n²) into
    O(Σ bucket²). Without it this is the exact brute-force baseline.
    """
    from .similarity import cosine  # local import to avoid cycle

    v = df.select(
        F.col(id_col).alias("id"),
        *( [F.col(bucket_col).alias("bkt")] if bucket_col else [] ),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if bucket_col:
        cond = cond & (F.col("a.bkt") == F.col("b.bkt"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
