"""Vector similarity search (SURVEY.md §2.9 X3).

Brute-force cosine top-k as the exact baseline, and an IVF-style
bucketed variant as the scale path. Dot products are ``zip_with`` +
``aggregate`` folds over ``array<double>`` — sequential, so the float
result is deterministic for a given row (no shuffle-order dependence)
and reproducible by an oracle doing the same left-to-right fold.

Scale notes: brute force is a broadcast of one query vector and a
single scan — perfectly parallel, no shuffle; top-k resolves via
``global_topk`` (TakeOrderedAndProject: per-partition heaps merged
once, never a single-partition window). The IVF variant prunes the
scan to the closest coarse buckets: at 1B vectors × 1k buckets you
scan ~0.1% of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ranking import global_topk


def dot(a, b) -> F.Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double_vec(col) -> F.Column:
    """float32 arrays compute differently engine-to-engine — always
    widen to double before arithmetic."""
    return F.transform(col, lambda x: x.cast("double"))


def similarity_topk(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine against a single query vector (a 1-row
    DataFrame with the same vec layout, broadcast — no shuffle of the
    vector table). Ties break on id ASC. Returns (rank, id, score)."""
    v = vectors.select(
        F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v")
    )
    q = query.select(as_double_vec(F.col(vec_col)).alias("qv"))
    scored = v.crossJoin(F.broadcast(q)).select(
        "id", F.round(cosine(F.col("v"), F.col("qv")), 6).alias("score")
    )
    return global_topk(scored, [F.desc("score"), F.asc("id")], k).select(
        "rank", "id", "score"
    )


def centroids(
    vectors: DataFrame, bucket_col: str, vec_col: str, dim: int
) -> DataFrame:
    """Per-bucket mean vector (the IVF coarse quantizer's codebook),
    computed as dim per-position averages — one aggregation, no
    Python. Used to pick which buckets a query must scan.

    Each element is decimal-accumulated (exact, order-free) then
    divided by the count as doubles — so the codebook is bit-identical
    under any partitioning and reproducible by an external oracle
    (same rule as every float aggregate in this engine)."""
    v = vectors.select(
        F.col(bucket_col).alias("bucket"), as_double_vec(F.col(vec_col)).alias("v")
    )
    aggs = [
        (
            F.sum(F.element_at("v", i + 1).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias(f"c{i}")
        for i in range(dim)
    ]
    per_pos = v.groupBy("bucket").agg(*aggs)
    return per_pos.select(
        "bucket", F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("centroid")
    )


def similarity_topk_ivf(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    dim: int,
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """IVF-bucketed approximate top-k: rank buckets by centroid
    cosine, scan only the best ``n_probe`` buckets, then exact top-k
    within them. The pruning is the 100 TB play; recall depends on
    n_probe / bucket quality exactly as in FAISS-style IVF."""
    cents = centroids(vectors, bucket_col, vec_col, dim)
    q = query.select(as_double_vec(F.col(vec_col)).alias("qv"))
    bucket_scores = cents.crossJoin(F.broadcast(q)).select(
        "bucket",
        # rounded before ranking: near-tie bucket scores then
        # resolve on the bucket id, deterministically in any engine
        F.round(cosine(F.col("centroid"), F.col("qv")), 6).alias("bscore"),
    )
    bucket_rank = global_topk(
        bucket_scores, [F.desc("bscore"), F.asc("bucket")], n_probe
    ).select("bucket")
    pruned = vectors.join(
        F.broadcast(bucket_rank),
        vectors[bucket_col] == bucket_rank["bucket"],
        "left_semi",
    )
    return similarity_topk(pruned, query, id_col, vec_col, k)
