"""MLlib-backed near-dup detection (SURVEY.md §2.9 X2's
``pyspark.ml.feature.MinHashLSH``路 path) — the library alternative to
the hand-rolled LSH in ``dedup.py``.

Trade-offs vs the hand-rolled pipeline:
- MLlib hashes with its own seeded coefficients → deterministic for a
  fixed seed but NOT reproducible by an external SQL oracle (hence
  rows-only checking; the hand-rolled md5 pipeline is the
  oracle-checked one);
- ``approxSimilarityJoin`` prunes via OR-amplified hash tables like
  our band join, then filters on exact Jaccard distance internally;
- features must be sparse vectors → shingles go through
  ``CountVectorizer`` (binary), adding a vocabulary fit (an extra
  corpus pass the hand-rolled form doesn't need).
"""

from __future__ import annotations

from pyspark.ml.feature import CountVectorizer, MinHashLSH
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles


def dedup_minhash_mllib(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.85,
    num_hash_tables: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH. Returns
    (id_a, id_b, jaccard_sim) with id_a < id_b — same contract as
    ``dedup_minhash_pairs`` so callers can swap implementations.
    """
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    ).filter(F.size("sh") > 0)
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True)
    model = cv.fit(sh)
    feats = model.transform(sh)
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=num_hash_tables,
        seed=seed,
    )
    lsh_model = lsh.fit(feats)
    # approxSimilarityJoin distance = 1 - jaccard
    joined = lsh_model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="dist"
    )
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            # single-engine (MLlib) path — no oracle mirrors this,
            # so ROUND's cross-engine ambiguity cannot apply
            F.round(1.0 - F.col("dist"), 6).alias("jaccard_sim"),
        )
        .distinct()
    )
