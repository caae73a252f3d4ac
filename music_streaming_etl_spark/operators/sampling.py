"""Deterministic sampling / splitting for training-data pipelines.

``df.sample()`` is seed-dependent AND partitioning-dependent — rerun
the job with different parallelism and you get a different sample,
which poisons reproducibility and incremental processing. These ops
derive the sampling decision from the ROW's identity (md5 of the key),
so membership is a pure function of the data:

- stable across cluster size, retries, and engines (oracle-checkable);
- consistent between runs: yesterday's train/val assignment never
  flips when the corpus grows (the property held sacred in LLM data
  work — eval contamination is forever);
- stratified fractions apply per group with the same mechanism.

Hash → bucket: first 8 hex chars of md5(key) as an integer mod 10_000
(basis-point granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 10_000


def hash_bucket(key: Column | str) -> Column:
    """Stable bucket in [0, 10000) from the row key — the salt-free
    md5 construction any engine can reproduce."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % BUCKETS
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` — an exact,
    rerun-stable ~fraction sample."""
    return df.filter(hash_bucket(key) < int(fraction * BUCKETS))


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. lang-balanced corpus
    downsampling). Strata absent from ``fractions`` are dropped."""
    bucket = hash_bucket(key)
    cond = None
    for stratum, frac in fractions.items():
        c = (F.col(strata_col) == stratum) & (bucket < int(frac * BUCKETS))
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


def train_val_split(
    df: DataFrame, key: str, val_fraction: float = 0.1, split_col: str = "split"
) -> DataFrame:
    """Tag every row train/val by hash bucket. A doc keeps its split
    forever — append-only corpora never leak val docs into train."""
    return df.withColumn(
        split_col,
        F.when(hash_bucket(key) < int(val_fraction * BUCKETS), "val").otherwise(
            "train"
        ),
    )
