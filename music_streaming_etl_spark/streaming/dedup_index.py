"""Streaming NEAR-duplicate filtering against a persisted corpus
index — the third tier of the dedup family:

1. ``streaming/dedup.py`` — exact re-arrival suppression within the
   watermark horizon (bounded state);
2. ``operators/dedup.py::dedup_incremental`` — batch ingest vs the
   MinHash index;
3. THIS — the same index check running continuously: each microbatch
   is near-dup-filtered against the parquet index via ``foreachBatch``
   (the batch composition IS the streaming operator — signature
   aggregation over exploded shingles can't emit incrementally in
   append mode, so per-microbatch batch semantics is the correct and
   idiomatic shape, same pattern as the KPI upsert sink).

Exactly-once, concretely: ``foreachBatch`` is only at-least-once, so
every write is made idempotent ON ``batch_id`` — output and index
parquets are partitioned by a ``__batch_id`` column and written with
DYNAMIC partition overwrite (the standard Spark idempotent-foreachBatch
sink pattern): a retried batch replaces exactly its own partition
instead of appending duplicates. The dedup check for batch N filters
the index to ``__batch_id < N`` — a partition-PRUNED scan — so a
retry never deduplicates against its own half-written rows either.
Replay = same bytes, no divergence.

Within one microbatch the guarantee matches the batch operators:
exact dups collapse on the md5 fingerprint, then NEAR-dups collapse
via the same MinHash-LSH pair check + connected components used by
the batch path (keep = lowest id per component) — without this, two
near-duplicates arriving in the same microbatch would both be
admitted permanently, silently weakening the dedup guarantee as
ingest rates (and so batch sizes) grow.

Scale: per-batch cost is O(|batch| + band collisions) — the corpus is
never re-shingled; index growth is one partition of parquet per
non-empty batch, and corpus reads prune to the needed partitions.
State lives in files, not executor memory, so the stream's memory
footprint is flat regardless of corpus size. Compact old partitions
with ``sources/io.py::optimize_table`` if batch counts grow into the
tens of thousands.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import (
    dedup_clusters,
    dedup_incremental,
    dedup_minhash_pairs,
    minhash_index,
)

_BATCH_COL = "__batch_id"
_BOOTSTRAP_ID = -1


def _write_batch_partition(df: DataFrame, batch_id: int, path: str) -> None:
    """Idempotent per-batch write: dynamic partition overwrite replaces
    only this batch's partition, so the foreachBatch retry rewrites the
    same bytes instead of appending duplicates."""
    (
        df.withColumn(_BATCH_COL, F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(_BATCH_COL)
        .parquet(path)
    )


def _read_before(spark, path: str, batch_id: int) -> DataFrame:
    """Index state visible to ``batch_id``: bootstrap + strictly
    earlier batches. The filter is on the partition column, so Spark
    prunes this batch's own (possibly half-written) partition at the
    file-listing level."""
    return (
        spark.read.parquet(path)
        .filter(F.col(_BATCH_COL) < batch_id)
        .drop(_BATCH_COL)
    )


def apply_dedup_batch(
    batch: DataFrame,
    batch_id: int,
    id_col: str,
    text_col: str,
    index_dir: str,
    out_dir: str,
    threshold: float = 0.85,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 1,
) -> None:
    """One microbatch of the dedup stream — module-level so the
    idempotency contract is directly testable: calling this twice with
    the same ``batch_id`` (the foreachBatch retry) produces identical
    output and index state."""
    if batch.isEmpty():
        return
    spark = batch.sparkSession
    sh_root = os.path.join(index_dir, "shingles.parquet")
    mins_root = os.path.join(index_dir, "mins.parquet")
    corpus_sh = _read_before(spark, sh_root, batch_id)
    corpus_mins = _read_before(spark, mins_root, batch_id)
    # 1. in-batch exact dup collapse (deterministic keep-lowest-id)
    batch = (
        batch.withColumn("__fp", F.md5(F.lower(F.trim(F.col(text_col)))))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    ).localCheckpoint()
    # 2. in-batch NEAR-dup collapse: same LSH banding as the corpus
    # check, components collapsed to their lowest id
    pairs = dedup_minhash_pairs(
        batch,
        id_col,
        text_col,
        threshold=threshold,
        num_hashes=num_hashes,
        num_bands=num_bands,
        shingle_n=shingle_n,
    )
    clusters = dedup_clusters(batch.select(id_col), pairs, id_col)
    canon = clusters.filter(F.col(id_col) == F.col("cluster_id")).select(id_col)
    batch = batch.join(canon, id_col, "left_semi")
    # 3. batch-vs-corpus near-dup check
    kept, _matches = dedup_incremental(
        batch,
        id_col,
        text_col,
        corpus_sh,
        corpus_mins,
        threshold=threshold,
        num_hashes=num_hashes,
        num_bands=num_bands,
        shingle_n=shingle_n,
    )
    kept = kept.localCheckpoint()
    # 4. idempotent writes (dynamic partition overwrite on __batch_id)
    _write_batch_partition(kept, batch_id, out_dir)
    new_sh, new_mins = minhash_index(kept, id_col, text_col, num_hashes, shingle_n)
    _write_batch_partition(new_sh, batch_id, sh_root)
    _write_batch_partition(new_mins, batch_id, mins_root)


def start_dedup_stream_against_index(
    stream_docs: DataFrame,
    id_col: str,
    text_col: str,
    index_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.85,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 1,
):
    """Start the stream. ``index_dir`` must hold ``shingles.parquet``
    and ``mins.parquet`` (bootstrap with ``bootstrap_index``);
    admitted docs land in ``out_dir`` as parquet partitioned by
    ``__batch_id`` (plain ``spark.read.parquet(out_dir)`` works; drop
    the partition column if you don't want the provenance). Returns
    the StreamingQuery."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        apply_dedup_batch(
            batch,
            batch_id,
            id_col,
            text_col,
            index_dir,
            out_dir,
            threshold=threshold,
            num_hashes=num_hashes,
            num_bands=num_bands,
            shingle_n=shingle_n,
        )

    return (
        stream_docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="0 seconds")
        .start()
    )


def bootstrap_index(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    index_dir: str,
    num_hashes: int = 16,
    shingle_n: int = 1,
) -> None:
    """Materialize the index parquets for an existing corpus (written
    as the ``__batch_id = -1`` partition, before every stream batch)."""
    sh, mins = minhash_index(corpus, id_col, text_col, num_hashes, shingle_n)
    _write_batch_partition(
        sh, _BOOTSTRAP_ID, os.path.join(index_dir, "shingles.parquet")
    )
    _write_batch_partition(
        mins, _BOOTSTRAP_ID, os.path.join(index_dir, "mins.parquet")
    )
