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
   idiomatic shape, same pattern as the KPI upsert sink), survivors
   are appended to the output, and their hashed shingles + signature
   mins are appended to the index — so later batches dedup against
   everything admitted before them, exactly-once per microbatch via
   the checkpoint.

Scale: per-batch cost is O(|batch| + band collisions) — the corpus is
never re-shingled; index growth is append-only parquet. State lives
in files, not executor memory, so the stream's memory footprint is
flat regardless of corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import dedup_incremental, minhash_index


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
    admitted docs land in ``out_dir`` as parquet. Returns the
    StreamingQuery."""
    spark = stream_docs.sparkSession

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        corpus_sh = spark.read.parquet(os.path.join(index_dir, "shingles.parquet"))
        corpus_mins = spark.read.parquet(os.path.join(index_dir, "mins.parquet"))
        # in-batch exact dup collapse first (deterministic keep-lowest-id)
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
        )
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
        kept = kept.cache()
        kept.write.mode("append").parquet(out_dir)
        new_sh, new_mins = minhash_index(
            kept, id_col, text_col, num_hashes, shingle_n
        )
        new_sh.write.mode("append").parquet(
            os.path.join(index_dir, "shingles.parquet")
        )
        new_mins.write.mode("append").parquet(
            os.path.join(index_dir, "mins.parquet")
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
    """Materialize the index parquets for an existing corpus."""
    sh, mins = minhash_index(corpus, id_col, text_col, num_hashes, shingle_n)
    sh.write.mode("overwrite").parquet(os.path.join(index_dir, "shingles.parquet"))
    mins.write.mode("overwrite").parquet(os.path.join(index_dir, "mins.parquet"))
