"""Streaming exact deduplication — the ingest-time guard of the dedup
family (batch exact / near-dup / incremental live in
``operators/dedup.py``).

Documents arrive continuously; each is fingerprinted (md5 of
normalized text — same fingerprint as the batch op, so batch and
stream agree on what "duplicate" means) and deduplicated with
``dropDuplicatesWithinWatermark``: state holds one fingerprint per doc
seen within the watermark horizon, so memory is bounded by the event
rate × horizon instead of growing forever. Re-ingesting the same
document inside the horizon is suppressed; beyond it, the incremental
batch dedup (corpus index) is the backstop — the standard two-tier
design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import doc_fingerprint


def dedup_stream(
    docs: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-arrivals of the same content within the watermark
    horizon. Works on a streaming DataFrame with an event-time
    column."""
    fp = docs.withColumn("__fp", doc_fingerprint(text_col))
    return fp.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["__fp"]
    ).drop("__fp")


def start_dedup_stream(
    spark,
    stream_dir: str,
    schema,
    target_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
):
    """File source → streaming dedup → append sink (parquet)."""
    docs = spark.readStream.schema(schema).option("header", True).csv(stream_dir)
    deduped = dedup_stream(docs, text_col, ts_col, watermark)
    return (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", target_path)
        .trigger(availableNow=True)
        .format("parquet")
        .start()
    )
