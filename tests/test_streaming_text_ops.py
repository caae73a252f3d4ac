"""The text operators (PII scrub, quality stats) are pure column
expressions, so the SAME code runs unchanged on a stream — this is the
engine's continuous-ingest quality gate: stream output must equal the
batch twin on identical files."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from music_streaming_etl_spark.operators.text import (
    n_tokens,
    redact_pii,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

ROWS = [
    (1, "reach me at bob@example.com or +1-555-123-4567 today"),
    (2, "server 192.168.0.12 logged three restarts overnight"),
    (3, "plain text with no sensitive content at all"),
]


def _gate(df):
    return df.select(
        "doc_id",
        redact_pii(F.col("text")).alias("clean"),
        n_tokens("text").cast("bigint").alias("n_toks"),
    )


def test_stream_reuses_batch_text_operators(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    target = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(ROWS, DOC_SCHEMA).coalesce(1).write.mode(
        "append"
    ).option("header", True).csv(src)

    stream = spark.readStream.schema(DOC_SCHEMA).option("header", True).csv(src)
    q = (
        _gate(stream)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", target)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(
        (r["doc_id"], r["clean"], r["n_toks"])
        for r in spark.read.parquet(target).collect()
    )
    want = sorted(
        (r["doc_id"], r["clean"], r["n_toks"])
        for r in _gate(spark.createDataFrame(ROWS, DOC_SCHEMA)).collect()
    )
    assert got == want
    redacted = dict((d, c) for d, c, _ in got)
    assert "bob@example.com" not in redacted[1] and "[PII]" in redacted[1]
    assert "555" not in redacted[1]
    assert "192.168.0.12" not in redacted[2] and "[PII]" in redacted[2]
    assert redacted[3] == ROWS[2][1]  # untouched
