"""Spark 4 Python DataSource API tests: partition pruning via
pushFilters, generator-side residual filters, the deterministic
microbatch stream source, and the sharded-JSONL sink's commit
protocol."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from music_streaming_etl_spark.sources.python_datasource import (
    _DocsReader,
    doc_fields,
    event_fields,
    register_all,
)


def test_pushdown_prunes_partitions():
    """doc_id range predicates shrink the InputPartition list BEFORE
    scheduling — the pushdown is structural, not a post-scan filter."""
    r = _DocsReader({"n": "1000", "parts": "10"})
    assert len(r.partitions()) == 10
    leftover = list(
        r.pushFilters([GreaterThanOrEqual(("doc_id",), 300), LessThan(("doc_id",), 500)])
    )
    assert leftover == []  # both predicates fully consumed
    parts = r.partitions()
    assert len(parts) == 2  # only the [300,400) and [400,500) ranges survive
    ids = [i for p in parts for i in range(*p.value)]
    assert min(ids) == 300 and max(ids) == 499


def test_pushdown_returns_unsupported_filters():
    r = _DocsReader({"n": "100", "parts": "4"})
    unsupported = EqualTo(("text",), "x")
    leftover = list(r.pushFilters([unsupported, EqualTo(("lang",), "en")]))
    assert leftover == [unsupported]  # lang consumed, text handed back


def test_scan_matches_direct_generation(spark):
    register_all(spark)
    rows = (
        spark.read.format("synthetic_docs")
        .option("n", 50)
        .option("parts", 3)
        .load()
        .collect()
    )
    assert sorted(tuple(r) for r in rows) == [doc_fields(i) for i in range(50)]


def test_scan_filter_pushdown_end_to_end(spark):
    register_all(spark)
    df = (
        spark.read.format("synthetic_docs")
        .option("n", 200)
        .option("parts", 4)
        .load()
        .filter((F.col("doc_id") >= 100) & (F.col("lang") == "en"))
    )
    expect = [
        doc_fields(i) for i in range(100, 200) if doc_fields(i)[1] == "en"
    ]
    assert sorted(tuple(r) for r in df.collect()) == expect
    assert len(expect) > 0


def test_stream_source_two_batches(spark, tmp_path):
    register_all(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 40)
        .option("parts", 4)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pyds_events")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT COUNT(*) AS n FROM pyds_events").first()["n"]
            if n >= 80:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.sql(
        "SELECT event_id, user_id, event_type FROM pyds_events ORDER BY event_id"
    ).collect()
    assert len(got) >= 80
    for r in got:
        assert tuple(r) == event_fields(r["event_id"])
    # offsets are contiguous row counters — no gaps, no duplicates
    assert [r["event_id"] for r in got] == list(range(len(got)))


def test_jsonl_sink_commit_protocol(spark, tmp_path):
    register_all(spark)
    out = str(tmp_path / "shards")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(4)
    df.write.format("jsonl_shards").option("path", out).mode("append").save()
    manifest = json.load(open(os.path.join(out, "_MANIFEST")))
    assert manifest["total_rows"] == 100
    assert len(manifest["shards"]) == 4
    rows = []
    for s in manifest["shards"]:
        with open(os.path.join(out, s["file"])) as fh:
            rows += [json.loads(line) for line in fh]
    assert sorted((r["k"], r["v"]) for r in rows) == [(i, 2 * i) for i in range(100)]
