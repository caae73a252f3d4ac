"""E2E: streaming near-dup filtering against the persisted MinHash
index. Exercises the four rejection paths — near-dup of the bootstrap
corpus, near-dup of a doc admitted in an EARLIER microbatch (index
growth), exact dup inside one batch, NEAR-dup inside one batch — plus
admission of genuinely new docs, and the foreachBatch retry contract
(reapplying a batch_id is byte-idempotent)."""

from __future__ import annotations

import json
import os
import time

from music_streaming_etl_spark.streaming.dedup_index import (
    apply_dedup_batch,
    bootstrap_index,
    start_dedup_stream_against_index,
)

CORPUS_DOC = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
NEW_DOC = "one two three four five six seven eight nine ten"
OTHER_DOC = "red orange yellow green blue indigo violet umber ochre teal"


def _write_batch(src_dir, name, rows):
    # JSON-lines keeps the file:// stream source schema-stable
    path = os.path.join(src_dir, name)
    with open(path + ".tmp", "w") as fh:
        for doc_id, text in rows:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    os.rename(path + ".tmp", path)  # atomic: the source never sees partials


def _wait_rows(spark, out_dir, want, timeout=90):
    deadline = time.time() + timeout
    seen = -1
    while time.time() < deadline:
        try:
            seen = spark.read.parquet(out_dir).count()
            if seen >= want:
                return seen
        except Exception:
            pass
        time.sleep(1)
    return seen


def test_stream_dedups_against_growing_index(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")

    corpus = spark.createDataFrame([(1, CORPUS_DOC)], "doc_id long, text string")
    bootstrap_index(corpus, "doc_id", "text", index_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    # 8 bands × 2 rows: collision odds for J≈0.8 are ~0.99 — with the
    # default 4×4 banding the 0.82-similar pair deterministically
    # misses (measured), which is the band-tuning tradeoff lsh_quality
    # quantifies, not a bug
    q = start_dedup_stream_against_index(
        stream, "doc_id", "text", index_dir, out_dir, ckpt,
        threshold=0.5, num_bands=8,
    )
    try:
        # batch 1: a near-dup of the corpus doc (one word changed →
        # high unigram Jaccard), an exact in-batch dup pair, an
        # in-batch NEAR-dup pair (105 vs 102: J≈0.82, collapsed to the
        # lowest id BEFORE the corpus check), and one genuinely new doc
        _write_batch(
            str(src), "b1.json",
            [
                (101, CORPUS_DOC.replace("kappa", "lambda")),  # vs corpus → reject
                (102, NEW_DOC),
                (103, NEW_DOC),                                # in-batch exact dup
                (104, OTHER_DOC),
                (105, NEW_DOC.replace("nine", "forty")),       # in-batch NEAR dup
            ],
        )
        q.processAllAvailable()  # blocks until the full foreachBatch
        # (admit write AND index append) for every available file ran
        n = _wait_rows(spark, out_dir, want=2)
        assert n == 2, n
        # batch 2: near-dup of the JUST-ADMITTED doc 102 — rejected
        # only if the index grew; plus one new doc
        _write_batch(
            str(src), "b2.json",
            [
                (201, NEW_DOC.replace("ten", "eleven")),       # vs batch-1 admit → reject
                (202, "completely different words entirely here now folks"),
            ],
        )
        q.processAllAvailable()
        n = _wait_rows(spark, out_dir, want=3)
        assert n == 3, n
    finally:
        q.stop()

    admitted = sorted(
        r["doc_id"] for r in spark.read.parquet(out_dir).select("doc_id").collect()
    )
    assert admitted == [102, 104, 202]
    # the index grew by exactly the admitted docs
    mins = spark.read.parquet(os.path.join(index_dir, "mins.parquet"))
    assert sorted(r["id"] for r in mins.select("id").collect()) == [1, 102, 104, 202]


def _snapshot(spark, out_dir, index_dir):
    admitted = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out_dir).collect()
    )
    mins = sorted(
        tuple(r) for r in spark.read.parquet(
            os.path.join(index_dir, "mins.parquet")).collect()
    )
    sh = sorted(
        tuple(r) for r in spark.read.parquet(
            os.path.join(index_dir, "shingles.parquet")).collect()
    )
    return admitted, mins, sh


def test_batch_retry_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying the SAME batch_id
    (the retry after a failure between the admit write and the
    checkpoint commit) must neither re-append output/index rows nor
    change the admitted set by deduping against its own half-written
    index rows."""
    index_dir = str(tmp_path / "index")
    out_dir = str(tmp_path / "admitted")
    corpus = spark.createDataFrame([(1, CORPUS_DOC)], "doc_id long, text string")
    bootstrap_index(corpus, "doc_id", "text", index_dir)

    batch = spark.createDataFrame(
        [
            (101, CORPUS_DOC.replace("kappa", "lambda")),  # vs corpus → reject
            (102, NEW_DOC),
            (104, OTHER_DOC),
        ],
        "doc_id long, text string",
    )
    kw = dict(threshold=0.5, num_bands=8)
    apply_dedup_batch(batch, 0, "doc_id", "text", index_dir, out_dir, **kw)
    first = _snapshot(spark, out_dir, index_dir)
    assert sorted(d for d, _ in first[0]) == [102, 104]
    # the retry: same batch_id, index already contains batch-0 rows
    apply_dedup_batch(batch, 0, "doc_id", "text", index_dir, out_dir, **kw)
    assert _snapshot(spark, out_dir, index_dir) == first
    # a LATER batch still dedups against batch 0's admissions
    batch2 = spark.createDataFrame(
        [(201, NEW_DOC.replace("ten", "eleven")), (202, "totally novel words")],
        "doc_id long, text string",
    )
    apply_dedup_batch(batch2, 1, "doc_id", "text", index_dir, out_dir, **kw)
    admitted, _, _ = _snapshot(spark, out_dir, index_dir)
    assert sorted(d for d, _ in admitted) == [102, 104, 202]
