"""Persisted IVF index lifecycle: build to bucket-partitioned
parquet, search with partition-pruned probes, agree exactly with the
inline IVF query, and prove unprobed bucket partitions are never
read."""

from __future__ import annotations

import os

from music_streaming_etl_spark.operators.similarity import (
    build_ivf_index,
    search_ivf_index,
)
from music_streaming_etl_spark.plans.extension_queries import (
    q_similarity_topk_ivf,
)
from music_streaming_etl_spark.plans.testdata_queries import _t


def test_persisted_index_matches_inline_and_prunes(spark, sf_dir, tmp_path):
    emb = _t(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, "vec_id", "embedding", "label", dim=64, index_dir=idx)

    query = emb.filter("vec_id = 0")
    got = search_ivf_index(spark, idx, query, "embedding", k=10, n_probe=3)
    got_rows = [(r["rank"], r["id"], r["score"]) for r in got.collect()]

    want = [
        (r["rank"], r["vec_id"], r["score"])
        for r in q_similarity_topk_ivf(spark, sf_dir).collect()
    ]
    assert got_rows == want

    # partition pruning: the stored-vector scan carries a
    # PartitionFilters predicate naming exactly the n_probe buckets —
    # unprobed partition directories never produce a scan task.
    # (inputFiles() can't show this: it lists the relation's files
    # BEFORE partition filters apply.)
    n_buckets = len(
        [d for d in os.listdir(os.path.join(idx, "vectors.parquet"))
         if d.startswith("bucket=")]
    )
    assert n_buckets > 3
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    (pf_line,) = [
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "bucket" in ln
    ]
    in_list = pf_line.split("IN (")[1].split(")")[0]
    assert len(in_list.split(",")) == 3, pf_line
