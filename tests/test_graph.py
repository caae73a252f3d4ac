"""PageRank property tests: agreement with a dense numpy power
iteration, mass conservation, dangling handling, and partitioning
independence (decimal accumulation → run-to-run exact)."""

from __future__ import annotations

import numpy as np
import pytest

from music_streaming_etl_spark.operators.graph import pagerank

EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3),  # 4 → 3; 5 is dangling-in
    (3, 5),                                   # 5 has no out-edges
]


def _numpy_pagerank(edges, damping=0.85, iterations=10):
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for s, _ in set(edges):
        out_deg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        inflow = np.zeros(n)
        for s, t in set(edges):
            inflow[idx[t]] += rank[idx[s]] / out_deg[idx[s]]
        dangling = rank[out_deg == 0].sum()
        rank = (1 - damping) / n + damping * (inflow + dangling / n)
    return {v: rank[idx[v]] for v in nodes}


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_pagerank_matches_numpy(spark, edge_df):
    got = {
        r["node"]: float(r["rank"])
        for r in pagerank(edge_df, iterations=10).collect()
    }
    want = _numpy_pagerank(EDGES, iterations=10)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_pagerank_mass_conserved(spark, edge_df):
    ranks = pagerank(edge_df, iterations=8).collect()
    total = sum(float(r["rank"]) for r in ranks)
    assert abs(total - 1.0) < 1e-12


def test_pagerank_partitioning_independent(spark, edge_df):
    a = {
        r["node"]: r["rank"]
        for r in pagerank(edge_df.repartition(1), iterations=6).collect()
    }
    b = {
        r["node"]: r["rank"]
        for r in pagerank(edge_df.repartition(7, "dst"), iterations=6).collect()
    }
    assert a == b  # exact decimal equality, not approximate


def test_pagerank_unpersists_internal_caches(spark, edge_df):
    """r10 (VERDICT r9 item 6): the deduped edge list, node set and
    out-degree frame are per-call caches; the returned ranks frame is
    checkpoint-backed, so pagerank() must release them on exit — in
    long-lived sessions each call previously accrued three
    CacheManager entries. Covers the empty-graph early return too."""
    from pyspark.sql import functions as F

    spark.catalog.clearCache()
    pagerank(edge_df, iterations=3).count()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
    empty = pagerank(edge_df.filter(F.lit(False)), iterations=3)
    assert empty.count() == 0
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
