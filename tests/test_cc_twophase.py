"""Large-star/small-star connected components vs min-label
propagation: both must produce identical (id, cluster_id) labelings on
graphs the synthetic-corpus oracle can't shape — deep chains (where
propagation needs diameter rounds), multi-clique unions, singletons,
and seeded random graphs."""

from __future__ import annotations

import random

from music_streaming_etl_spark.operators.dedup import (
    dedup_clusters,
    dedup_clusters_twophase,
)


def _run_both(spark, n_nodes, edges, max_iter_prop=200):
    ids = spark.createDataFrame([(i,) for i in range(n_nodes)], ["id"])
    pairs = spark.createDataFrame(edges or [(0, 0)], ["id_a", "id_b"])
    if not edges:
        pairs = pairs.limit(0)
    a = sorted(
        tuple(r)
        for r in dedup_clusters(
            ids, pairs, "id", max_iterations=max_iter_prop
        ).collect()
    )
    b = sorted(
        tuple(r) for r in dedup_clusters_twophase(ids, pairs, "id").collect()
    )
    return a, b


def test_deep_chain_agrees(spark):
    # diameter-40 chain: propagation needs ~40 rounds, two-phase ~log²
    edges = [(i, i + 1) for i in range(40)]
    a, b = _run_both(spark, 41, edges)
    assert a == b
    assert all(c == 0 for _, c in b)  # one component labeled by min


def test_cliques_and_singletons_agree(spark):
    edges = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]  # clique 0-4
        + [(10, 11), (11, 12)]  # path 10-12
    )
    a, b = _run_both(spark, 15, edges)
    assert a == b
    labels = dict(b)
    assert labels[3] == 0 and labels[12] == 10
    assert labels[14] == 14  # singleton labels itself


def test_random_graphs_agree(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        a, b = _run_both(spark, n, edges)
        assert a == b


def test_empty_edges_all_singletons(spark):
    a, b = _run_both(spark, 5, [])
    assert a == b == [(i, i) for i in range(5)]
