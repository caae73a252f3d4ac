"""Iterative graph analytics: PageRank by power iteration.

Spark-first shape (no GraphX dependency — plain DataFrame joins):
each round is one join (ranks → out-edges) + one aggregate (sum of
contributions per destination), i.e. two shuffles on the node key,
with ``localCheckpoint`` every few rounds to truncate the growing
lineage exactly like ``dedup.py::dedup_clusters`` does.

Determinism: ranks are FIXED-POINT BIGINTs (1 rank unit = 1e-18), all
updates use integer addition and integral division (``div``) — both
associative/order-free — so the result is bit-identical across
partitionings and runs. Plain decimal division is no good here:
Spark's ``allowPrecisionLoss`` division collapses DECIMAL(38,18) ÷
DECIMAL to scale 6 (observed: ranks rounded to 6 decimals), and
double sums wobble in the last ulps with aggregation order. Each
``div`` floors at most 1e-18 of mass; the property tests bound the
total leak and check 1e-9 agreement with a dense numpy twin.

Dangling nodes (no out-edges) redistribute their mass uniformly — the
standard correction; without it rank mass leaks and the vector no
longer sums to ~1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ONE = 10**18  # fixed-point scale: rank 1.0 == 1e18 units (fits BIGINT)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 4,
) -> DataFrame:
    """Node ranks after ``iterations`` power-iteration rounds.

    ``edges`` is a directed edge list; parallel edges count once
    (deduped here). Returns (node, rank: double) with ranks summing
    to ~1 (fixed-point floors leak < n·iterations·1e-18).
    """
    # damping as an exact rational (per-million) so the update is
    # pure integer arithmetic
    dn = int(round(damping * 1_000_000))
    dd = 1_000_000

    # r9: cache the deduped edge list — every iteration's contribs
    # join and the degree frame consume it, and the caller's edge
    # frame may itself be an expensive pipeline (pagerank_copurchase
    # feeds a full order-grain self-join): uncached, each eager
    # checkpoint epoch recomputed that upstream once per reference.
    # Same cache-not-checkpoint and caller-owned-lifetime policy as
    # `nodes` below and the minhash index.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct().cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        # cache, not localCheckpoint: consumed by the count below, every
        # iteration's join, and the returned frame; a cached block
        # recomputes if evicted where a lineage-cut checkpoint block is
        # simply lost (measured at the 1000x minhash probe)
        .cache()
    )
    n = nodes.count()
    if n == 0:  # empty graph → empty ranks (not a divide-by-zero)
        return nodes.select(
            "node", F.lit(None).cast("double").alias("rank")
        )
    # r9: cached — joined against ranks once per iteration
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).cache()

    base = _ONE // n                      # teleport mass per node (units)
    teleport = ((dd - dn) * base) // dd   # (1-d)/n, exact python int

    ranks = nodes.select("node", F.lit(base).cast("bigint").alias("rank"))
    for i in range(iterations):
        with_deg = ranks.join(
            out_deg, ranks["node"] == out_deg["src"], "left"
        ).select("node", "rank", "deg")
        dangling = with_deg.filter(F.col("deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0)).cast("bigint").alias("dm")
        )
        contribs = (
            with_deg.filter(F.col("deg").isNotNull())
            .select("node", F.expr("rank div deg").alias("share"))
            .join(e, F.col("node") == e["src"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("inflow"))
        )
        # new = (1-d)/n + d * (inflow + dangling/n); the d-multiply
        # widens through DECIMAL(38,0) (85e4 * 1e18 overflows BIGINT)
        # then integral-divides back — exact, order-free
        damped = (
            f"CAST((CAST(coalesce(inflow, 0) + (dm div {n}) AS DECIMAL(38,0))"
            f" * {dn}) div {dd} AS BIGINT)"
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select("node", F.expr(f"{teleport} + {damped}").alias("rank"))
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node", (F.col("rank").cast("double") / F.lit(float(_ONE))).alias("rank")
    )
