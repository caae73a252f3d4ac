"""Round-7 STAGED registry surface — built, oracle-twinned, and
pytest-verified this round, but NOT wired into ``registry.py``.

VERDICT r5 item 7 froze the live registry at 270 keys until the
round-6 driver window retires the last 15 never-checked keys, and
named the surface rounds 7+ may then add: "a MERGE-INTO/upsert
registry key against a local Delta-style staging table, or promoting
a rows-only ANN key to a bounded-error oracle — each with oracle
twin, degenerate entry, scale probe, and property twin". This module
is exactly that surface, pre-staged so round 7's registration is a
two-line change in ``registry.py`` (import + ``REGISTRY.update``)
instead of fresh, unproven code in the driver window:

- ``merge_into_customers`` — ANSI MERGE with all four row fates
  (conditional DELETE, UPDATE expressions over both sides, INSERT,
  carry-through), on a staging table derived from orders
  (``sources/upsert.py::merge_into``). The reference spec's
  Deliverable-4 staging-upsert, in its full clause form.
- ``merge_upsert_kpis`` — the REPLACE-style staging upsert
  (``sources/upsert.py::merge_upsert``, previously pytest-only)
  as an oracle-backed key: late-window KPI rows replace early-window
  rows per key, unmatched target rows survive.
- ``similarity_topk_ivf_full_probe`` — the rows-only learned-IVF ANN
  path promoted to a CELL-EXACT oracle: with ``n_probe == n_clusters``
  the probe is exhaustive and probed vectors are scored with exact
  cosine, so the entire IVF machinery (k-means training, literal-
  centroid assignment, centroid ranking, semi-join prune, merge)
  must reproduce brute-force top-k EXACTLY — the oracle is the
  existing brute-force SQL, whatever the learned codebook converged
  to. Zero-recall-loss is a provable property of the exhaustive
  configuration, not a tuned coincidence.

Keys follow every registry convention: aliased columns matching the
oracle, deterministic tie-breaks, decimal-accumulated float sums,
``_t``'s per-query UTC pin. Verified by ``tests/test_staged_round7.py``
(cell-exact vs DuckDB at sf0.001 + sf0.01, type-parity DESCRIBE gate,
degenerate empty/tiny behavior, clause-semantics unit tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.upsert import merge_into, merge_upsert
from .testdata_queries import _t


def q_merge_into_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO customer USING (order-derived staging): per-customer
    spend/segment refresh with a churn-out DELETE, plus synthetic
    NEGATED-key rows (-k-1) so the INSERT branch fires at every SF —
    negation can never collide with a real (non-negative) custkey at
    ANY scale, unlike an additive shift, so staging stays unique on
    the merge key (the ANSI cardinality contract) however large the
    table grows. Staging keys ≡ 1 (mod 3) are withheld so
    carry-through (no staging row) is exercised too — all four ANSI
    row fates in one result."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    base = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .where(F.col("c_custkey") % 3 != 1)
    )
    staging = base.unionByName(
        base.where(F.col("c_custkey") % 20 == 3).select(
            (-F.col("c_custkey") - 1).alias("c_custkey"),
            "spend",
            "n_orders",
        )
    ).withColumn(
        "segment",
        F.when(F.col("n_orders") >= 12, F.lit("VIP")).otherwise(F.lit("STANDARD")),
    )
    return merge_into(
        cust,
        staging,
        on=["c_custkey"],
        when_matched_delete=F.col("s.n_orders") <= 2,
        when_matched_update={
            "c_acctbal": (
                F.col("t.c_acctbal").cast("decimal(28,2)") + F.col("s.spend")
            ).cast("double"),
            "c_mktsegment": F.col("s.segment"),
        },
        when_not_matched_insert={
            "c_custkey": F.col("s.c_custkey"),
            "c_name": F.concat(
                F.lit("Customer#NEW"), F.col("s.c_custkey").cast("string")
            ),
            "c_nationkey": (F.abs(F.col("s.c_custkey")) % 25).cast("int"),
            "c_acctbal": F.col("s.spend").cast("double"),
            "c_mktsegment": F.col("s.segment"),
        },
    )


ORACLE_MERGE_INTO_CUSTOMERS = """
WITH base AS (
  SELECT o_custkey AS c_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS spend,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
  HAVING o_custkey % 3 != 1
), s AS (
  SELECT c_custkey, spend, n_orders,
         CASE WHEN n_orders >= 12 THEN 'VIP' ELSE 'STANDARD' END AS segment
  FROM (
    SELECT * FROM base
    UNION ALL
    SELECT -c_custkey - 1, spend, n_orders FROM base
    WHERE c_custkey % 20 = 3
  )
)
SELECT
  COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
  CASE WHEN t.c_custkey IS NULL
       THEN 'Customer#NEW' || CAST(s.c_custkey AS VARCHAR)
       ELSE t.c_name END AS c_name,
  CASE WHEN t.c_custkey IS NULL
       THEN CAST(abs(s.c_custkey) % 25 AS INTEGER)
       ELSE t.c_nationkey END AS c_nationkey,
  CASE WHEN t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
       THEN CAST(CAST(t.c_acctbal AS DECIMAL(28,2)) + s.spend AS DOUBLE)
       WHEN t.c_custkey IS NULL THEN CAST(s.spend AS DOUBLE)
       ELSE t.c_acctbal END AS c_acctbal,
  CASE WHEN s.c_custkey IS NULL THEN t.c_mktsegment ELSE s.segment END AS c_mktsegment
FROM customer t FULL JOIN s ON t.c_custkey = s.c_custkey
WHERE NOT (t.c_custkey IS NOT NULL AND s.c_custkey IS NOT NULL
           AND COALESCE(s.n_orders <= 2, FALSE))
"""
# COALESCE(pred, FALSE) mirrors merge_into's three-valued-logic
# contract (a NULL delete predicate falls through to UPDATE, never
# deletes) — COUNT(*) is never NULL so it is a no-op HERE, but the
# template must stay copy-safe for future staged MERGE keys whose
# delete predicates are nullable.


def q_merge_upsert_kpis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REPLACE-style staging upsert on a KPI table: early-window
    per-customer order KPIs are the target, late-window KPIs the
    staging batch — staging rows replace matched keys wholesale,
    unmatched target keys survive (the Deliverable-4 lifecycle the
    reference recreates with DROP+CREATE)."""
    orders = _t(spark, sf_dir, "orders")

    def kpis(pred):
        return orders.where(pred).groupBy(
            F.col("o_custkey").alias("custkey")
        ).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("spend"),
        )

    cut = F.lit("1995-06-17").cast("timestamp")
    target = kpis(F.col("o_orderdate") < cut)
    staging = kpis(F.col("o_orderdate") >= cut)
    merged = merge_upsert(target, staging, ["custkey"], staging_unique=True)
    return merged.select("custkey", "n_orders", "spend")


ORACLE_MERGE_UPSERT_KPIS = """
WITH t AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend
  FROM orders WHERE o_orderdate < TIMESTAMP '1995-06-17' GROUP BY 1
), s AS (
  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS spend
  FROM orders WHERE o_orderdate >= TIMESTAMP '1995-06-17' GROUP BY 1
)
SELECT custkey, n_orders, spend FROM s
UNION ALL
SELECT t.custkey, t.n_orders, t.spend FROM t
WHERE t.custkey NOT IN (SELECT custkey FROM s)
"""


def q_similarity_topk_ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-IVF ANN with n_probe == n_clusters: the exhaustive
    probe scores every vector with exact cosine, so the result is
    provably the brute-force top-k regardless of what the k-means
    codebook learned — which promotes the rows-only IVF path to a
    cell-exact oracle (the brute-force SQL). Exercises the full
    production machinery: Lloyd training, literal-centroid argmin
    assignment, centroid ranking, semi-join prune, global top-k."""
    from ..operators.similarity import similarity_topk_ivf_learned

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    out = similarity_topk_ivf_learned(
        emb, query, "vec_id", "embedding", dim=64, k=10,
        n_clusters=8, n_probe=8, iterations=3,
    )
    return out.select("rank", F.col("id").alias("vec_id"), "score")


# Exhaustive probe ≡ brute force: reuse the registered brute-force
# oracle text verbatim (single source of truth for the scoring SQL).
def _oracle_sim_topk_full_probe() -> str:
    from .extension_queries import ORACLE_SIM_TOPK

    return ORACLE_SIM_TOPK


# Round-7 registration payload: registry.py does
#   from .staged_queries import REGISTRY_STAGED
#   REGISTRY.update(REGISTRY_STAGED)
# and _PRIORITY/front-of-window placement follows the new-code-first
# rule (new keys are the riskiest — they earn driver rows immediately).
REGISTRY_STAGED: dict = {
    "merge_into_customers": (q_merge_into_customers, ORACLE_MERGE_INTO_CUSTOMERS),
    "merge_upsert_kpis": (q_merge_upsert_kpis, ORACLE_MERGE_UPSERT_KPIS),
    "similarity_topk_ivf_full_probe": (
        q_similarity_topk_ivf_full_probe,
        _oracle_sim_topk_full_probe(),
    ),
}
