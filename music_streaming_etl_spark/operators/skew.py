"""Skew- and shuffle-engineering operators.

The reference's data is pathologically skewed — 98% of users share one
country (SURVEY.md §1.1) and genres are Zipf-distributed — which is
harmless to single-process pandas but decides whether a 1000-executor
job finishes: one hot key = one straggler task holding the whole stage.

Two mitigations, composable with any aggregate in this engine:

- **AQE skew handling** (session default): runtime splitting of
  oversized shuffle partitions. Free, but only kicks in above
  partition-size thresholds.
- **Salting** (here): explicit two-phase aggregation — spray the hot
  key across N salts, partially aggregate, then re-combine. Works for
  any algebraic aggregate (count/sum/min/max; avg as sum+count);
  NOT for exact distinct (distinct sets don't merge) — use HLL there.

Bucketing (co-located joins without a shuffle) lives in
``bucketed_table``/``join_bucketed`` below: both sides pre-hashed into
the same bucket layout make every future equi-join on that key a
zero-exchange zip of matching buckets — the standard trick for a fact
table joined on the same key by many recurring queries.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: list,
    finals: list,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(keys + salt) with
    ``partials``, then groupBy(keys) re-combining with ``finals``.
    The salt is a deterministic-per-row-content hash bucket (not
    rand() — keeps the whole plan reproducible), so hot keys split
    across ``num_salts`` reducers in phase 1 while phase 2 touches
    only |keys × salts| rows."""
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(num_salts))
    )
    phase1 = salted.groupBy(*keys, SALT).agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_count(
    df: DataFrame, keys: Sequence[str], count_col: str, alias: str, num_salts: int = 16
) -> DataFrame:
    """Salted version of A1 ``agg_count`` — identical result, skew-safe
    plan."""
    return salted_agg(
        df,
        keys,
        partials=[F.count(count_col).alias("__pc")],
        finals=[F.sum("__pc").alias(alias)],
        num_salts=num_salts,
    )


def bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
) -> DataFrame:
    """Persist ``df`` as a bucketed+sorted managed table (drop-and-
    recreate). Reads of this table carry the hash-partitioning in
    their physical plan, so joins/aggregations on ``bucket_col`` skip
    the exchange entirely."""
    import os
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(
        os.path.join(warehouse.removeprefix("file:"), table), ignore_errors=True
    )
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table)
    )
    return spark.table(table)


def join_bucketed(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """Equi-join two tables bucketed on ``key``: with matching bucket
    counts Catalyst plans a sort-merge join with NO Exchange on either
    side (verify: no 'Exchange' nodes in the physical plan)."""
    return left.join(right, key)


def key_skew_profile(df: DataFrame, key: str, top_n: int = 20) -> DataFrame:
    """Join/groupBy-key skew diagnostic: the ``top_n`` heaviest keys
    with their row counts and global share — the first thing to run
    before sizing a shuffle at scale (a 0.3-share key means salting or
    a skew-join hint; a flat profile means plain hash partitioning is
    fine).

    Shape: one hash aggregation to per-key counts, then
    ``global_topk`` (per-partition heaps — never a global window) and
    a broadcast 1-row total for the share. Deterministic: total order
    (cnt DESC, key ASC).

    Returns ``rank, <key>, cnt, share``."""
    from .ranking import global_topk

    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("double").alias("__tot"))
    top = global_topk(counts, [F.col("cnt").desc(), F.col(key).asc()], top_n)
    return top.crossJoin(F.broadcast(total)).select(
        "rank",
        key,
        "cnt",
        # raw (round-7 sweep): one quotient of exact counts
        (F.col("cnt").cast("double") / F.col("__tot")).alias("share"),
    )
