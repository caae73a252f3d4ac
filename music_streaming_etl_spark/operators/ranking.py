"""Global ranking operators that avoid the single-partition window.

``row_number().over(Window.orderBy(...))`` with no ``partitionBy``
moves EVERY row to one partition (Spark even logs
``WARN WindowExec: No Partition Defined``) — a correctness-preserving
plan that dies at 100 TB. These helpers express the same semantics
with distributed physical plans:

- ``global_topk`` — ``orderBy(...).limit(k)`` plans as
  ``TakeOrderedAndProject``: each partition keeps a k-row heap and the
  driver merges #partitions × k rows. The rank column is then computed
  by a window over just those k rows (bounded, tiny).
- ``global_rank`` / ``global_ntile`` — exact dense 1..N ranking via
  ``repartitionByRange`` on the sort key + per-partition
  ``row_number`` + broadcast cumulative partition offsets. Only the
  #partitions-row offset table is ever single-partition. Ranks are a
  pure function of the total order, so results are deterministic even
  though range boundaries come from sampling.

Callers must supply a TOTAL order (tie-break to a unique column) —
same rule as every top-k/mode in this engine (SURVEY.md §2.4 A3/A5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Deterministic global top-k with a 1-based ``rank`` column.

    Physical plan: TakeOrderedAndProject (per-partition top-k heaps,
    merged once) instead of shuffling the full input to one window
    partition. The trailing window ranks only the k surviving rows.
    """
    top = df.orderBy(*order).limit(k)
    # this window only ever sees the k surviving rows, so its single
    # partition (and Spark's WindowExec WARN about it) is by design —
    # the unbounded input was already reduced by TakeOrderedAndProject
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def grouped_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    num_salts: int = 16,
) -> DataFrame:
    """Per-group top-k (1-based ``rank`` within each group) that
    survives hot groups.

    The naive ``row_number().over(partitionBy(group))`` sorts each
    group on ONE reducer — a straggler when one domain holds half the
    corpus (the per-domain cap every pretraining pipeline applies).
    Phase 1 here salts each group across ``num_salts`` reducers and
    keeps a per-(group, salt) top-k, so no task ever sorts more than
    ~|group|/num_salts rows; phase 2 re-ranks the ≤ num_salts × k
    survivors per group — a bounded window by construction.

    The salt is a deterministic content hash (not ``rand()``), so the
    plan is reproducible; ``order`` must be a total order within each
    group (tie-break to a unique id) for ranks to be well-defined.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(num_salts))
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*order)
    survivors = (
        df.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2).cast("bigint"))
        .filter(F.col("rank") <= k)
        .drop("__salt")
    )


def global_rank(
    df: DataFrame, order: Sequence[Column], num_partitions: int = 32
) -> DataFrame:
    """Exact global 1..N ``rank`` without a global window.

    Range-partition on the sort order, rank locally, then add each
    partition's cumulative row-count offset (a #partitions-row table,
    broadcast). At 1000 executors the only serial step is the offset
    prefix-sum over ~thousands of rows.
    """
    # Persisted because BOTH the local-rank and the offset subtree read
    # it: range boundaries come from sampling, so two independent
    # executions could disagree on _pid assignment and corrupt ranks.
    # Exchange reuse usually dedupes this anyway; the persist makes it
    # a guarantee rather than an optimizer outcome.
    parts = (
        df.repartitionByRange(num_partitions, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    local = parts.withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*order)),
    )
    offsets = (
        parts.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            # prefix-sum over the #partitions-row count table — its
            # single-partition window is bounded by design
            F.coalesce(
                F.sum("_n").over(Window.orderBy("_pid")) - F.col("_n"),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("rank", (F.col("_lrn") + F.col("_offset")).cast("bigint"))
        .drop("_pid", "_lrn", "_offset")
    )


def global_prefix_sum(
    df: DataFrame,
    order: Sequence[Column],
    value_col: str,
    num_partitions: int = 32,
    alias: str = "prefix_sum",
) -> DataFrame:
    """Exact EXCLUSIVE running total of ``value_col`` over a total
    order, distributed — ``global_rank`` generalized from counting
    rows to summing a value: range-partition on the order, local
    cumulative sum, then add each partition's cumulative value-total
    offset (a #partitions-row broadcast). Row 1 gets 0; row i gets
    Σ values of rows 1..i−1."""
    parts = (
        df.repartitionByRange(num_partitions, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    local = parts.withColumn(
        "_lsum",
        F.sum(value_col).over(
            Window.partitionBy("_pid")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.col(value_col),
    )
    offsets = (
        parts.groupBy("_pid")
        .agg(F.sum(value_col).alias("_n"))
        .withColumn(
            "_offset",
            # prefix-sum over the #partitions-row totals table — its
            # single-partition window is bounded by design
            F.coalesce(
                F.sum("_n").over(Window.orderBy("_pid")) - F.col("_n"),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(alias, (F.col("_lsum") + F.col("_offset")).cast("bigint"))
        .drop("_pid", "_lsum", "_offset")
    )


def global_ntile(
    df: DataFrame, order: Sequence[Column], n: int, num_partitions: int = 32
) -> DataFrame:
    """Exact ``ntile(n)`` over a total order, distributed.

    Reproduces SQL NTILE bucket sizing exactly: with N rows, the first
    ``N % n`` buckets get ``N/n + 1`` rows, the rest ``N/n`` — computed
    from the ``global_rank`` output with pure arithmetic, so the result
    hash-matches a warehouse NTILE on the same total order.
    """
    ranked = global_rank(df, order, num_partitions)
    total = ranked.agg(F.count(F.lit(1)).alias("_total"))
    r = F.col("rank")
    n_total = F.col("_total")
    q = F.floor(n_total / n)
    big = n_total % n  # buckets 1..big have q+1 rows
    cut = (q + 1) * big  # rows 1..cut live in the big buckets
    tile = F.when(r <= cut, F.ceil(r / (q + 1))).otherwise(
        big + F.ceil((r - cut) / q)
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("tile", tile.cast("bigint"))
        .drop("_total")
    )
