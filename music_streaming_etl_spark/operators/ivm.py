"""Incremental view maintenance for algebraic aggregate views.

``continuous_aggregate`` materializes grouped rollups;
``sources/upsert.py`` REPLACES rows by key. This operator is the
third primitive: ADDITIVE merge — given only the base table's DELTA
(new/changed rows, optionally with retractions), bring an aggregate
materialized view up to date without touching the base table again.
At 100 TB the base scan is the cost that matters: refreshing a daily
rollup from a day's delta is O(|delta|), not O(|history|).

Supported aggregate classes (the self-maintainable ones):
- count / sum: merge by adding partial values (retractions = negative
  contributions);
- min / max: merge by min/max — maintainable under INSERT-ONLY deltas
  (a retraction could remove the current extremum, which additive
  state cannot see; callers declare ``insert_only=True`` to unlock
  them, mirroring the classic IVM literature's distinction).
- avg: carried as (sum, count) pairs by the caller; never a stored
  float average.

Contract: the view and the delta-aggregate share the group keys and
column names; rows whose counts reach zero after a retraction merge
are dropped (the group disappeared). Determinism: the merge is one
full-outer hash join on the keys plus arithmetic — no windows, no
order sensitivity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["aggregate_delta", "incremental_refresh"]


def aggregate_delta(
    delta: DataFrame,
    keys: Sequence[str],
    sums: dict[str, str] | None = None,
    count_col: str = "n",
    mins: dict[str, str] | None = None,
    maxs: dict[str, str] | None = None,
) -> DataFrame:
    """Aggregate a raw delta to the view's grain: one row per key
    group with partial count / sums (/ min / max). ``sums`` maps
    output column -> source column; retraction rows carry their
    ORIGINAL source values plus an ``__delta_sign`` column of ±1 —
    this operator applies the sign to the count and sum contributions
    (callers must NOT pre-negate values, that would double-negate).

    Min/max partials are only meaningful over insert-only deltas: a
    retraction row carries NEGATED source values, which would poison
    the extrema silently. Mirroring ``incremental_refresh``'s guard,
    requesting ``mins``/``maxs`` while ``__delta_sign`` is present
    raises instead of producing an inconsistent partial (ADVICE r3)."""
    sums = sums or {}
    if (mins or maxs) and "__delta_sign" in delta.columns:
        raise ValueError(
            "min/max delta partials are only self-maintainable over "
            "insert-only deltas — this delta carries a __delta_sign "
            "retraction column, whose negated source values would "
            "poison the extrema; drop the extrema or split the delta"
        )
    sign = (
        F.col("__delta_sign")
        if "__delta_sign" in delta.columns
        else F.lit(1)
    )
    aggs = [F.sum(sign).cast("bigint").alias(count_col)]
    for out, src in sums.items():
        aggs.append(F.sum(F.col(src) * sign).alias(out))
    for out, src in (mins or {}).items():
        aggs.append(F.min(src).alias(out))
    for out, src in (maxs or {}).items():
        aggs.append(F.max(src).alias(out))
    return delta.groupBy(*keys).agg(*aggs)


def incremental_refresh(
    view: DataFrame | None,
    delta_agg: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    insert_only: bool = False,
) -> DataFrame:
    """Merge a delta aggregate into the materialized view: full-outer
    join on the keys, add counts/sums, min/max extrema (insert-only
    deltas required when min/max columns are present), drop groups
    whose count reaches zero."""
    if (min_cols or max_cols) and not insert_only:
        raise ValueError(
            "min/max view columns are only self-maintainable under "
            "insert-only deltas — declare insert_only=True or drop "
            "the extrema from the view"
        )
    if view is None:
        return delta_agg.filter(F.col(count_col) != 0)
    keys = list(keys)
    v = view.alias("v")
    d = delta_agg.alias("d")
    j = v.join(d, keys, "full_outer")

    def add(col: str):
        return (
            F.coalesce(F.col(f"v.{col}"), F.lit(0))
            + F.coalesce(F.col(f"d.{col}"), F.lit(0))
        ).alias(col)

    out_cols = [F.col(k) for k in keys]
    out_cols.append(add(count_col))
    for c in sum_cols:
        out_cols.append(add(c))
    for c in min_cols:
        out_cols.append(
            F.when(F.col(f"v.{c}").isNull(), F.col(f"d.{c}"))
            .when(F.col(f"d.{c}").isNull(), F.col(f"v.{c}"))
            .otherwise(F.least(F.col(f"v.{c}"), F.col(f"d.{c}")))
            .alias(c)
        )
    for c in max_cols:
        out_cols.append(
            F.when(F.col(f"v.{c}").isNull(), F.col(f"d.{c}"))
            .when(F.col(f"d.{c}").isNull(), F.col(f"v.{c}"))
            .otherwise(F.greatest(F.col(f"v.{c}"), F.col(f"d.{c}")))
            .alias(c)
        )
    merged = j.select(*out_cols)
    return merged.filter(F.col(count_col) != 0)
