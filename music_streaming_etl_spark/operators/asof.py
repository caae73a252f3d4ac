"""As-of (point-in-time) join — a custom operator Spark's built-in
join types don't offer (build charter: "custom operators … as a
composition of existing DataFrame ops if semantics allow").

``asof_join(left, right, …)``: for every left row, attach the single
right row with the greatest ``right_ts <= left_ts`` within the same
key — the canonical enrich-events-with-latest-dimension-state /
trades-vs-quotes operation.

Implementation is the union+window composition, NOT a range self-join:

    tag left/right → union → window over (key ORDER BY ts, side)
    → ``last(value, ignoreNulls)`` carries the latest right values
    forward onto each left row → filter left side.

One shuffle on the key, state per window = the carried values —
O(n log n) per key vs the O(n·m) of a naive inequality join, and no
Python. Ordering is total (ts, side, seq) so ties are deterministic:
a right row at exactly left_ts sorts before the left row (<=
semantics), equal right timestamps resolve by the highest ``seq_col``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (sorts first at equal ts), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    seq_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: all left columns + ``value_cols`` from the
    latest right row at-or-before the left timestamp (NULLs when no
    right row precedes). ``seq_col`` breaks equal-``right_ts`` ties
    (highest wins); required for determinism if right timestamps can
    collide within a key."""
    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumn("__ts", F.col(left_ts))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"__v_{c}", F.lit(None).cast(right.schema[c].dataType))

    r_cols = [F.col(key), F.col(right_ts).alias("__ts"), F.lit(0).alias(_SIDE)]
    if seq_col is not None:
        if seq_col not in right.columns:
            raise ValueError(
                f"seq_col {seq_col!r} not in right columns {right.columns}"
            )
        # carry seq through the select — it must survive into the union
        r_cols.append(F.col(seq_col).alias("__seq"))
    r_tagged = right.select(
        *r_cols, *[F.col(c).alias(f"__v_{c}") for c in value_cols]
    )
    for c in left.columns:
        if c not in (key,):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    # order: (ts, side, seq) — side separates left/right FIRST at equal
    # ts (right side=0 sorts before left, preserving <= at-or-before
    # semantics), THEN seq breaks ties among equal-ts right rows
    # (highest seq sorts last → wins last(ignoreNulls)). Left rows'
    # null seq never matters: side already made them distinct.
    order = [F.col("__ts").asc(), F.col(_SIDE).asc()]
    if seq_col is not None:
        l_tagged = l_tagged.withColumn(
            "__seq", F.lit(None).cast(right.schema[seq_col].dataType)
        )
        order.append(F.col("__seq").asc_nulls_first())

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    out_cols = [c for c in left.columns] + [f"{c}{suffix}" for c in value_cols]
    return carried.filter(F.col(_SIDE) == 1).select(*out_cols)
