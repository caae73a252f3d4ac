"""As-of (point-in-time) join — a custom operator Spark's built-in
join types don't offer (build charter: "custom operators … as a
composition of existing DataFrame ops if semantics allow").

``asof_join(left, right, …)``: for every left row, attach the single
right row nearest in time within the same key — the canonical
enrich-events-with-latest-dimension-state / trades-vs-quotes
operation. Three directions (pandas ``merge_asof`` parity):

- ``backward`` (default): greatest ``right_ts <= left_ts``
- ``forward``: smallest ``right_ts >= left_ts``
- ``nearest``: whichever of the two is closer (tie → backward)

plus an optional ``tolerance_seconds`` that nulls out matches farther
than the tolerance (again the ``merge_asof`` contract).

Implementation is the union+window composition, NOT a range self-join:

    tag left/right → union → window over (key ORDER BY ts, side)
    → ``last(value, ignoreNulls)`` carries the latest right values
    forward onto each left row → filter left side.

One shuffle on the key, state per window = the carried values —
O(n log n) per key vs the O(n·m) of a naive inequality join, and no
Python. ``nearest`` adds a second sort (opposite direction) over the
SAME key partitioning — Catalyst reuses the exchange and only inserts
the extra sort, so the cost is one more per-partition sort, never a
second shuffle. Ordering is total (ts, side, seq) so ties are
deterministic: a right row at exactly left_ts is eligible in every
direction (<=/>= semantics); equal right timestamps resolve by
``seq_col`` (backward: highest wins = latest version; forward: lowest
wins = earliest record).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (sorts first at equal ts), 1 = left

_DIRECTIONS = ("backward", "forward", "nearest")


def _carry(
    unioned: DataFrame,
    key: str,
    value_cols: Sequence[str],
    *,
    descending: bool,
    with_seq: bool,
    prefix: str,
) -> DataFrame:
    """Attach ``last(value, ignoreNulls)`` carries over one directed
    traversal. Ascending = backward matches; descending = forward.
    At equal __ts the right side (0) always sorts before left (1) so
    equality stays eligible; among equal-ts right rows the seq order
    is flipped with the traversal so the documented winner (backward:
    highest seq, forward: lowest) is the row traversed last."""
    if descending:
        order: list[Column] = [F.col("__ts").desc(), F.col(_SIDE).asc()]
        if with_seq:
            order.append(F.col("__seq").desc_nulls_first())
    else:
        order = [F.col("__ts").asc(), F.col(_SIDE).asc()]
        if with_seq:
            order.append(F.col("__seq").asc_nulls_first())
    w = Window.partitionBy(key).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return unioned.select(
        "*",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in value_cols
        ],
        F.last("__rts", ignorenulls=True).over(w).alias(f"{prefix}__rts"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    seq_col: str | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join: all left columns + ``value_cols`` from the
    nearest right row per ``direction`` (NULLs when no right row
    qualifies). ``seq_col`` breaks equal-``right_ts`` ties; required
    for determinism if right timestamps can collide within a key.
    ``tolerance_seconds`` nulls the match when the matched right row
    is farther than the tolerance from ``left_ts``."""
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumn("__ts", F.col(left_ts))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"__v_{c}", F.lit(None).cast(right.schema[c].dataType))
    l_tagged = l_tagged.withColumn("__rts", F.lit(None).cast(right.schema[right_ts].dataType))

    r_cols = [
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.col(right_ts).alias("__rts"),
        F.lit(0).alias(_SIDE),
    ]
    if seq_col is not None:
        if seq_col not in right.columns:
            raise ValueError(
                f"seq_col {seq_col!r} not in right columns {right.columns}"
            )
        # carry seq through the select — it must survive into the union
        r_cols.append(F.col(seq_col).alias("__seq"))
        l_tagged = l_tagged.withColumn(
            "__seq", F.lit(None).cast(right.schema[seq_col].dataType)
        )
    r_tagged = right.select(
        *r_cols, *[F.col(c).alias(f"__v_{c}") for c in value_cols]
    )
    for c in left.columns:
        if c not in (key,):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    with_seq = seq_col is not None

    def within_tol(rts: Column) -> Column:
        if tolerance_seconds is None:
            return F.lit(True)
        diff = F.abs(
            F.col("__ts").cast("double") - rts.cast("double")
        )
        return diff <= F.lit(float(tolerance_seconds))

    if direction in ("backward", "forward"):
        carried = _carry(
            unioned,
            key,
            value_cols,
            descending=(direction == "forward"),
            with_seq=with_seq,
            prefix="__m_",
        )
        keep = within_tol(F.col("__m___rts"))
        picked = [
            F.when(keep, F.col(f"__m_{c}")).alias(f"{c}{suffix}")
            for c in value_cols
        ]
    else:  # nearest: both traversals over the same key partitioning
        carried = _carry(
            unioned, key, value_cols, descending=False, with_seq=with_seq, prefix="__b_"
        )
        carried = _carry(
            carried, key, value_cols, descending=True, with_seq=with_seq, prefix="__f_"
        )
        bts, fts = F.col("__b___rts"), F.col("__f___rts")
        ts_d = F.col("__ts").cast("double")
        # tie (equal distance) → backward, matching pandas merge_asof;
        # a side that is out of tolerance or absent loses automatically
        b_ok = bts.isNotNull() & within_tol(bts)
        f_ok = fts.isNotNull() & within_tol(fts)
        use_b = b_ok & (
            ~f_ok | ((ts_d - bts.cast("double")) <= (fts.cast("double") - ts_d))
        )
        picked = [
            F.when(use_b, F.col(f"__b_{c}"))
            .when(f_ok, F.col(f"__f_{c}"))
            .alias(f"{c}{suffix}")
            for c in value_cols
        ]

    out_cols = [F.col(c) for c in left.columns] + picked
    return carried.filter(F.col(_SIDE) == 1).select(*out_cols)
