"""Time-series gap handling: last-observation-carried-forward.

The reference's hourly KPI frame (``dags/music_streaming_etl_dags.py``
``compute_hourly_kpis``) silently drops hours with no events; any
consumer charting "current state per entity over time" needs the last
known value carried forward across the gaps. ``locf`` is that fill as
a single window expression.

Scale design: one window per entity key, ordered by the event time —
``F.last(ignorenulls=True)`` over an unbounded-preceding frame is a
running accumulator, evaluated in one pass per partition after the
per-key shuffle+sort. State is O(1) per column being filled; the
partition is bounded by per-entity history (the same argument as
sessionization/SCD2 — never a global window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def locf(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    fill_cols: Sequence[str],
    suffix: str = "_filled",
) -> DataFrame:
    """Carry each ``fill_cols`` value forward within its key group.

    ``order_by`` must totally order rows within a key (engine-wide
    determinism rule) — pass a tiebreak column alongside the timestamp.
    Nulls BEFORE the first observation stay null (there is nothing to
    carry); callers wanting a default should ``coalesce`` after.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in fill_cols:
        out = out.withColumn(c + suffix, F.last(c, ignorenulls=True).over(w))
    return out


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """N-step ordered funnel (view → click → purchase …): a user
    reaches step i at the EARLIEST event of type ``steps[i]`` strictly
    after their step i−1 time. Returns ONE row with a ``bigint`` user
    count per step — the classic product-analytics conversion query.

    Scale shape: every step is a conditional-min window over the SAME
    ``partitionBy(user)`` — Catalyst plans one exchange on the user
    key and stacks N window passes on it, so an N-step funnel costs
    one shuffle regardless of N (plus the final 1-row aggregate).
    No self-joins, no per-step scans of the fact."""
    w = Window.partitionBy(user_col)
    out = df
    prev: Column | None = None
    step_cols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        c = f"__t{i}"
        out = out.withColumn(c, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(c)
        step_cols.append(c)
    per_user = out.select(user_col, *step_cols).distinct()
    return per_user.agg(
        *[
            F.count(F.when(F.col(c).isNotNull(), F.lit(1)))
            .cast("bigint")
            .alias(f"n_{steps[i]}")
            for i, c in enumerate(step_cols)
        ]
    )
