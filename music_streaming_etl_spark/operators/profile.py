"""One-pass table profiling: per-column stats as rows.

The reference validates loads with hand-written per-table checks
(``USERS_VALIDATION_QUERY``, ref ``dags/music_streaming_etl_dags.py:
65-80``); a warehouse onboarding a NEW 100 TB source first needs the
generic profile — per column: row count, null count, distinct count,
min, max. ``profile_columns`` computes all of it in ONE aggregation
pass (never one job per column — at 100 TB each extra pass is a full
re-scan), then pivots the single result row into per-column rows with
a driver-free explode.

Distinct counts use exact ``count_distinct``; Catalyst plans the
multi-distinct via Expand (rows duplicated per distinct spec inside
the map task, partial-aggregated before the shuffle) — still a single
scan. For quick looks at petabyte scale pass ``approx=True`` to swap
in HLL sketches (``approx_count_distinct``), which collapses Expand
into plain partial aggs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Profile ``cols`` (default: all) in one aggregation.

    Returns one row per column: ``column, n_rows, n_nulls,
    n_distinct, min_value, max_value`` (min/max rendered as strings so
    heterogeneous column types stack into one frame).
    """
    if cols is None:
        cols = df.columns
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
