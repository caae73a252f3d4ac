"""Slowly-changing-dimension (SCD type 2) history building.

The reference's warehouse keeps only current-state dims
(``create_tables.sql`` recreates ``users``/``songs`` wholesale each
run); any deployment that needs "what was this user's tier WHEN the
stream happened" has to reconstruct state history from the raw change
feed. ``scd2_history`` is that reconstruction as one declarative pass:

1. collapse consecutive identical observations per key (lag compare —
   a re-observed unchanged state is not a new version),
2. assign each surviving version its validity interval
   ``[valid_from, valid_to)`` via lead, open-ended for the current row.

Both steps are windows partitioned by the dimension key — bounded by
per-key observation counts (same scale argument as sessionization:
per-entity history fits a task; no global window anywhere). Join the
result to a fact on ``key AND fact.ts >= valid_from AND (valid_to IS
NULL OR fact.ts < valid_to)`` — exactly the shape ``interval_join``
handles without a nested loop.

Callers must supply a total order within each key — ``(ts_col,
*tiebreak)`` must be unique per key — the engine-wide determinism rule.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    keys: Sequence[str],
    state_cols: Sequence[str],
    ts_col: str,
    tiebreak: Sequence[str] = (),
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Build SCD2 validity intervals from a change-event feed.

    Returns one row per *version*: ``keys + state_cols + keep_cols +
    valid_from + valid_to + is_current``, where ``valid_to`` is the
    next version's ``valid_from`` (NULL for the open current version).
    ``keep_cols`` carries extra columns of the version-opening row
    through (e.g. the tiebreak id, so downstream as-of lookups can
    break equal-``valid_from`` ties deterministically).
    """
    w = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak)
    changed: Column = F.lit(False)
    for c in state_cols:
        # null-safe "differs from previous observation"
        changed = changed | ~F.lag(F.col(c)).over(w).eqNullSafe(F.col(c))
    first = F.row_number().over(w) == 1
    versions = df.withColumn("__new_version", first | changed).filter(
        F.col("__new_version")
    )
    w2 = Window.partitionBy(*keys).orderBy(ts_col, *tiebreak)
    return (
        versions.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*keys, *state_cols, *keep_cols, "valid_from", "valid_to", "is_current")
    )
