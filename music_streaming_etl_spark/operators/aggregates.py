"""Aggregation operators (SURVEY.md §2.4, A1–A7).

The reference does all aggregation as eager single-process pandas
``groupby().agg()`` with three Python-lambda UDAFs
(``dags/music_streaming_etl_dags.py:185-207``). Here every one of them
is a native Spark expression, so Catalyst plans partial+final hash
aggregation and whole-stage codegen — no Python in the hot path.

Scale notes (100 TB):
- All group-bys shuffle on the group key; skewed keys are handled by
  AQE skew splitting (enabled in session.py).
- ``agg_mode`` / ``agg_topk_by_freq`` pre-aggregate counts *before*
  the window rank, so window state per partition is bounded by the
  number of distinct (group, value) pairs, not rows.
- Exact ``countDistinct`` per group is a two-phase shuffle; the
  ``approximate=True`` variants swap in HLL sketches
  (``approx_count_distinct``) for the 1000-executor path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def drop_null_group_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """pandas ``groupby(dropna=True)`` semantics (the reference default).

    pandas silently drops rows whose group key is NaN — after the left
    join at ``dags/music_streaming_etl_dags.py:178``, stream rows with
    no matching song vanish from genre_kpis. Spark keeps null keys as a
    group, so the engine applies this filter explicitly wherever the
    reference's semantics must be matched (SURVEY.md §2.4).
    """
    cond = None
    for k in keys:
        c = F.col(k).isNotNull()
        cond = c if cond is None else (cond & c)
    return df.filter(cond) if cond is not None else df


def agg_count(df: DataFrame, keys: Sequence[str], col: str, alias: str) -> DataFrame:
    """A1 — count of non-null ``col`` per group (pandas ``count`` and
    ``F.count`` both skip nulls; ref :185-188)."""
    return df.groupBy(*keys).agg(F.count(col).alias(alias))


def agg_avg(df: DataFrame, keys: Sequence[str], col: str, alias: str) -> DataFrame:
    """A2 — null-skipping mean per group (ref :189)."""
    return df.groupBy(*keys).agg(F.avg(col).alias(alias))


def mode_expr_counts(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Shared helper: per-(group, value) counts with nulls dropped."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


def agg_mode(
    df: DataFrame, keys: Sequence[str], value_col: str, alias: str
) -> DataFrame:
    """A3 — deterministic modal value per group.

    pandas ``x.mode()[0]`` (ref :190-193) returns the *lexicographically
    smallest* value among ties because ``Series.mode`` sorts. Spark's
    ``F.mode`` breaks ties nondeterministically, so this is a
    count → row_number window with an explicit total order:
    count DESC, value ASC. Groups whose values are all null produce no
    row (callers left-join the result, yielding NULL — matching pandas
    ``mode()[0]`` → IndexError guarded to None in the ref).

    The window partitions by the full group key after a count
    pre-aggregation, so its input is one row per distinct value — tiny
    even at 100 TB fact scale.
    """
    counts = mode_expr_counts(df, keys, value_col)
    w = Window.partitionBy(*keys).orderBy(F.desc("__cnt"), F.asc(value_col))
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*keys, F.col(value_col).alias(alias))
    )


def agg_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    alias: str,
    approximate: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """A4 — distinct count per group (ref :200-203, ``nunique``).

    ``approximate=True`` switches to HyperLogLog++
    (``approx_count_distinct``) — the scale path for streaming and for
    very-high-cardinality keys where exact distinct's expand+shuffle is
    the bottleneck.
    """
    agg = (
        F.approx_count_distinct(col, rsd) if approximate else F.countDistinct(col)
    )
    return df.groupBy(*keys).agg(agg.alias(alias))


def topk_by_freq_ranked(
    df: DataFrame, keys: Sequence[str], value_col: str, k: int
) -> DataFrame:
    """A5 (exploded form) — top-k values by occurrence per group, with
    an explicit ``rank`` column (1-based).

    pandas ``value_counts().index[:k]`` (ref :204) drops NaN and breaks
    count-ties in engine-internal insertion order; the engine *defines*
    the tie-break as count DESC, value ASC (documented divergence,
    SURVEY.md §2.4 A5). The exploded form is the oracle-checkable
    surface; ``agg_topk_by_freq`` folds it to an array.
    """
    counts = mode_expr_counts(df, keys, value_col)
    w = Window.partitionBy(*keys).orderBy(F.desc("__cnt"), F.asc(value_col))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*keys, "rank", F.col(value_col).alias(value_col))
    )


def agg_topk_by_freq(
    df: DataFrame, keys: Sequence[str], value_col: str, k: int, alias: str
) -> DataFrame:
    """A5 — top-k list per group as ``array<string>`` ordered by
    (count DESC, value ASC). ``sort_array`` over (rank, value) structs
    keeps the order deterministic regardless of shuffle order; the list
    is bounded (≤ k) so ``collect_list`` is safe at any scale."""
    ranked = topk_by_freq_ranked(df, keys, value_col, k)
    return (
        ranked.groupBy(*keys)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("rank", value_col))),
                lambda s: s[value_col],
            ).alias(alias)
        )
    )


def agg_with_mode_fused(
    df: DataFrame,
    keys: Sequence[str],
    mode_col: str,
    partials: list,
    finals: list,
    mode_alias: str,
) -> DataFrame:
    """Single-shuffle fusion of ordinary aggregates + deterministic mode.

    The naive plan (one groupBy for the aggregates, a second groupBy +
    window + join for the mode — what pandas-shaped code produces)
    scans and shuffles the fact table twice. This fuses them:

    1. one wide shuffle: groupBy(keys + mode_col) computing *partial*
       aggregates (counts/sums decompose over sub-groups);
    2. one tiny shuffle: groupBy(keys) re-combining the partials and
       extracting the mode as ``min(struct(-cnt, value))`` — struct
       ordering is lexicographic, so the minimum is (highest count,
       lexicographically-smallest value): exactly pandas ``mode()[0]``
       tie-break, with no window and no self-join.

    ``partials`` are column expressions evaluated in step 1,
    ``finals`` re-combine them in step 2 (both lists of pre-aliased
    Columns). At 100 TB the step-1 output is |keys × mode values| —
    the only full-data shuffle is step 1, with map-side partial agg.
    """
    level1 = df.groupBy(*keys, mode_col).agg(
        F.count(F.lit(1)).alias("__grp_cnt"), *partials
    )
    mode_struct = F.when(
        F.col(mode_col).isNotNull(),
        F.struct(
            (-F.col("__grp_cnt")).alias("nc"), F.col(mode_col).alias("v")
        ),
    )
    return level1.groupBy(*keys).agg(
        F.min(mode_struct).getField("v").alias(mode_alias), *finals
    )


def agg_diversity_ratio(
    df: DataFrame, keys: Sequence[str], col: str, alias: str
) -> DataFrame:
    """A6 — distinct non-null ``col`` ÷ **total** rows (denominator
    includes rows where ``col`` is null — pandas ``len(x)``; ref :205)."""
    return df.groupBy(*keys).agg(
        (
            F.countDistinct(col).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias(alias)
    )
