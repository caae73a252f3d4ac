"""Distributed exact statistical tests: Mann-Whitney U / AUC via the
value-grain rank-sum decomposition.

The classical formulation ranks the pooled sample — a global sort.
At 100 TB that is the wrong plan: the statistic only depends on the
per-distinct-value counts of each group, so we aggregate to the
value grain first (shuffle shrinks the frame from n rows to
|distinct values| rows), take an exact distributed exclusive prefix
sum of the negative-group counts over the value order
(``global_prefix_sum``: range partition + broadcast offsets, no
single-partition window), and fold the doubled U statistic

    2*U_pos = sum_v c_pos(v) * (2 * cum_neg(<v) + c_neg(v))

in exact integer arithmetic (ties contribute half wins, hence the
doubling).  The tie-corrected normal approximation

    Var(U) = n1*n2/12 * ((n+1) - sum_t (t^3 - t) / (n*(n-1)))

uses exact decimal power sums for the tie term and goes to double
only for the final variance/z/AUC divisions, written in one fixed
operation order so any engine reproduces the same IEEE result.

Reference parity: the reference pipeline has no hypothesis-test
primitive at all (pandas would call ``scipy.stats.mannwhitneyu`` on
collected data); this is the distributed-native equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ranking import global_prefix_sum

__all__ = ["rank_sum_stats"]


def _d(col: Column, p: int = 19) -> Column:
    return col.cast(f"decimal({p},0)")


def rank_sum_stats(
    df: DataFrame, value_col: str, is_pos_col: str
) -> DataFrame:
    """One-row frame with the Mann-Whitney statistics of
    ``value_col`` (an exact integer column) between the rows where
    boolean ``is_pos_col`` is true (group 1) and false (group 2).

    Columns: ``n_pos  n_neg  u_pos  z  auc`` — ``u_pos`` is the U
    statistic of the positive group (half-integer exact: carried
    doubled in BIGINT, divided by 2 only at the end, which is exact
    in binary), ``z`` the tie-corrected normal approximation without
    continuity correction, ``auc`` = U/(n1*n2) — the probability a
    random positive outranks a random negative (ties count half),
    i.e. ROC AUC when ``value_col`` is a score and ``is_pos_col`` a
    label.  ``z``/``auc`` are NULL when either group is empty or the
    variance is zero (all values tied).
    """
    v, pos = F.col(value_col), F.col(is_pos_col)
    grain = df.groupBy(v.alias("_v")).agg(
        F.sum(F.when(pos, 1).otherwise(0)).cast("bigint").alias("_c1"),
        F.sum(F.when(pos, 0).otherwise(1)).cast("bigint").alias("_c2"),
    )
    pref = global_prefix_sum(
        grain, [F.asc("_v")], "_c2", alias="_cum2"
    )
    agg = pref.agg(
        F.sum("_c1").cast("decimal(38,0)").alias("_n1"),
        F.sum("_c2").cast("decimal(38,0)").alias("_n2"),
        F.sum(
            _d(F.col("_c1"))
            * (F.lit(2) * _d(F.col("_cum2")) + F.col("_c2"))
        ).cast("decimal(38,0)").alias("_u2"),
        F.sum(
            _d(F.col("_c1") + F.col("_c2"), 12)
            * _d(F.col("_c1") + F.col("_c2"), 12)
            * _d(F.col("_c1") + F.col("_c2"), 12)
            - (F.col("_c1") + F.col("_c2"))
        ).cast("decimal(38,0)").alias("_ties"),
    )
    # doubles only from here, one fixed operation order
    n1d = F.col("_n1").cast("double")
    n2d = F.col("_n2").cast("double")
    nd = (F.col("_n1") + F.col("_n2")).cast("double")
    u2d = F.col("_u2").cast("double")
    tiesd = F.col("_ties").cast("double")
    # nullif on the tie-correction denominator: with exactly one total
    # row the raw 0/0 is NaN, and nullif(var, 0.0) downstream does NOT
    # catch NaN — z would emit NaN instead of the documented NULL
    # (ADVICE r3). NULL here propagates cleanly through var/sqrt/z.
    var = (n1d * n2d / F.lit(12.0)) * (
        (nd + F.lit(1.0))
        - tiesd / F.nullif(nd * (nd - F.lit(1.0)), F.lit(0.0))
    )
    return agg.select(
        F.col("_n1").cast("bigint").alias("n_pos"),
        F.col("_n2").cast("bigint").alias("n_neg"),
        (u2d / F.lit(2.0)).alias("u_pos"),
        # raw finals (round-7 sweep): fixed-order + - * / sqrt over
        # the exact decimal sums — bit-identical across engines, and
        # ROUND(DOUBLE, 6) is the construct that hash-failed
        # anova_oneway in the r6 driver environment (functions/quantize)
        (
            (u2d - n1d * n2d)
            / (F.lit(2.0) * F.sqrt(F.nullif(var, F.lit(0.0))))
        ).alias("z"),
        (
            u2d / (F.lit(2.0) * F.nullif(n1d * n2d, F.lit(0.0)))
        ).alias("auc"),
    )
