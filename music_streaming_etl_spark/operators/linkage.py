"""Fellegi-Sunter probabilistic record linkage — the decision-theory
layer on top of blocked candidate generation (``dedup.fuzzy_pairs``
gives the candidates; this scores them).

For each compared field i with match probability m_i (chance the
field agrees on a TRUE match) and unmatch probability u_i (chance it
agrees on a random non-match), an agreeing field contributes
log2(m_i/u_i) and a disagreeing one log2((1-m_i)/(1-u_i)) to the pair
score; the summed score classifies pairs against (lower, upper)
thresholds into non-match / possible / match — the Fellegi-Sunter
(JASA 1969) linkage rule every MDM/identity-resolution system
implements.

Determinism / oracle story: the log-weights are computed ONCE in
Python and injected as double LITERALS into the plan (and the same
literals go into the DuckDB oracle), so no libm call ever runs per
row; the score is a fixed-arity left-to-right sum of literals chosen
by boolean agreements — bit-identical in any engine or partitioning.

Scale shape: scoring is a pure per-row projection over the candidate
pairs — zero shuffles beyond what candidate generation already did.
The m/u parameters are priors here; production systems fit them with
EM over the agreement-pattern counts, which is one groupBy over the
same agreement columns (the ``agreement_pattern_counts`` helper) —
the E step's pattern table is tiny (2^|fields| rows), so the loop is
driver-cheap.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FieldSpec:
    """One compared field: an agreement predicate over the pair frame
    plus its (m, u) probabilities."""

    def __init__(self, name: str, agree: Column, m: float, u: float):
        if not (0 < u < m < 1):
            raise ValueError(f"need 0 < u < m < 1 for {name}, got m={m} u={u}")
        self.name = name
        self.agree = agree
        # literal weights, rounded once — the SAME constants go into
        # the oracle SQL, so no engine ever evaluates a log per row
        self.w_agree = round(math.log2(m / u), 6)
        self.w_disagree = round(math.log2((1 - m) / (1 - u)), 6)


def fs_score(fields: Sequence[FieldSpec]) -> Column:
    """The summed Fellegi-Sunter log-likelihood-ratio score as one
    column expression. The 6-decimal literal weights are summed as
    DECIMALs (exact, order-free — DuckDB parses the same literals as
    DECIMAL natively, so both engines add identical exact values) and
    cast to double once at the end."""
    total = F.lit(0).cast("decimal(12,6)")
    for f in fields:
        total = total + F.when(
            f.agree, F.lit(f.w_agree).cast("decimal(12,6)")
        ).otherwise(F.lit(f.w_disagree).cast("decimal(12,6)"))
    return total.cast("double")


def fs_classify(
    score: Column, lower: float, upper: float
) -> Column:
    """match / possible / non_match against the two FS thresholds."""
    return (
        F.when(score >= upper, F.lit("match"))
        .when(score > lower, F.lit("possible"))
        .otherwise(F.lit("non_match"))
    )


def agreement_pattern_counts(
    pairs: DataFrame, fields: Sequence[FieldSpec]
) -> DataFrame:
    """Counts per agreement pattern (the sufficient statistic the EM
    fit of m/u consumes): one groupBy over |fields| boolean columns →
    ≤ 2^|fields| rows."""
    cols = [f.agree.alias(f"agree_{f.name}") for f in fields]
    return (
        pairs.select(*cols)
        .groupBy(*[f"agree_{f.name}" for f in fields])
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
