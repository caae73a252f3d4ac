"""Z-order (Morton-curve) data layout — multi-dimensional data
skipping for the lake (the Delta/Iceberg ``OPTIMIZE ZORDER BY`` play,
built from plain DataFrame ops).

A date-partitioned table prunes on date only; a second predicate
(customer, price band, geo cell) still scans every file of the
matching dates. Sorting files along a Morton curve interleaves the
bits of several columns, so each FILE covers a small hyper-rectangle
of the combined key space and its parquet footer min/max stats become
selective for EVERY interleaved column at once — a box query touches
only the files whose rectangle intersects the box.

Everything is per-row codegen (shift/and/or over mapped integers) +
one ``repartitionByRange`` on the z-value: one shuffle to lay out any
amount of data, no UDFs, and the z-value expression itself is
bit-reproducible in SQL (the oracle runs the identical shifts).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_expr(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a value into the integer grid [0, 2^bits): linear over the
    observed [lo, hi] span — floor((v−lo)/(hi−lo)·(2^bits−1)). A
    constant column degenerates to grid cell 0 (hi == lo guard)."""
    top = float(2**bits - 1)
    span = hi.cast("double") - lo.cast("double")
    scaled = F.when(span == 0.0, F.lit(0)).otherwise(
        F.floor((col.cast("double") - lo.cast("double")) / span * F.lit(top))
    )
    return scaled.cast("bigint")


def _interleave(grids: Sequence[Column], bits: int) -> Column:
    """Morton interleave: bit b of dimension d lands at position
    b·ndims + d. Pure shift/and/or tree — whole-stage codegen."""
    terms = []
    nd = len(grids)
    for b in range(bits):
        for d, g in enumerate(grids):
            terms.append(
                F.shiftleft(
                    F.shiftright(g, b).bitwiseAND(F.lit(1)), b * nd + d
                )
            )
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def zorder_values(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> DataFrame:
    """Append ``zval`` (bigint Morton code over ``cols``). The
    per-column spans come from a 1-row min/max aggregate broadcast
    back over the frame — fully declarative, no driver collect, and
    the whole expression (span mapping + shifts) has an
    operation-for-operation SQL twin, so the z-values themselves are
    oracle-checkable."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c)).alias(f"__lo_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"__hi_{c}"))
    spans = df.agg(*aggs)
    joined = df.crossJoin(F.broadcast(spans))
    grids = [
        _scale_expr(
            F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
        )
        for c in cols
    ]
    drop = [f"__lo_{c}" for c in cols] + [f"__hi_{c}" for c in cols]
    return joined.withColumn("zval", _interleave(grids, bits)).drop(*drop)


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int,
    bits: int = 8,
) -> DataFrame:
    """The write-side layout: range-partition on the z-value into
    ``num_files`` ordered splits and sort within each — one shuffle,
    then ``.write.parquet(...)`` emits one z-contiguous file per
    partition whose footer min/max on EVERY ``cols`` member is a tight
    hyper-rectangle. Readers prune with ordinary predicate pushdown;
    no table-format dependency."""
    z = zorder_values(df, cols, bits)
    return z.repartitionByRange(num_files, "zval").sortWithinPartitions("zval")
