"""Skyline (Pareto-frontier / dominance) operator — the classic
multi-criteria OLAP query Spark has no native operator for: return
the points not dominated by any other point (q dominates p iff q ≥ p
on every axis and > on at least one).

``skyline_2d`` computes the EXACT two-dimensional max-max skyline
without any global window or nested-loop join, using the classic
grid-prune decomposition (Börzsönyi et al., "The Skyline Operator",
ICDE 2001, adapted to the shared-nothing setting):

1. bucket points by an x-range grid (monotone in x, so points in a
   higher bucket have strictly larger x than every point in a lower
   bucket — the min/max needed for the grid is one 1-row aggregate);
2. per-bucket LOCAL skyline via a window PARTITIONED BY bucket:
   ordered (x desc, y desc), a point survives iff its y strictly
   exceeds the running max of y over prior rows — prior rows are
   exactly the same-bucket points with x > p.x (or x = p.x, y > p.y),
   so the test is precisely same-bucket dominance over DISTINCT
   points;
3. cross-bucket prune: per bucket, the max y of all HIGHER buckets
   (a |buckets|-row suffix-max, broadcast back); p is dominated by a
   higher-bucket point iff that bound ≥ p.y (strictly-larger x is
   guaranteed by the grid), so survivors of both tests are EXACTLY
   the global skyline — no final global pass needed at all.

Scale shape: one shuffle to bucket-partition the points, one 1-row
and one |buckets|-row broadcast. Window state is bounded per bucket,
buckets are tunable, and no stage ever holds more than a bucket of
points — the same plan runs at 100 TB with n_buckets sized to the
cluster. Duplicate (x, y) points must be collapsed first (they would
break the strict-inequality local test); callers dedupe with
``.distinct()``, which the skyline definition requires anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    points: DataFrame, x_col: str, y_col: str, n_buckets: int = 64
) -> DataFrame:
    """Exact max-max skyline of DISTINCT integer-valued (x, y) points.
    Returns the undominated (x_col, y_col) rows."""
    pts = points.select(x_col, y_col).distinct()
    rng = pts.agg(
        F.min(x_col).alias("__xmin"), F.max(x_col).alias("__xmax")
    )
    b = pts.crossJoin(F.broadcast(rng)).select(
        x_col,
        y_col,
        # integer grid, monotone in x: higher bucket => strictly larger x
        F.expr(
            f"(({x_col} - __xmin) * {n_buckets}) DIV (__xmax - __xmin + 1)"
        ).alias("__bucket"),
    )
    w = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(x_col).desc(), F.col(y_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn("__prev_max_y", F.max(y_col).over(w)).filter(
        F.col("__prev_max_y").isNull() | (F.col(y_col) > F.col("__prev_max_y"))
    )
    # suffix max of per-bucket y over strictly higher buckets
    bmax = b.groupBy("__bucket").agg(F.max(y_col).alias("__by"))
    wb = (
        Window.orderBy(F.col("__bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = bmax.select(
        "__bucket", F.max("__by").over(wb).alias("__higher_max_y")
    )
    return (
        local.join(F.broadcast(bounds), "__bucket")
        .filter(
            F.col("__higher_max_y").isNull()
            | (F.col(y_col) > F.col("__higher_max_y"))
        )
        .select(x_col, y_col)
    )
