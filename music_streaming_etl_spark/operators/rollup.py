"""Continuous-aggregate rollups: answer coarse-grain queries from a
fine-grain pre-aggregate instead of the fact table.

The reference recomputes every KPI from raw streams each run
(``compute_genre_kpis``/``compute_hourly_kpis`` re-scan the full
``streams`` frame, ref ``dags/music_streaming_etl_dags.py:185-263``).
At 100 TB the only viable shape is the hypertable / materialized-view
one: maintain a daily pre-aggregate (fact-scan once per day of new
data), and answer month/year questions by re-aggregating the daily
rows — input size |days × keys|, not |facts|.

Re-aggregation needs measures that MERGE:

- SUM/COUNT merge exactly (sum of sums). ``time_rollup`` +
  ``reaggregate`` carry these, keeping the engine's decimal-exact
  accumulation so a rollup-of-rollups equals the direct aggregate
  bit-for-bit.
- COUNT(DISTINCT) does not merge — the 100 TB answer is a mergeable
  sketch. ``hll_rollup``/``hll_reaggregate`` store a DataSketches HLL
  per fine bucket (binary column) and union them upward; the merged
  estimate is IDENTICAL to sketching the raw facts directly (HLL
  union is lossless over sketches of the same lgK), which
  ``tests/test_rollup.py`` asserts.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRAINS = ("hour", "day", "week", "month", "quarter", "year")


def _bucket(ts_col: str, grain: str) -> Column:
    if grain not in _GRAINS:
        raise ValueError(f"grain {grain!r} not in {_GRAINS}")
    return F.date_trunc(grain, F.col(ts_col))


def time_rollup(
    df: DataFrame,
    ts_col: str,
    grain: str,
    keys: Sequence[str],
    measures: dict[str, Column],
) -> DataFrame:
    """Fine-grain pre-aggregate: groupBy(date_trunc(grain), keys) with
    the given measure expressions (use ``dec_sum``-style exact
    accumulators so rollups re-merge deterministically)."""
    return (
        df.withColumn("bucket", _bucket(ts_col, grain))
        .groupBy("bucket", *keys)
        .agg(*[m.alias(a) for a, m in measures.items()])
    )


def reaggregate(
    fine: DataFrame,
    grain: str,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    scale: int = 2,
) -> DataFrame:
    """Coarsen a ``time_rollup`` result: sum-of-sums per coarser
    bucket. Decimal-exact re-accumulation (same ``scale`` discipline
    as ``dec_sum``) keeps rollup-of-rollup == direct-aggregate."""
    coarse = fine.withColumn("bucket", _bucket("bucket", grain))
    aggs = [
        F.sum(F.col(c).cast(f"decimal(28,{scale})")).cast("double").alias(c)
        if dict(fine.dtypes)[c] == "double"
        else F.sum(c).cast("bigint").alias(c)
        for c in sum_cols
    ]
    return coarse.groupBy("bucket", *keys).agg(*aggs)


def hll_rollup(
    df: DataFrame,
    ts_col: str,
    grain: str,
    keys: Sequence[str],
    distinct_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Mergeable distinct-count pre-aggregate: one DataSketches HLL
    sketch (binary) per (bucket, keys). The sketch column is what a
    materialized rollup table persists."""
    return (
        df.withColumn("bucket", _bucket(ts_col, grain))
        .groupBy("bucket", *keys)
        .agg(F.hll_sketch_agg(distinct_col, F.lit(lgk)).alias("sketch"))
    )


def hll_reaggregate(
    sketches: DataFrame, grain: str, keys: Sequence[str]
) -> DataFrame:
    """Union fine-grain sketches to a coarser bucket and estimate.
    Returns ``bucket, keys..., approx_distinct`` (bigint)."""
    coarse = sketches.withColumn("bucket", _bucket("bucket", grain))
    return (
        coarse.groupBy("bucket", *keys)
        .agg(F.hll_union_agg("sketch").alias("sketch"))
        .select(
            "bucket",
            *keys,
            F.hll_sketch_estimate("sketch").cast("bigint").alias("approx_distinct"),
        )
    )


def hist_rollup(
    df: DataFrame,
    ts_col: str,
    grain: str,
    keys: Sequence[str],
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Mergeable QUANTILE pre-aggregate: a fixed-range equi-width
    histogram per (bucket, keys) stored as rows (bucket, keys, bidx,
    cnt). Quantiles don't merge, and ``approx_percentile``'s sketch
    internals aren't engine-portable — histogram COUNTS merge exactly
    (sum of sums), so a rollup-of-rollups equals the direct
    fact-level histogram bit-for-bit and the whole path is
    oracle-checkable in plain SQL, unlike an opaque sketch binary.
    Quantile error is bounded by one bucket width, chosen up front via
    ``n_buckets``.

    Values outside [lo, hi) clamp into the edge buckets: ranks stay
    exact, the ESTIMATE saturates at the range edge (documented
    contract — pick lo/hi from domain knowledge, e.g. price caps).
    Every expression (floor((v−lo)/(hi−lo)·n), clamp) is plain IEEE
    double arithmetic reproduced operation-for-operation by the SQL
    oracle, so cross-engine results are bit-identical."""
    span = float(hi) - float(lo)
    idx = F.floor(
        (F.col(value_col).cast("double") - F.lit(float(lo)))
        / F.lit(span)
        * F.lit(n_buckets)
    )
    bidx = F.least(
        F.greatest(idx, F.lit(0)), F.lit(n_buckets - 1)
    ).cast("bigint")
    return (
        df.withColumn("bucket", _bucket(ts_col, grain))
        .withColumn("bidx", bidx)
        .groupBy("bucket", *keys, "bidx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_reaggregate(
    hist: DataFrame, grain: str, keys: Sequence[str]
) -> DataFrame:
    """Coarsen a ``hist_rollup``: sum the per-bucket counts under the
    coarser time bucket. Counts are integers — the merge is exact,
    which is the whole point of the histogram-as-rows representation."""
    coarse = hist.withColumn("bucket", _bucket("bucket", grain))
    return (
        coarse.groupBy("bucket", *keys, "bidx")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    keys: Sequence[str],
    qs: Sequence[float],
    lo: float,
    hi: float,
    n_buckets: int,
) -> DataFrame:
    """Quantile estimates from a histogram: per (bucket, keys, q) the
    upper edge of the first bucket whose cumulative count reaches
    ``ceil(q·total)`` — a conservative estimate within one bucket
    width of the exact nearest-rank percentile.

    The cumulative window partitions on (bucket, keys) and holds at
    most ``n_buckets`` rows per partition — bounded by construction,
    never a global sort. Returns ``bucket, keys..., q, est``."""
    span = float(hi) - float(lo)
    from pyspark.sql import Window

    w_cum = Window.partitionBy("bucket", *keys).orderBy("bidx")
    w_tot = Window.partitionBy("bucket", *keys)
    cum = hist.select(
        "bucket",
        *keys,
        "bidx",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_tot).alias("tot"),
    )
    exploded = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    )
    sel = (
        exploded.filter(F.col("cum") >= F.ceil(F.col("q") * F.col("tot")))
        .groupBy("bucket", *keys, "q")
        .agg(F.min("bidx").alias("bidx"))
    )
    est = F.lit(float(lo)) + (F.col("bidx") + 1) * F.lit(span) / F.lit(n_buckets)
    return sel.select("bucket", *keys, "q", est.alias("est"))


def cms_rollup(
    df: DataFrame,
    ts_col: str,
    grain: str,
    keys: Sequence[str],
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Mergeable FREQUENCY pre-aggregate — a count-min sketch stored
    as rows (bucket, keys, row_i, col_j, cnt), completing the sketch
    family: HLL (distinct), histogram (quantiles), CMS (per-item
    frequency). ``depth`` independent md5-derived hash rows × ``width``
    columns; counts are integers, so rollup-of-rollups equals the
    direct fact-level sketch bit-for-bit (same property as the
    histogram) and the whole structure is reproducible in SQL — no
    opaque binary, cross-engine checkable.

    Size per (bucket, keys): ≤ depth·width rows regardless of input —
    the 100 TB materialized-view shape for "how many times did item X
    appear in month M" without storing per-item counts."""
    item = F.col(item_col).cast("string")
    rows = df.withColumn("bucket", _bucket(ts_col, grain)).select(
        "bucket",
        *keys,
        item.alias("__item"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row_i"),
    )
    col_j = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row_i").cast("string"), F.lit(":"), F.col("__item"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(width)
    )
    return (
        rows.withColumn("col_j", col_j)
        .groupBy("bucket", *keys, "row_i", "col_j")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_reaggregate(
    cms: DataFrame, grain: str, keys: Sequence[str]
) -> DataFrame:
    """Coarsen a ``cms_rollup``: integer count sums per coarser
    bucket — exact merge, same as the histogram."""
    coarse = cms.withColumn("bucket", _bucket("bucket", grain))
    return (
        coarse.groupBy("bucket", *keys, "row_i", "col_j")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    keys: Sequence[str],
    item_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates: for every (bucket, keys) × probe
    item, ``min`` over the depth rows of the counter each hash lands
    in — the classic one-sided CMS bound (estimate ≥ true count,
    overshoot ≤ ε·N with prob 1−δ). Probe items absent from a sketch
    row still hit a counter (possibly 0 via the left join) — a miss
    estimates 0, never negative.

    ``probes`` is a small frame with ``item_col`` (broadcast); the
    lookup is an equi-join on (row_i, col_j) — no scan of the fact
    table, which is the point of the materialized sketch."""
    item = F.col(item_col).cast("string")
    p = probes.select(item.alias("__probe")).distinct()
    p = p.select(
        "__probe",
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("row_i"),
    )
    col_j = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("row_i").cast("string"), F.lit(":"), F.col("__probe"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(width)
    )
    p = p.withColumn("col_j", col_j)
    hit = cms.join(F.broadcast(p), ["row_i", "col_j"], "inner").groupBy(
        "bucket", *keys, "__probe"
    )
    # a probe hashes into depth counters; min over the ones present —
    # if fewer than depth rows matched, an absent counter means 0
    est = hit.agg(
        F.min("cnt").alias("__min_cnt"), F.count(F.lit(1)).alias("__n_rows")
    )
    return est.select(
        "bucket",
        *keys,
        F.col("__probe").alias(item_col),
        F.when(F.col("__n_rows") < depth, F.lit(0))
        .otherwise(F.col("__min_cnt"))
        .cast("bigint")
        .alias("est_count"),
    )
