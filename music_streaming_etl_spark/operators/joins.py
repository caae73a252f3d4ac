"""Join operators (SURVEY.md §2.3, J1/J2 + the V6 anti-join).

The reference's only joins are two pandas left merges
(``dags/music_streaming_etl_dags.py:178-179``): streams ⟕ songs on
``track_id``, then ⟕ users on ``user_id``. Both dims are
broadcast-sized (50k users); at 100 TB fact scale the dims still fit
— users/songs grow with the catalog, not the event stream.

Broadcast policy: an explicit ``F.broadcast()`` hint OVERRIDES
``spark.sql.autoBroadcastJoinThreshold`` — Catalyst does NOT fall back
to sort-merge when the hinted side turns out huge; it builds the
broadcast and fails/OOMs. So these helpers are size-aware by default:
they hint a broadcast only when Catalyst's own size estimate for the
dim side is under the session threshold, and otherwise plan a shuffle
join and let AQE demote it to broadcast at runtime if the *actual*
size fits (the safe direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_THRESHOLD = 10 * 1024 * 1024  # Spark's autoBroadcastJoinThreshold default

_SIZE_SUFFIXES = {
    "b": 1,
    "k": 1024,
    "kb": 1024,
    "m": 1024**2,
    "mb": 1024**2,
    "g": 1024**3,
    "gb": 1024**3,
    "t": 1024**4,
    "tb": 1024**4,
}


def _parse_bytes(conf_value: str) -> int:
    """Parse a Spark byte-size conf string ("10485760", "10MB", "-1")."""
    s = conf_value.strip().lower()
    for suffix in sorted(_SIZE_SUFFIXES, key=len, reverse=True):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * _SIZE_SUFFIXES[suffix])
    return int(float(s))


def fits_broadcast(
    dim: DataFrame, threshold: int | None = None, deflate: int = 1
) -> bool:
    """True when Catalyst's optimized-plan size estimate for ``dim`` is
    within ``spark.sql.autoBroadcastJoinThreshold`` (or an explicit
    byte threshold). Conservative: any failure to estimate → False,
    because a wrongly-forced broadcast OOMs while a wrongly-planned
    shuffle join merely costs an exchange (and AQE can still demote it
    to broadcast at runtime).

    ``deflate`` divides the threshold before gating — callers that
    FORCE a broadcast on a derived frame pass the measured worst-case
    estimate-undershoot factor (``operators/dedup.py::_EST_UNDERSHOOT``,
    12×) so a maximally-undershot estimate still cannot admit a frame
    whose true size exceeds the real budget."""
    try:
        if threshold is None:
            conf = dim.sparkSession.conf.get(
                "spark.sql.autoBroadcastJoinThreshold", str(_DEFAULT_THRESHOLD)
            )
            threshold = _parse_bytes(conf)
        threshold //= max(1, deflate)
        if threshold <= 0:  # -1 disables broadcasting
            return False
        raw = dim._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        try:
            # py4j hands sizeInBytes back as a plain Python int on
            # current builds; older bridges returned a BigInt
            # JavaObject that only stringifies via .toString(). The
            # old toString()-only path raised AttributeError on the
            # int form and the blanket except turned EVERY call into
            # False — silently demoting all size-aware broadcasts to
            # shuffle plans (caught by the round-6 staged-merge plan
            # test; pinned by test_fits_broadcast_private_api now).
            size = int(raw)
        except (TypeError, ValueError):
            size = int(raw.toString())
        return 0 < size <= threshold
    except Exception:
        return False


def _maybe_broadcast(dim: DataFrame, broadcast_dim: bool | None) -> DataFrame:
    if broadcast_dim is True:
        return F.broadcast(dim)
    if broadcast_dim is None and fits_broadcast(dim):
        return F.broadcast(dim)
    return dim


def left_join_equi(
    fact: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    broadcast_dim: bool | None = None,
) -> DataFrame:
    """J1/J2 — left equi-join fact ⟕ dim; unmatched fact rows keep
    NULL dim columns (pandas ``merge(how="left")`` semantics).

    ``broadcast_dim``: ``None`` (default) hints a broadcast only when
    the dim's estimated size fits the session broadcast threshold —
    an explicit hint is NOT ignored by Catalyst when the side is huge,
    so forcing one on an unbounded side is an OOM, not a fallback.
    ``True`` forces the hint (caller asserts the dim is bounded);
    ``False`` never hints (AQE may still broadcast at runtime)."""
    return fact.join(_maybe_broadcast(dim, broadcast_dim), on=key, how="left")


def anti_join_orphans(
    fact: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    broadcast_dim: bool | None = None,
) -> DataFrame:
    """V6 — referential-integrity orphan finder: fact rows with no
    match in dim (claimed at ``README.md:33`` but never implemented in
    the reference — the NaN-genre rows are silently dropped instead).
    A left-anti join is the distributed equivalent of ``NOT EXISTS``.
    Size-aware broadcast policy as in :func:`left_join_equi`."""
    return fact.join(_maybe_broadcast(dim, broadcast_dim), on=key, how="left_anti")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Range (interval) join: every point row paired with every
    interval row where ``start <= point < end`` — the shape Spark has
    no native join type for, and the naive inequality-condition join
    plans as BroadcastNestedLoopJoin (a cross product: dead at scale).

    Scale shape: both sides bucket by ``floor(value / bucket_width)``
    — intervals EXPLODE into every bucket they overlap
    (``sequence(floor(s/w), floor((e-1)/w))``), points take one bucket
    — then an ordinary shuffled EQUI-join on the bucket plus the exact
    residual range filter. Shuffle volume is |points| +
    |intervals| × (len/width + 1); pick ``bucket_width`` near the
    typical interval length so the blow-up factor stays ≈ 2. All
    columns numeric (convert dates/timestamps to epoch days/seconds at
    the call site) and everything stays in codegen — no Python.

    Plan-shape guarantee (tested): no BroadcastNestedLoopJoin /
    CartesianProduct."""
    pb = points.withColumn(
        "__bkt", F.floor(F.col(point_col) / F.lit(bucket_width))
    )
    ib = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bucket_width)),
                F.floor((F.col(end_col) - 1) / F.lit(bucket_width)),
            )
        ),
    )
    return (
        pb.join(ib, "__bkt")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bkt")
    )


def semi_join_matched(
    fact: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    broadcast_dim: bool | None = None,
) -> DataFrame:
    """Companion of the orphan finder: fact rows *with* a match
    (``EXISTS``) — used by validation to split good/bad rows in one
    pass without materializing the dim columns.
    Size-aware broadcast policy as in :func:`left_join_equi`."""
    return fact.join(_maybe_broadcast(dim, broadcast_dim), on=key, how="left_semi")


def left_join_null_skipping(
    left: DataFrame, right: DataFrame, key: str
) -> DataFrame:
    """LEFT equi-join that routes null-key left rows AROUND the join:
    a null key can never match, yet a plain left join still hashes
    every null-key row to the single hash(null) partition — all of
    them land on ONE reducer, the classic hidden hot spot in
    sparse-foreign-key facts (events without a user, orders without a
    promo). Here null-key rows skip the exchange entirely (filter +
    union of literal-null right columns — map-side only) and only
    non-null keys shuffle; result is row-identical to
    ``left.join(right, key, "left")``.

    AQE's skew-split can also carve up the null partition at runtime,
    but not shuffling unmatched rows at all is strictly cheaper — the
    rewrite removes bytes from the wire instead of re-balancing them.
    """
    matched = left.filter(F.col(key).isNotNull()).join(right, key, "left")
    nulls = left.filter(F.col(key).isNull())
    for field in right.schema.fields:
        if field.name != key:
            nulls = nulls.withColumn(
                field.name, F.lit(None).cast(field.dataType)
            )
    # align to the join's output column order (key, left..., right...)
    return matched.unionByName(nulls.select(*matched.columns))
