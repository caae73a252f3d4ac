"""Stateful streaming embedding-drift monitor: per-DIMENSION running
means maintained across micro-batches with ``applyInPandasWithState``
— the live sibling of the batch ``embedding_mmd`` drift test.

Vectors are exploded to (dim, value) and keyed BY DIMENSION, so state
is exactly |dims| entries of two integers (micro-unit value sum +
count) no matter how many vectors stream through; each micro-batch
emits every touched dimension's running mean and its gap to a fixed
reference centroid (the deployment baseline — a literal, as a live
monitor cannot see the corpus mean). The foreachBatch sink reduces
the |dims|-row frame to the L2 mean-shift scalar — linear-kernel MMD
against the baseline — and the alert.

Values are FLOOR-quantized to integer micro-units before the fold
(floor of the identical IEEE product is engine- and
batch-decomposition-unambiguous), so any in-order decomposition of
the stream reproduces the batch computation bit-for-bit
(``tests/test_streaming_drift.py``).

Scale: |dims| keys × 2 integers of state; one dim-keyed shuffle per
micro-batch whose size is rows×dims — the same fan-out the batch
MMD pays once.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("dim", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("mean_u", T.LongType(), False),
        T.StructField("gap_u", T.LongType(), False),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def make_dim_drift(baseline_u: Sequence[int]):
    """Per-dim state function: fold micro-unit values; emit the
    running mean and its gap to the baseline (all integer
    micro-units; mean = s DIV n, exact floor division)."""

    def advance(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (dim,) = key
        s, n = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            if len(pdf):
                s += int(pdf["v_u"].sum())
                n += len(pdf)
        state.update((s, n))
        # match Spark's `DIV` (truncate toward zero) — Python's //
        # floors, which diverges on negative sums
        mean_u = (abs(s) // n) * (1 if s >= 0 else -1) if n else 0
        yield pd.DataFrame(
            {
                "dim": [dim],
                "n": [n],
                "mean_u": [mean_u],
                "gap_u": [mean_u - int(baseline_u[dim])],
            }
        )

    return advance


def _explode_micro(vectors: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return vectors.select(
        F.posexplode("embedding").alias("dim", "v")
    ).select(
        F.col("dim").cast("bigint").alias("dim"),
        F.floor(F.col("v").cast("double") * 1000000.0)
        .cast("bigint")
        .alias("v_u"),
    )


def drift_stream(
    vectors: DataFrame, baseline_u: Sequence[int]
) -> DataFrame:
    """Wire the stateful operator: explode to micro-unit (dim, v_u),
    shuffle by dim, fold the integer sums. ``vectors`` needs an
    ``embedding`` array column; ``baseline_u`` is the reference
    centroid in micro-units (len == dims)."""
    return _explode_micro(vectors).groupBy("dim").applyInPandasWithState(
        make_dim_drift(baseline_u),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drift_batch(
    vectors: DataFrame, baseline_u: Sequence[int]
) -> DataFrame:
    """Batch twin: the same integer per-dim reduction in one
    aggregate — for equivalence checks against the stream sink."""
    from pyspark.sql import functions as F

    base = F.array(*[F.lit(int(b)) for b in baseline_u])
    agg = (
        _explode_micro(vectors)
        .groupBy("dim")
        .agg(
            F.sum("v_u").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    return agg.select(
        "dim",
        "n",
        F.expr("s DIV n").cast("bigint").alias("mean_u"),
        (
            F.expr("s DIV n") - F.element_at(base, F.col("dim").cast("int") + 1)
        ).cast("bigint").alias("gap_u"),
    )


def l2_shift(per_dim: DataFrame) -> float:
    """Reduce a per-dim gap frame to the L2 mean-shift in original
    units — the scalar a sink thresholds on."""
    from pyspark.sql import functions as F

    row = per_dim.agg(
        F.sum(F.col("gap_u") * F.col("gap_u")).alias("ss")
    ).collect()[0]
    return (float(row["ss"]) ** 0.5) / 1e6
