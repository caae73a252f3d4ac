"""Stateful streaming CUSUM drift detector: per-key two-sided CUSUM
maintained across micro-batches with ``applyInPandasWithState``.

The batch twin is the reflection-identity form of
``plans/stats_queries.py::q_cusum_alerts`` (C⁺ = S − min(0, run-min S),
C⁻ mirrored) — here the recurrence runs LIVE: per key the state holds
four integers (running sum S, running min/max of S, count), events
replay in (ts, event_id) order within each micro-batch, and each batch
emits the key's current CUSUM levels and alert flag against a fixed
reference ``k`` and threshold ``h``.

Values are quantized to integer cents BEFORE the fold (both here and
in the batch twin), so the state transition is exact integer
arithmetic — any in-order batch decomposition of the stream reproduces
the batch computation bit-for-bit
(``tests/test_streaming_cusum.py``). The reference ``k`` is a
parameter, not a stream aggregate: a streaming monitor cannot see the
global mean, which is exactly how production CUSUM monitors run
(reference = target/SLA level, fixed per deployment).

Scale: state is 4 scalars per ACTIVE key — O(keys), no per-event
growth; each micro-batch shuffles by key exactly once.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("cusum_pos", T.LongType(), False),
        T.StructField("cusum_neg", T.LongType(), False),
        T.StructField("alert", T.BooleanType(), False),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType(), False),
        T.StructField("rmin", T.LongType(), False),
        T.StructField("rmax", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def make_cusum(k_cents: int, h_cents: int):
    """Per-key state function: fold the batch's cent-quantized values
    through the exact-integer CUSUM recurrence in (ts, event_id)
    order."""

    def advance(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        s, rmin, rmax, n = (
            state.get if state.exists else (0, 0, 0, 0)
        )
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for cents in pdf["cents"]:
                s += int(cents) - k_cents
                rmin = min(rmin, s)
                rmax = max(rmax, s)
                n += 1
        state.update((s, rmin, rmax, n))
        cpos = s - min(0, rmin)
        cneg = s - max(0, rmax)
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n": [n],
                "cusum_pos": [cpos],
                "cusum_neg": [cneg],
                "alert": [cpos > h_cents or cneg < -h_cents],
            }
        )

    return advance


def cusum_stream(
    events: DataFrame, k_cents: int, h_cents: int
) -> DataFrame:
    """Wire the stateful operator: quantize to cents, shuffle by key,
    fold the recurrence, emit each touched key's current levels per
    micro-batch. ``events`` needs (event_type, ts, event_id, value)."""
    from pyspark.sql import functions as F

    cents = events.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    return cents.groupBy("event_type").applyInPandasWithState(
        make_cusum(k_cents, h_cents),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_batch(
    events: DataFrame, k_cents: int, h_cents: int
) -> DataFrame:
    """Batch twin: the same per-key exact-integer CUSUM via the
    reflection identity over the (ts, event_id) total order — final
    state per key, for equivalence checks against the stream sink."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cents = events.select(
        "event_type",
        "ts",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        cents.withColumn("s", F.sum(F.col("cents") - k_cents).over(w))
        .withColumn("rmin", F.least(F.lit(0), F.min("s").over(w)))
        .withColumn("rmax", F.greatest(F.lit(0), F.max("s").over(w)))
        .withColumn("rn", F.row_number().over(w))
    )
    per_key = cum.groupBy("event_type").agg(
        F.max("rn").cast("long").alias("n"),
        F.max_by(F.col("s") - F.col("rmin"), "rn").cast("long").alias(
            "cusum_pos"
        ),
        F.max_by(F.col("s") - F.col("rmax"), "rn").cast("long").alias(
            "cusum_neg"
        ),
    )
    from pyspark.sql import functions as F2

    return per_key.withColumn(
        "alert",
        (F2.col("cusum_pos") > h_cents)
        | (F2.col("cusum_neg") < -h_cents),
    )
