"""Stateful streaming SPRT: Wald's sequential probability ratio test
maintained across micro-batches with ``applyInPandasWithState`` — the
production early-stopping A/B monitor: the stream DECIDES the moment
the evidence crosses the boundary, instead of waiting for a batch
re-run.

Same symmetric-Bernoulli collapse as the batch twin
(``plans/stats_queries.py::q_sprt_decision``): testing p₁ vs p₀ with
p₁/p₀ symmetric around ½ makes the log-likelihood ratio a multiple of
the INTEGER d = 2S − n, and the α=β boundaries map to an integer
threshold — state is three integers per key (successes, trials,
decision), transitions are exact, and any in-order batch
decomposition reproduces the batch decision bit-for-bit
(``tests/test_streaming_sprt.py``).

A decision, once reached, LATCHES (the sequential test stops
sampling): later events no longer move the key — the defining
semantic difference from the always-on CUSUM monitor.

Scale: 3 scalars per ACTIVE key; one key-shuffle per micro-batch.
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
        T.StructField("successes", T.LongType(), False),
        T.StructField("decision", T.StringType(), False),
        T.StructField("n_at_decision", T.LongType(), True),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("dec", T.LongType(), False),  # 0 none, +1 h1, -1 h0
        T.StructField("n_dec", T.LongType(), False),
    ]
)


def make_sprt(threshold: int, success_min: float):
    """Per-key state function: fold x = (value ≥ success_min) through
    d = 2S − n in (ts, event_id) order until |d| ≥ threshold, then
    latch."""

    def advance(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        s, n, dec, n_dec = state.get if state.exists else (0, 0, 0, 0)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks and dec == 0:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for v in pdf["value"]:
                n += 1
                s += 1 if v >= success_min else 0
                d = 2 * s - n
                if abs(d) >= threshold:
                    dec = 1 if d > 0 else -1
                    n_dec = n
                    break  # the sequential test stops sampling
        state.update((s, n, dec, n_dec))
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n": [n],
                "successes": [s],
                "decision": [
                    "accept_h1"
                    if dec > 0
                    else "accept_h0"
                    if dec < 0
                    else "undecided"
                ],
                "n_at_decision": [n_dec if dec else None],
            }
        )

    return advance


def sprt_stream(
    events: DataFrame, threshold: int = 15, success_min: float = 50.0
) -> DataFrame:
    """Wire the stateful operator per event_type. ``events`` needs
    (event_type, ts, event_id, value)."""
    src = events.select("event_type", "ts", "event_id", "value")
    return src.groupBy("event_type").applyInPandasWithState(
        make_sprt(threshold, success_min),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sprt_batch(
    events: DataFrame, threshold: int = 15, success_min: float = 50.0
) -> DataFrame:
    """Batch twin: the same latching walk per key via windows — first
    |2S−n| ≥ threshold crossing, with post-decision events frozen out
    of the counts (matching the stream's stop-sampling semantics)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    src = events.select(
        "event_type",
        "ts",
        "event_id",
        F.when(F.col("value") >= success_min, 1).otherwise(0).alias("x"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    walked = (
        src.withColumn("n", F.row_number().over(w))
        .withColumn("s", F.sum("x").over(w))
        .withColumn("d", 2 * F.col("s") - F.col("n"))
    )
    crossed = walked.where(F.abs(F.col("d")) >= threshold).groupBy(
        "event_type"
    ).agg(
        F.min("n").cast("long").alias("n_dec"),
        F.min_by(F.col("d"), F.col("n")).alias("d_dec"),
    )
    per_key = walked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_total"),
    )
    j = per_key.join(crossed, "event_type", "left")
    # counts freeze at the decision point when one was reached
    frozen = j.join(
        walked.select(
            "event_type", F.col("n").alias("n_dec"), F.col("s").alias("s_dec")
        ),
        ["event_type", "n_dec"],
        "left",
    )
    last = walked.groupBy("event_type").agg(
        F.max_by(F.col("s"), F.col("n")).cast("long").alias("s_total")
    )
    out = frozen.join(last, "event_type").select(
        "event_type",
        F.coalesce(F.col("n_dec"), F.col("n_total")).cast("long").alias("n"),
        F.coalesce(F.col("s_dec"), F.col("s_total"))
        .cast("long")
        .alias("successes"),
        F.when(F.col("d_dec") >= threshold, "accept_h1")
        .when(F.col("d_dec") <= -threshold, "accept_h0")
        .otherwise("undecided")
        .alias("decision"),
        F.col("n_dec").cast("long").alias("n_at_decision"),
    )
    return out
