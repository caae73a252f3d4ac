"""Stateful streaming funnel: per-user ordered step progression
maintained across micro-batches with ``applyInPandasWithState``.

The batch twin is ``operators/timeseries.py::funnel_counts`` (stacked
conditional-min windows; oracle-checked as ``funnel_conversion``).
This streaming form drives the same earliest-strictly-after chain as a
state machine: per user it keeps the step-reach times t₁..t_N and
advances them as events arrive — a live "which step is each user on"
table, and funnel counts are a trivial batch aggregate over the sink.

Semantics contract (same class of guarantee as the sessionizer):
events are sorted by (ts, event_id) WITHIN each micro-batch before
replay, so any batch decomposition of an in-order-per-user stream
yields exactly the batch funnel. A cross-batch LATE event that would
rewrite an earlier step's time after later steps were already reached
cannot retro-invalidate them (the state holds N scalars, not the
event history) — the standard bounded-state relaxation, documented,
and asserted against the batch twin for in-order decompositions in
``tests/test_streaming_funnel.py``.

Scale: state is N timestamps per ACTIVE user — O(users), no per-event
growth; each micro-batch shuffles by user exactly once.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _schemas(n_steps: int) -> tuple[T.StructType, T.StructType]:
    out = T.StructType(
        [T.StructField("user_id", T.LongType(), False)]
        + [
            T.StructField(f"t{i}", T.TimestampType(), True)
            for i in range(n_steps)
        ]
        + [T.StructField("steps_reached", T.LongType(), False)]
    )
    state = T.StructType(
        [T.StructField(f"e{i}", T.DoubleType(), True) for i in range(n_steps)]
    )
    return out, state


def make_funnel(steps: Sequence[str]):
    """Per-group state function: replay the batch's events in (ts,
    event_id) order through the earliest-strictly-after chain."""
    n = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}

    def advance(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        epochs: list = list(state.get) if state.exists else [None] * n

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"]
            )
            for ts, kind in zip(pdf["ts"], pdf["event_type"]):
                i = step_idx.get(kind)
                if i is None:
                    continue
                epoch = ts.timestamp()
                prev = epochs[i - 1] if i > 0 else None
                if i > 0 and prev is None:
                    continue  # earlier step not reached yet
                if i > 0 and epoch <= prev:
                    continue  # strictly-after rule
                if epochs[i] is None or epoch < epochs[i]:
                    epochs[i] = epoch
                    # a lowered step time can't retro-raise later steps,
                    # but later steps already satisfy ts > new lower prev
        state.update(tuple(epochs))
        reached = 0
        for e in epochs:
            if e is None:
                break
            reached += 1
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                **{
                    f"t{i}": [
                        pd.Timestamp(epochs[i], unit="s") if epochs[i] else pd.NaT
                    ]
                    for i in range(n)
                },
                "steps_reached": [reached],
            }
        )

    return advance


def funnel_stream(events: DataFrame, steps: Sequence[str]) -> DataFrame:
    """Wire the stateful operator: shuffle by user, advance the chain,
    emit each touched user's current step times per micro-batch."""
    out_schema, state_schema = _schemas(len(steps))
    return events.groupBy("user_id").applyInPandasWithState(
        make_funnel(steps),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
