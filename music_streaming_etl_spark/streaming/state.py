"""Arbitrary stateful streaming via Spark 4's ``transformWithStateInPandas``
(the successor API to ``applyInPandasWithState``): a per-user running
activity aggregate — event count, exact cents total, last-seen time —
maintained in a typed ``ValueState`` and re-emitted each micro-batch.

Why this API (vs the older ``applyInPandasWithState`` the sessionizer
and funnel use): state is declared typed and per-name on a
``StatefulProcessorHandle`` (value/list/map states, timers, TTL), and
the runtime requires the RocksDB state-store provider — the
configuration a 100 TB deployment runs anyway (spillable state,
incremental checkpointing), so the local test exercises the production
state backend, not the in-memory HDFS-backed one.

Exactness: the money column is accumulated in integer cents (the
engine-wide rule — ``value`` is 2-decimal) so the streaming total is
bit-equal to the batch twin's, regardless of micro-batch decomposition.

Scale: state is O(1) per user (three scalars); RocksDB keeps it
off-heap and spills; shuffle is one exchange on the grouping key per
micro-batch — identical to the batch groupBy it mirrors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_OUT_SCHEMA = "user_id long, n_events long, v_cents long, last_us long"


def make_user_activity_processor() -> StatefulProcessor:
    """Running (n_events, Σ cents, max event-time µs) per user.

    The class is defined INSIDE this factory on purpose: Spark ships
    the processor to a separate driver-side Python worker via
    cloudpickle, which serializes module-level classes by REFERENCE
    (import path) — a worker process without this package on its
    ``sys.path`` then dies with ModuleNotFoundError. A
    function-local class is pickled by value and runs anywhere.
    """

    class UserActivityProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n_events long, v_cents long, last_us long"
            )

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            if self._agg.exists():
                n, cents, last_us = self._agg.get()
            else:
                n, cents, last_us = 0, 0, None
            for pdf in rows:
                if not len(pdf):
                    continue
                n += int(len(pdf))
                cents += int(pdf["v_cents"].sum())
                batch_max = int(pdf["t_us"].max())
                last_us = (
                    batch_max if last_us is None else max(last_us, batch_max)
                )
            self._agg.update((n, cents, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "v_cents": [cents],
                    "last_us": [last_us],
                }
            )

        def close(self) -> None:
            pass

    return UserActivityProcessor()


def user_activity_stream(events: DataFrame) -> DataFrame:
    """``events`` (streaming; event_id, user_id, ts, value) → one
    updated row per active user per micro-batch. Requires the session
    conf ``spark.sql.streaming.stateStore.providerClass`` =
    ``ROCKSDB_PROVIDER`` (transformWithState's state backend).
    """
    prepped = events.select(
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v_cents"),
        F.unix_micros("ts").alias("t_us"),
    )
    return (
        prepped.groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_user_activity_processor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
        .select(
            "user_id",
            "n_events",
            "v_cents",
            F.timestamp_micros(F.col("last_us")).alias("last_ts"),
        )
    )


def user_activity_batch(events: DataFrame) -> DataFrame:
    """Batch twin: the same aggregate over the full event set."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
        ).alias("v_cents"),
        F.max("ts").alias("last_ts"),
    )
