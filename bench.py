"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop-format write (full execution of every
column, nothing collected to the driver) after a warm-up of the
session JVM.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from music_streaming_etl_spark.plans.registry import REGISTRY
from music_streaming_etl_spark.session import get_spark

HEADLINE = [
    "genre_kpis",
    "hourly_kpis",
    "agg_topk_by_freq",
    "left_join_equi",
    "tpch_q1_pricing",
    "top_revenue_customers",
    "scan_csv_multi",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    "revenue_by_region",
    "sessionize_events",
    "dedup_exact",
    "dedup_minhash",
    "similarity_topk",
    "tpch_q6_forecast",
    "tpch_q10_returns",
    "tpch_q18_large_orders",
    "event_interarrival",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_spark("bench")

    # JVM/codegen warm-up (not timed): a trivial scan plus one
    # representative join+agg plan at the smallest sf, so the first
    # timed query doesn't absorb the JIT cost of the common operators
    force(spark.read.parquet(f"{sf_dir}/region.parquet"))
    warm_fn, _ = REGISTRY["genre_kpis"]
    force(warm_fn(spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()

    # Two iterations per query: iteration 1 pays Catalyst planning +
    # whole-stage-codegen compilation (JVM JIT), iteration 2 is the
    # steady-state cost a recurring pipeline actually pays. Report the
    # min as the headline, keep cold times for transparency.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        runs = []
        for _ in range(2):
            t0 = time.time()
            force(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        cold[name] = runs[0]
        timings[name] = min(runs)
        # drop caches a query may have materialized so later queries
        # aren't measured under accumulated memory pressure
        spark.catalog.clearCache()

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "cold_queries": cold,
        "cold_total": round(sum(cold.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
