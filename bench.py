"""Benchmark harness — the driver's per-round feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a noop-format write (full execution of every
column, nothing collected to the driver) after a warm-up of the
session JVM.

Methodology (hardened round 6 — VERDICT r5 item 2): this box's
run-to-run variance (±7–25% observed across driver and judge runs
with byte-identical plans) had grown larger than any plan-level
effect, so a single warm pass stopped carrying information. Now each
query pays one untimed-for-the-headline cold pass (Catalyst planning
+ whole-stage-codegen JIT, still reported under ``cold_queries``)
followed by ``BENCH_RUNS`` (default 3) steady-state passes; the
headline per-query number is the MEDIAN of the steady-state passes
and the per-query MIN is reported alongside (the min is the best
load-free estimate, the median is robust to a single noisy pass).
The emitted JSON carries a hypervisor ``steal_pct`` over the timed
section (the stamp that separates noisy-neighbor episodes from real
regressions on this VM) and a 1-minute ``loadavg`` stamp taken before
and after the timed section so any reader can discount a
load-polluted snapshot instead of mistaking it for a regression.
"""

from __future__ import annotations

import json
import os
import statistics
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


def _load1() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - getloadavg always exists on linux
        return -1.0


def _cpu_ticks() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat — on a VM, steal is
    the one stamp that tells a noisy-neighbor episode apart from a
    real regression (a 63.6% idle-pair spread was measured on this
    box with byte-identical plans and NORMAL per-query times on the
    untouched queries; loadavg cannot see the hypervisor taking the
    cores away)."""
    try:
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        # sum only user..steal (fields 0-7): guest/guest_nice (8-9)
        # are already counted inside user/nice per proc(5) — summing
        # them double-counts guest time and underestimates steal_pct
        return (vals[7] if len(vals) > 7 else 0), sum(vals[:8])
    except (OSError, ValueError, IndexError):  # pragma: no cover
        return 0, 0


def _wait_for_quiet() -> tuple[float, float, bool]:
    """Ambient-load gate (VERDICT r7 item 6): r07's bench ran at
    loadavg 3.37 and sub-second medians wobbled ±20% while the mins
    stayed flat — every such artifact then needs manual attribution.
    Poll the 1-minute loadavg BEFORE the session starts (so our own
    JVM doesn't count) and hold up to ``BENCH_QUIET_WAIT_S`` (default
    180 s) for it to drop under ``BENCH_QUIET_LOAD`` (default 1.0).
    Returns (ambient_load_at_start, seconds_waited, still_loaded) —
    ``still_loaded`` self-flags the JSON when the box never went
    quiet, so a noisy snapshot reads as noisy instead of as a
    regression."""
    threshold = float(os.environ.get("BENCH_QUIET_LOAD", "1.0"))
    budget = float(os.environ.get("BENCH_QUIET_WAIT_S", "180"))
    start = time.time()
    ambient = _load1()
    load = ambient
    while load >= threshold and time.time() - start < budget:
        time.sleep(5.0)
        load = _load1()
    return ambient, round(time.time() - start, 1), load >= threshold


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    n_runs = max(1, int(os.environ.get("BENCH_RUNS", "3")))
    ambient_load, quiet_wait_s, load_warn = _wait_for_quiet()
    spark = get_spark("bench")

    # JVM/codegen warm-up (not timed): a trivial scan, then every
    # headline query once at the smallest sf. r1-r9 warmed only one
    # representative join+agg plan, which left each query's first
    # sf-dir pass paying its own Catalyst + whole-stage-codegen JIT —
    # that cost is session fixed overhead, not per-dataset work (the
    # generated stage classes are plan-shaped, so the sf0.001 pass
    # compiles the same classes the timed passes reuse). The timed
    # methodology is UNTOUCHED: same query list, same noop sink, same
    # cold-then-n_runs loop per query at sf_dir, same JSON fields —
    # cold_queries still reports each query's first sf_dir pass, it
    # just no longer conflates dataset cost with one-time JIT
    # (VERDICT r9 item 7; the r9-and-earlier cold numbers carry that
    # conflation, recorded in OPTIMIZATION_r10.md).
    force(spark.read.parquet(f"{sf_dir}/region.parquet"))
    for name in HEADLINE:
        warm_fn, _ = REGISTRY[name]
        force(warm_fn(spark, "/root/testdata/sf0.001"))
        spark.catalog.clearCache()

    load_before = _load1()
    steal0, total0 = _cpu_ticks()
    # Pass 1 pays Catalyst planning + whole-stage-codegen compilation
    # (JVM JIT) and is reported as the cold time; the following
    # n_runs passes are the steady-state cost a recurring pipeline
    # actually pays — median is the headline, min travels alongside.
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = REGISTRY[name]
        runs = []
        for _ in range(1 + n_runs):
            t0 = time.time()
            force(fn(spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        cold[name] = runs[0]
        warm = runs[1:]
        timings[name] = round(statistics.median(warm), 3)
        mins[name] = min(warm)
        # drop caches a query may have materialized so later queries
        # aren't measured under accumulated memory pressure
        spark.catalog.clearCache()
    load_after = _load1()
    steal1, total1 = _cpu_ticks()
    dt = total1 - total0
    steal_pct = round(100.0 * (steal1 - steal0) / dt, 2) if dt > 0 else -1.0

    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": mins,
        "min_total": round(sum(mins.values()), 3),
        "cold_queries": cold,
        "cold_total": round(sum(cold.values()), 3),
        "runs_per_query": n_runs,
        "loadavg_before": load_before,
        "loadavg_after": load_after,
        "ambient_load_at_start": ambient_load,
        "quiet_wait_s": quiet_wait_s,
        "load_warn": load_warn,
        "steal_pct": steal_pct,
        # VERDICT r8 item 4: loadavg cannot see hypervisor steal (the
        # r8 +13% "regression" ran at steal 0.61% vs the r6/r7 0.03%),
        # and steal cannot be WAITED out pre-run (an idle guest accrues
        # none) — so self-FLAG the snapshot instead: any reader of a
        # steal_warn run should discount medians before calling a
        # regression. Threshold 0.25%: r9 measured runs at 0.07-0.18%
        # agree within normal variance (11.27-11.64s on identical
        # code) while 0.6%+ episodes inflated the same code to
        # 11.8-15.3s. Additive key; every pre-existing field unchanged.
        "steal_warn": steal_pct > 0.25,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
