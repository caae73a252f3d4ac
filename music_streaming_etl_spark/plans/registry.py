"""The composed query registry: core reference-surface queries +
extension ops + deeper analytics, one dict for ``__spark_entry__``.

Importing THIS module (never the sub-registries' merge side effects)
keeps the module graph acyclic: each query module only imports
helpers, and composition happens here.
"""

from __future__ import annotations

import os

from .advanced_queries import REGISTRY_ADV
from .analytics_queries import REGISTRY_ANALYTICS
from .decision_queries import REGISTRY_DECISION
from .extension_queries import REGISTRY_EXT
from .staged_queries import REGISTRY_STAGED
from .staged_r8_queries import REGISTRY_STAGED_R8
from .stats_queries import REGISTRY_STATS
from .testdata_queries import REGISTRY as REGISTRY_CORE
from .tpch_queries import REGISTRY_TPCH

REGISTRY: dict = {}
REGISTRY.update(REGISTRY_CORE)
REGISTRY.update(REGISTRY_EXT)
REGISTRY.update(REGISTRY_ANALYTICS)
REGISTRY.update(REGISTRY_TPCH)
REGISTRY.update(REGISTRY_ADV)
REGISTRY.update(REGISTRY_STATS)
REGISTRY.update(REGISTRY_DECISION)
REGISTRY.update(REGISTRY_STAGED)
REGISTRY.update(REGISTRY_STAGED_R8)

# The driver's correctness gate checks the FIRST 50 registry keys, so
# ordering is load-bearing. Round-3 rotation plan (VERDICT r2 item 4):
# after r1+r2 the driver has seen 97 distinct keys; 89 oracle-backed
# keys have only local selfcheck evidence. This round exposes (a) the
# round's riskiest changes — the three oracle-type fixes and any new
# queries — then (b) the never-driver-checked backlog in order, so
# round 3 covers backlog positions 1-47 and round 4 finishes the rest.
# Rows-only (oracle-less) queries can only ever log `no_oracle`, so
# they are forced to the very BACK of the registry, never wasting a
# window slot. Every key stays covered by scripts/selfcheck.py
# (cell-exact, all keys) regardless of position.
_PRIORITY: list[str] = [
    # ROUND-9: anova_oneway moves to POSITION 1 (VERDICT r8 item 1 —
    # "keep it at the front of _PRIORITY"). It is the only oracle-
    # backed key without a green driver row (r6-r8 red, root-caused to
    # materialized-dtype divergence and fixed this round by emitting
    # STRING on both engines); the fix must earn its driver row ahead
    # of every optimization-rewritten key that joins the fresh tier.
    "anova_oneway",
    # ROUND-8 REGISTRATION (VERDICT r7 item 2): the three keys staged
    # in round 7 (`plans/staged_r8_queries.py`, evidence banked there
    # and in tests/test_staged_round8.py) enter at the FRONT — new
    # code is the riskiest and earns driver rows immediately.
    "kruskal_wallis",
    "brown_forsythe",
    "changepoint_mean_shift",
    # ROUND-7 REGISTRATION (VERDICT r6 item 2): the three keys staged
    # in round 6 (`plans/staged_queries.py`, evidence banked there and
    # in tests/test_staged_round7.py) enter at the FRONT — new code is
    # the riskiest and earns driver rows immediately.
    "merge_into_customers",
    "merge_upsert_kpis",
    "similarity_topk_ivf_full_probe",
    # ROUND-5 ROTATION (VERDICT r4 action item 1): round 4 retired
    # backlog positions 1-50 (all green in CORRECTNESS_r04.json), so
    # the front 50 of the old list are dropped and the window is now
    # the remaining 64 never-driver-checked oracle-backed keys in the
    # same age order — round 5 retires positions 1-50 here
    # (check_freshness + backlog 1-49), round 6 finishes the last 15
    # (suggest_constraints ... attribution_position_based, pre-staged
    # at the tail).  The single sanctioned new key
    # this round (VERDICT r4 item 3) is `check_freshness`, placed at
    # position 1 because new code is the riskiest and must earn a
    # driver CORRECTNESS row immediately.  Every other key here
    # already passes the cell-exact DuckDB selfcheck
    # (scripts/selfcheck.py) at sf0.001+sf0.01+--hostile; the
    # rotation converts builder-side evidence into driver rows.
    #
    # NOTE: as of round 5 this static order is only the AGE-ORDER
    # SPINE — `_auto_rotate` below re-derives the actual window from
    # the recorded CORRECTNESS_r*.json files at import time, so
    # future rounds rotate themselves and this list never needs
    # hand-editing again (it still defines relative priority among
    # never-checked keys, and is the exact order on a fresh clone).
    "check_freshness",
    "quality_filter",
    "doc_chunks",
    "repetition_stats",
    "contamination_check",
    "unigram_commonness",
    "embedding_centroids",
    "scan_xml_roundtrip",
    "scan_binary_ingest",
    "domain_mixture",
    "tfidf_top_terms",
    "scan_orc_roundtrip",
    "percent_rank_cume",
    "revenue_deciles",
    "popularity_index",
    "engagement_top_track",
    "grouping_sets",
    "quarantine_split",
    "token_frequencies",
    "median_by_group",
    "monthly_rollup",
    "partitioned_sink_prune",
    "genre_kpis_sql",
    "cube_returnflag_status",
    "tpch_q3_shipping",
    "window_running_total",
    "rollup_priority_status",
    "pivot_status_by_priority",
    "tpch_q2_min_cost_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q13_order_distribution",
    "tpch_q16_supplier_counts",
    "tpch_q20_dominant_supplier",
    "tpch_q19_disjunctive",
    "tpch_q21_waiting_supplier",
    "tpch_q22_idle_customers",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity",
    "tpch_q4_late_orders",
    "tpch_q6_forecast",
    "tpch_q10_returns",
    "tpch_q12_priority_mix",
    "tpch_q14_promo_effect",
    "tpch_q18_large_orders",
    "mcnemar_test",
    "cohens_kappa",
    "eb_shrunk_rates",
    "suggest_constraints",
    # ("anova_oneway" moved to position 1 this round — see top)
    "keyness_llr",
    "ivm_refresh",
    "tpch_q1_piped",
    "survival_rmst",
    "welch_t_test",
    "max_drawdown",
    "rank_biased_overlap",
    "revenue_recognition",
    "item_jaccard",
    "ucb1_allocation",
    "holt_linear_trend",
    "segment_transition_matrix",
    "attribution_position_based",
]
assert all(k in REGISTRY for k in _PRIORITY), "stale _PRIORITY key"
_ROWS_ONLY_LAST = sorted(k for k, (_, o) in REGISTRY.items() if o is None)
REGISTRY = {
    **{k: REGISTRY[k] for k in _PRIORITY},
    **{
        k: v
        for k, v in REGISTRY.items()
        if k not in _PRIORITY and k not in _ROWS_ONLY_LAST
    },
    **{k: REGISTRY[k] for k in _ROWS_ONLY_LAST},
}


def _collect_evidence(root: str) -> dict[str, int]:
    """Fold the recorded CORRECTNESS_r*.json files into
    ``{key: round_of_latest_green_row}`` with LATEST-ROUND-WINS
    per-key semantics (ADVICE r5): files are visited in ascending
    round order and each round's row OVERWRITES the key's status, so

    - a key that failed in r4 and passed in r5 is retired (green), and
    - a key that passed in r4 but REGRESSED in r5 is dropped from the
      map entirely — it rotates back to the window front with the
      never-checked pool instead of staying retired on stale
      evidence. (The round-5 variant only handled the
      failed-then-fixed direction.)

    The value is the round number of the latest GREEN evidence, which
    `_auto_rotate` uses to order already-checked keys
    oldest-evidence-first. A malformed file or non-dict row is
    skipped rather than trusted."""
    import glob
    import json
    import re

    latest_green: dict[str, int] = {}
    files = []
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m:
            files.append((int(m.group(1)), path))
    for rnd, path in sorted(files):
        try:
            with open(path) as f:
                recorded = json.load(f)
        except Exception:  # noqa: BLE001 — unreadable: skip the file
            continue
        if not isinstance(recorded, dict):
            continue
        for key, row in recorded.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and row.get("err") is None
            ):
                latest_green[key] = rnd
            else:
                # recorded failure in THIS (later) round: un-retire
                latest_green.pop(key, None)
    return latest_green


#: keys REWRITTEN this round whose latest green row predates the
#: sidecar's certification scope (FINGERPRINTS.json only certifies
#: keys green in the LATEST driver round — older rows certify trees we
#: can no longer fingerprint), so the change-aware rotation cannot see
#: the rewrite. Listing them here forces them into the fresh tier for
#: one round; clear the set once their new driver rows land.
#: r10 (optimization round 2): the r9 ten are CLEARED — their
#: rewritten forms own r9 driver rows and r10-start sidecar stamps.
#: This round's rewrites (PQ trainer fusion + SQL literals, minhash
#: expr aggregates, pagerank cadence, CC count cadence, fan-out layout
#: detection) are fronted by the SIDECAR fingerprint mismatch itself —
#: the r10-start stamping covered all 19 rewritten green keys (see
#: OPTIMIZATION_r10.md), so they need no hand-listing. The one
#: exception is below: its green row is r4-era, older than the
#: sidecar's certification scope, so the fp comparison cannot see its
#: closure changed (it rides on the rewritten dedup module).
_FORCE_FRESH: frozenset[str] = frozenset(
    {
        "dedup_clusters_twophase",
    }
)


def _load_certified_fingerprints(root: str) -> dict[str, str]:
    """Read the builder-owned sidecar ``FINGERPRINTS.json`` written by
    ``scripts/record_fingerprints.py`` at each round start:
    ``{key: {"fp": closure-md5-at-latest-green-round, "round": N}}``.
    Missing / malformed sidecar → empty map (rotation degrades to the
    age-only behavior, never fails)."""
    import json

    path = os.path.join(root, "FINGERPRINTS.json")
    try:
        with open(path) as f:
            recorded = json.load(f)
        return {
            k: v["fp"]
            for k, v in recorded.items()
            if isinstance(v, dict) and isinstance(v.get("fp"), str)
        }
    except Exception:  # noqa: BLE001 — sidecar is optional evidence
        return {}


def _auto_rotate(
    registry: dict,
    checked: "set | dict | None" = None,
    certified_fps: "dict[str, str] | None" = None,
) -> dict:
    """SELF-ROTATING driver window (round 5, hardened round 6):
    re-order the registry at import time so the driver's 50-key
    window is always spent where evidence is thinnest —

    1. never-driver-checked oracle-backed keys first, in the
       _PRIORITY age order above (a recorded FAILURE whose latest row
       is not green counts as never-checked, so regressions and
       failed-then-fixed keys both rotate back to the front);
    2. then already-green keys ordered OLDEST-EVIDENCE-FIRST
       (VERDICT r5 item 6): once every oracle-backed key has a green
       row, each future window re-verifies the 50 keys whose latest
       green evidence is stalest, so r1-era evidence is refreshed
       before r5-era evidence and silent regressions have a bounded
       evidence half-life;
    3. rows-only keys pinned LAST — they can only ever log
       `no_oracle`, so they must never occupy a window slot an
       oracle-backed key could use.

    Round-8 hardening (VERDICT r7 item 3): the rotation is now
    CHANGE-AWARE. A green key whose live source-closure fingerprint
    (`fingerprints.key_fingerprint`) differs from the fingerprint its
    latest green row certified (sidecar ``FINGERPRINTS.json``, written
    at round start by ``scripts/record_fingerprints.py``) joins the
    never-checked tier: its evidence describes code that no longer
    exists, so it must lead the window ahead of merely-stale keys
    (`winnow_fingerprints` in r7 — operator replaced wholesale, green
    row certified the gen-3 form — is the motivating case). A key with
    no sidecar entry is treated as unchanged (age order), so a missing
    sidecar degrades to the round-7 behavior exactly.

    Why: the external correctness gate checks the FIRST 50 keys only
    and records CORRECTNESS_r{N}.json in the repo root. Rounds 3-5
    each began with a hand-staged rotation, and the round-4 verdict's
    top risk was "if the driver runs before the rotation is staged,
    the whole window is wasted". Reading the recorded files here makes
    the rotation a property of the repo state instead of a per-round
    chore. Static order is the deterministic fallback (fresh clone,
    no files → exactly the hand-staged order above); on a clone with
    the artifacts the order is a pure function of those files, so any
    two checkouts of the same commit agree. ``checked`` accepts a
    bare set (tests / simulations — all members equally stale) or the
    ``{key: latest_green_round}`` map `_collect_evidence` builds."""
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    live_evidence = checked is None
    if checked is None:
        checked = _collect_evidence(root)
        # change-awareness rides on REAL evidence only: a simulated
        # `checked` set (tests) gets fingerprint handling solely when
        # the caller passes `certified_fps` explicitly.
        if certified_fps is None:
            certified_fps = _load_certified_fingerprints(root)
    if not checked:
        return registry
    if certified_fps is None:
        certified_fps = {}
    staleness = (
        checked
        if isinstance(checked, dict)
        else {k: 0 for k in checked}
    )
    # _FORCE_FRESH applies to the LIVE rotation only — simulated
    # `checked` sets (tests) must not be perturbed by the round's
    # hand-listed rewrites.
    changed: set[str] = (
        set(_FORCE_FRESH) & set(staleness) if live_evidence else set()
    )
    if certified_fps:
        try:
            from .fingerprints import key_fingerprint

            for k, fp in certified_fps.items():
                if k in registry and k in staleness:
                    fn, oracle = registry[k]
                    if key_fingerprint(fn, oracle) != fp:
                        changed.add(k)
        except Exception:  # noqa: BLE001 — evidence layer must not
            # break query serving; degrade to age order. Restore the
            # _FORCE_FRESH baseline rather than emptying `changed`: the
            # hand-listed rewrites do not depend on fingerprinting, so
            # a fingerprint-layer failure must not cancel them
            # (ADVICE r8 low).
            changed = (
                set(_FORCE_FRESH) & set(staleness) if live_evidence else set()
            )
    fresh, seen, rows_only = [], [], []
    for k, (_, oracle) in registry.items():
        if oracle is None:
            rows_only.append(k)
        elif k in staleness and k not in changed:
            seen.append(k)
        else:
            fresh.append(k)
    # stable sort: ties (same evidence round) keep registry age order
    seen.sort(key=lambda k: staleness[k])
    return {k: registry[k] for k in fresh + seen + rows_only}


REGISTRY = _auto_rotate(REGISTRY)
