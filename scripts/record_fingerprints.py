"""Update FINGERPRINTS.json — run at ROUND START, before any edits.

A green row in CORRECTNESS_r{N}.json certifies the source tree at
round N's final commit; at the start of round N+1 (before edits) the
live tree IS that tree, so the live closure fingerprint of each key
whose latest green round advanced is exactly the fingerprint the
driver certified. This script folds the recorded CORRECTNESS files
(latest-round-wins, same semantics as registry._collect_evidence) and
refreshes the sidecar entry for every key whose green evidence is
newer than what the sidecar recorded.

Usage: python scripts/record_fingerprints.py   (from the repo root)
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from music_streaming_etl_spark.plans.fingerprints import (  # noqa: E402
    key_fingerprint,
)
from music_streaming_etl_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    _collect_evidence,
)

SIDECAR = os.path.join(ROOT, "FINGERPRINTS.json")


def main() -> None:
    latest_green = _collect_evidence(ROOT)
    max_round = max(latest_green.values(), default=0)
    recorded: dict[str, dict] = {}
    if os.path.exists(SIDECAR):
        with open(SIDECAR) as f:
            recorded = json.load(f)
    updated, dropped = 0, 0
    for key, rnd in sorted(latest_green.items()):
        if key not in REGISTRY:
            continue
        # Only a green row from the LATEST recorded round certifies
        # the live tree (the driver ran on that round's final commit,
        # which IS the tree at the next round's start). Stamping an
        # OLDER round's green row with today's fingerprint would
        # mis-certify any key whose source changed after that row
        # (review r8: the original bootstrap claimed winnow's gen-4
        # rewrite was certified by its gen-3 green row). Older-round
        # keys simply keep no entry — the rotation treats them as
        # unchanged age-tier members, exactly the pre-sidecar
        # behavior, until a fresh green row re-certifies them.
        if rnd != max_round:
            continue
        prev = recorded.get(key)
        if prev is not None and prev.get("round", -1) >= rnd:
            continue  # sidecar already reflects this green row
        fn, oracle = REGISTRY[key]
        recorded[key] = {"fp": key_fingerprint(fn, oracle), "round": rnd}
        updated += 1
    # a key that regressed (dropped from latest_green) loses its entry:
    # it rotates to the front via the never-checked tier anyway, and a
    # stale certified fp must not resurrect it as "unchanged".
    for key in list(recorded):
        if key not in latest_green:
            del recorded[key]
            dropped += 1
    with open(SIDECAR, "w") as f:
        json.dump(recorded, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"FINGERPRINTS.json: {len(recorded)} keys "
        f"({updated} refreshed, {dropped} dropped)"
    )


if __name__ == "__main__":
    main()
