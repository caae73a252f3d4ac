"""Generate degenerate testdata variants for edge-case selfchecking.

Two variants of the standard table set, written under ``.scratch``:

- ``degenerate/empty``: every table with its exact schema and ZERO
  rows — divisions by zero counts, ``collect()[0]`` on empty frames,
  and seed selections with no candidates all surface here.
- ``degenerate/tiny``: the first ``--rows`` rows (default 3) of each
  table — single-group/single-row statistics (n-1 == 0 variances,
  0/0 tie corrections, one-sided rank sums) surface here.

Slicing is pyarrow ``Table.slice`` on the source parquet, so the
physical types (including the events.ts timestamp vintage) are
preserved bit-for-bit — whatever adapter logic production needs, the
degenerate battery needs too.

Usage:
    python scripts/make_degenerate_testdata.py [--src /root/testdata/sf0.001] [--rows 3]
    python scripts/selfcheck.py .scratch/degenerate/tiny
    python scripts/selfcheck.py .scratch/degenerate/empty
"""

from __future__ import annotations

import argparse
import os

import pyarrow.parquet as pq

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=".scratch/degenerate")
    ap.add_argument("--rows", type=int, default=3)
    args = ap.parse_args()

    for variant, n in (("empty", 0), ("tiny", args.rows)):
        outdir = os.path.join(args.out, variant)
        os.makedirs(outdir, exist_ok=True)
        for t in TABLES:
            src = os.path.join(args.src, f"{t}.parquet")
            tbl = pq.read_table(src).slice(0, n)
            pq.write_table(tbl, os.path.join(outdir, f"{t}.parquet"))
        print(f"{variant}: {n} rows/table -> {outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
