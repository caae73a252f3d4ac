"""Generate degenerate testdata variants for edge-case selfchecking.

Three variants of the standard table set, written under ``.scratch``:

- ``degenerate/empty``: every table with its exact schema and ZERO
  rows — divisions by zero counts, ``collect()[0]`` on empty frames,
  and seed selections with no candidates all surface here.
- ``degenerate/tiny``: the first ``--rows`` rows (default 3) of each
  table — single-group/single-row statistics (n-1 == 0 variances,
  0/0 tie corrections, one-sided rank sums) surface here.
- ``degenerate/constant``: primary keys stay UNIQUE (taken from the
  first rows) while every other column holds row 0's value — every
  value tied, every group a single class, every variance zero:
  rate-variance priors (v == 0), one-cell agreement tables
  (1 - p_e == 0), one-era KS samples, and all-tied rank paths all
  surface here. Keys are kept unique on purpose: duplicating them
  violates the per-entity grain contracts (a doc_id appearing twice
  is not a tie, it is a corrupted corpus) and the engines would just
  break differently.

Slicing is pyarrow ``Table.slice`` on the source parquet, so the
physical types (including the events.ts timestamp vintage) are
preserved bit-for-bit — whatever adapter logic production needs, the
degenerate battery needs too.

Usage:
    python scripts/make_degenerate_testdata.py [--src /root/testdata/sf0.001] [--rows 3]
    python scripts/selfcheck.py .scratch/degenerate/tiny
    python scripts/selfcheck.py .scratch/degenerate/empty
    python scripts/selfcheck.py .scratch/degenerate/constant
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
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

KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def generate(src: str, out: str, rows: int = 3) -> dict[str, str]:
    """Write all three variants under ``out``; returns variant -> dir."""
    dirs = {}
    for variant, n in (
        ("empty", 0),
        ("tiny", rows),
        ("constant", max(rows, 20)),
    ):
        outdir = os.path.join(out, variant)
        os.makedirs(outdir, exist_ok=True)
        for t in TABLES:
            full = pq.read_table(os.path.join(src, f"{t}.parquet"))
            if variant == "constant":
                m = min(n, full.num_rows)
                tbl = pa.concat_tables([full.slice(0, 1)] * m)
                head = full.slice(0, m)
                for k in KEYS[t]:
                    i = tbl.schema.get_field_index(k)
                    tbl = tbl.set_column(i, tbl.schema.field(i), head.column(k))
            else:
                tbl = full.slice(0, n)
            pq.write_table(tbl, os.path.join(outdir, f"{t}.parquet"))
        dirs[variant] = outdir
    return dirs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=".scratch/degenerate")
    ap.add_argument("--rows", type=int, default=3)
    args = ap.parse_args()
    for variant, outdir in generate(args.src, args.out, args.rows).items():
        print(f"{variant}: -> {outdir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
