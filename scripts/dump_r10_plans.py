"""Dump per-query `.explain("formatted")` output for the round-10
optimization evidence trail.

Usage: python scripts/dump_r10_plans.py <suffix> [query ...]

Writes plans/r10/<query>_<suffix>.txt for each named query (default:
the bench HEADLINE list) at sf0.1 under the same session config the
bench uses, so the plan files match what the bench actually executes.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_streaming_etl_spark.plans.registry import REGISTRY  # noqa: E402
from music_streaming_etl_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r10")


def main() -> None:
    suffix = sys.argv[1]
    from bench import HEADLINE

    names = sys.argv[2:] or HEADLINE
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-r10-plans")
    for name in names:
        fn, _ = REGISTRY[name]
        df = fn(spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
