"""Staged-surface replica of the driver's correctness gate.

``selfcheck.py`` covers the LIVE registry; this runs the same
cell-exact DuckDB comparison over the STAGED keys
(``plans/staged_r9_queries.REGISTRY_STAGED_R9``) that are banked for
next round's registration — the command the pre-registration battery
and any post-edit re-verification should use instead of ad-hoc
snippets.

Usage: python scripts/staged_check.py [--hostile] [sf_dir] [key ...]

``--hostile`` mirrors selfcheck's hostile session (AQE off, 200
shuffle partitions, non-UTC timezone): staged keys must pass BOTH
confs before registration.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.selfcheck import TABLES, compare  # noqa: E402

from music_streaming_etl_spark.plans.staged_r9_queries import (  # noqa: E402
    REGISTRY_STAGED_R9,
)
from music_streaming_etl_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    hostile = "--hostile" in args
    if hostile:
        args.remove("--hostile")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    unknown = only - set(REGISTRY_STAGED_R9)
    if unknown:
        # a typoed filter must fail loudly, not report "0 pass,
        # 0 fail" with exit 0 (review finding, r8 second session)
        print(f"unknown staged key(s): {sorted(unknown)}")
        return 2
    if hostile:
        spark = get_spark(
            "staged-check-hostile",
            shuffle_partitions=200,
            extra_conf={
                "spark.sql.adaptive.enabled": "false",
                "spark.sql.session.timeZone": "America/New_York",
            },
        )
    else:
        spark = get_spark("staged-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_pass = n_fail = 0
    for name, (fn, osql) in REGISTRY_STAGED_R9.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        finally:
            spark.catalog.clearCache()
        try:
            odf = con.execute(osql).fetchdf()
        except Exception as e:  # noqa: BLE001 — selfcheck's error path
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if compare(name, sdf, odf):
            print(f"PASS {name}  ({time.time() - t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}  ({time.time() - t0:.1f}s)")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
