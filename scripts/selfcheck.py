"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given sf and
compares it to its ``oracle_sql()`` twin in DuckDB: row count, sorted
column names, and cell-exact values (after sorting rows by all
columns). Reports per-query PASS/FAIL with a diff sample, plus float
max-abs-diff for near-misses.

Usage: python scripts/selfcheck.py [--hostile] [sf_dir] [query ...]

``--hostile`` rebuilds the session the way a driver might: AQE off,
200 shuffle partitions, non-UTC timezone. Results must STILL
hash-match the oracle — the determinism playbook (decimal sums, total
orders, per-query UTC pin in ``_t``) cannot depend on session conf.
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from music_streaming_etl_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    return v


def frame_for_compare(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-ish columns to naive pandas datetimes
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(norm_cell)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(
        drop=True
    )


def _mat_kind(s: pd.Series) -> str:
    """Canonical materialized-dtype kind of a pandas column.

    The r6–r8 ``anova_oneway`` driver reds were a TYPE-layer artifact
    this script's value-normalizing compare could never see: Spark
    DECIMAL(38,0) arrives in pandas as ``decimal.Decimal`` objects
    while DuckDB's integers arrive as int64/float64 — numerically
    equal, hash-different. This folds each column to the kind a typed
    value-hash would see. Date-like kinds collapse to one class
    (``datetime.date``-objects vs datetime64 is driver-green across
    many keys); ``Decimal`` gets its own kind so any engine asymmetry
    — or any Decimal at all — fails loudly.
    """
    import datetime
    import decimal

    dt = str(s.dtype)
    if dt.startswith("datetime64"):
        return "datetime"
    if dt != "object":
        return dt
    for v in s:
        if v is None or (isinstance(v, float) and math.isnan(v)):
            continue
        if isinstance(v, decimal.Decimal):
            return "decimal-object"
        if isinstance(v, datetime.date):
            return "datetime"
        return type(v).__name__
    return "all-null"


def dtype_parity(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    """Materialized-dtype parity gate (VERDICT r8 item 2): per column,
    the kind Spark's ``toPandas()`` materializes must equal the kind
    DuckDB's ``fetchdf()`` materializes — equal VALUES with different
    carrier types (the anova class) hash differently at the driver."""
    ok = True
    for c in sorted(set(spark_df.columns) & set(oracle_df.columns)):
        sk, okind = _mat_kind(spark_df[c]), _mat_kind(oracle_df[c])
        if "decimal-object" in (sk, okind):
            print(
                f"  [{name}] col {c}: materialized Decimal objects "
                f"(spark={sk} oracle={okind}) — cast to STRING/BIGINT/"
                f"DOUBLE on both engines; typed hashes differ on Decimal"
            )
            ok = False
        elif sk != okind and "all-null" not in (sk, okind):
            print(
                f"  [{name}] col {c}: materialized dtype mismatch "
                f"spark={sk} oracle={okind}"
            )
            ok = False
    return ok


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> bool:
    ok = dtype_parity(name, spark_df, oracle_df)
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        print(f"  [{name}] COLUMN MISMATCH spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}")
        return False
    if len(spark_df) != len(oracle_df):
        print(f"  [{name}] ROWCOUNT MISMATCH spark={len(spark_df)} oracle={len(oracle_df)}")
        ok = False
    s = frame_for_compare(spark_df)
    o = frame_for_compare(oracle_df)
    if len(s) != len(o):
        return False
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(oc):
            a = pd.to_numeric(sc, errors="coerce").astype(float)
            b = pd.to_numeric(oc, errors="coerce").astype(float)
            both_nan = a.isna() & b.isna()
            eq = (a == b) | both_nan
            if not eq.all():
                bad = (~eq).idxmax()
                diff = (a - b).abs().max()
                print(
                    f"  [{name}] col {c}: {int((~eq).sum())} cells differ, "
                    f"max_abs_diff={diff!r}, sample spark={a[bad]!r} oracle={b[bad]!r}"
                )
                ok = False
        else:
            eq = (sc == oc) | (sc.isna() & oc.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                print(
                    f"  [{name}] col {c}: {int((~eq).sum())} cells differ, "
                    f"sample spark={sc[bad]!r} oracle={oc[bad]!r}"
                )
                ok = False
    return ok


def main() -> int:
    args = sys.argv[1:]
    hostile = "--hostile" in args
    if hostile:
        args.remove("--hostile")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    if hostile:
        spark = get_spark(
            "selfcheck-hostile",
            shuffle_partitions=200,
            extra_conf={
                "spark.sql.adaptive.enabled": "false",
                "spark.sql.session.timeZone": "America/New_York",
            },
        )
    else:
        spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
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
            # the battery owns query-scoped cache lifetime (same rule
            # as bench.py): queries cache() shared frames for
            # recompute-safety, and this is where the entries die
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if compare(name, sdf, odf):
            print(f"PASS {name}: {len(sdf)} rows  ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
