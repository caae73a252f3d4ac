"""Single-node baseline comparison for the flagship workload.

The reference's processing engine is pandas (single process, eager);
this script times the SAME genre_kpis computation three ways on the
testdata at a given sf:

  - pandas     (the reference's engine, its natural idiom)
  - duckdb     (a strong single-node SQL engine, the oracle)
  - this repo  (PySpark local[N], steady-state)

Usage: python scripts/bench_baselines.py [sf_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from music_streaming_etl_spark.plans.testdata_queries import (  # noqa: E402
    ORACLE_GENRE_KPIS,
    q_genre_kpis,
)
from music_streaming_etl_spark.session import get_spark  # noqa: E402


def pandas_genre_kpis(sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet")
    merged = li.merge(
        orders[["o_orderkey", "o_custkey", "o_orderpriority"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
        how="left",
    ).merge(
        cust[["c_custkey", "c_mktsegment"]],
        left_on="o_custkey",
        right_on="c_custkey",
        how="left",
    )
    merged["stat_date"] = merged["l_shipdate"].dt.date
    grp = merged.dropna(subset=["o_orderpriority"]).groupby(
        ["o_orderpriority", "stat_date"]
    )
    out = grp.agg(
        listen_count=("l_partkey", "count"),
        avg_track_duration=("l_extendedprice", "mean"),
        most_popular_track=(
            "c_mktsegment",
            lambda x: x.mode()[0] if len(x.mode()) else None,
        ),
    ).reset_index()
    return time.time() - t0, len(out)


def duckdb_genre_kpis(sf_dir: str) -> tuple[float, int]:
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.time()
    n = len(con.execute(ORACLE_GENRE_KPIS).fetchall())
    return time.time() - t0, n


def spark_genre_kpis(sf_dir: str) -> tuple[float, int]:
    spark = get_spark("bench_baselines")
    q_genre_kpis(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    t0 = time.time()
    df = q_genre_kpis(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0, df.count()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    p_t, p_n = pandas_genre_kpis(sf_dir)
    d_t, d_n = duckdb_genre_kpis(sf_dir)
    s_t, s_n = spark_genre_kpis(sf_dir)
    assert p_n == d_n == s_n, (p_n, d_n, s_n)
    print(
        json.dumps(
            {
                "query": "genre_kpis",
                "sf_dir": sf_dir,
                "rows": s_n,
                "pandas_sec": round(p_t, 3),
                "duckdb_sec": round(d_t, 3),
                "spark_sec": round(s_t, 3),
                "speedup_vs_pandas": round(p_t / s_t, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
