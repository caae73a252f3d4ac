"""Scale-curve probe for the flagship genre_kpis query.

Materializes a multiplied lineitem fact (orders/customer dims
unchanged — the realistic shape: facts grow, dims don't) and times
the UNMODIFIED registry flagship end-to-end, scan included, at 1×,
10×, and 100× sf0.1 (≈60M fact rows). The point is the CURVE, not
the absolute numbers: a plan that is overhead-bound at 600k rows and
near-linear beyond it is the plan that survives a cluster scale-up.

Usage: python scripts/scale_probe.py [sf_dir] — one JSON line to
stdout; scratch data under .scratch/scale_probe (safe to delete).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from music_streaming_etl_spark.plans.testdata_queries import (  # noqa: E402
    SCRATCH,
    _t,
    q_genre_kpis,
)
from music_streaming_etl_spark.session import get_spark  # noqa: E402


def materialize(spark, sf_dir: str, mult: int) -> str:
    out = os.path.join(SCRATCH, "scale_probe", f"x{mult}")
    if not os.path.exists(os.path.join(out, "_done")):
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out)
        li = _t(spark, sf_dir, "lineitem")
        big = li.crossJoin(spark.range(mult).select(F.col("id").alias("_m"))).drop("_m")
        big.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))
        for t in ("orders", "customer"):
            os.symlink(
                os.path.abspath(os.path.join(sf_dir, f"{t}.parquet")),
                os.path.join(out, f"{t}.parquet"),
            )
        open(os.path.join(out, "_done"), "w").close()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("scale-probe")
    out = {"sf_dir": sf_dir, "points": []}
    for mult in (1, 10, 100):
        d = sf_dir if mult == 1 else materialize(spark, sf_dir, mult)
        df = q_genre_kpis(spark, d)
        df.write.format("noop").mode("overwrite").save()  # warm-up run
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.time() - t0, 2)
        n_rows = mult * 600_000
        out["points"].append(
            {"mult": mult, "fact_rows": n_rows, "sec": wall,
             "rows_per_sec": int(n_rows / wall) if wall > 0 else None}
        )
        print(f"  {mult:>4}x  {n_rows:>11,} rows  {wall:>7.2f}s", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
