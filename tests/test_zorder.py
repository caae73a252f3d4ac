"""Z-order layout: Morton-code correctness and the actual
file-skipping win (parquet footer min/max vs a box query)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.layout import (
    zorder_layout,
    zorder_values,
)


def _interleave_py(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_python_morton(spark):
    """Grid corners map to the classic Morton codes: spans [0,15] map
    identity onto a 4-bit grid, so zval == interleave(x, y)."""
    rows = [(i, x, y) for i, (x, y) in enumerate((a, b) for a in (0, 3, 15) for b in (0, 7, 15))]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    out = {r["id"]: r["zval"] for r in zorder_values(df, ["x", "y"], bits=4).collect()}
    for i, x, y in rows:
        assert out[i] == _interleave_py(x, y, 4), (x, y)


def _files_touched(path: str, cust_rng, price_rng) -> tuple[int, int]:
    """(#files whose [min,max] footer stats intersect the box, #files)."""
    files = sorted(glob.glob(f"{path}/*.parquet"))
    touched = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        cmin = pmin = float("inf")
        cmax = pmax = float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if name == "o_custkey":
                    cmin, cmax = min(cmin, st.min), max(cmax, st.max)
                if name == "o_totalprice":
                    pmin, pmax = min(pmin, st.min), max(pmax, st.max)
        if cmax >= cust_rng[0] and cmin <= cust_rng[1] and pmax >= price_rng[0] and pmin <= price_rng[1]:
            touched += 1
    return touched, len(files)


def test_zorder_layout_skips_files(spark, tmp_path):
    """A box predicate on BOTH z-ordered columns must touch well under
    half the z-ordered files, while the unordered layout touches
    (essentially) all of them — the point of the curve."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 16
    zpath = str(tmp_path / "zorders")
    rpath = str(tmp_path / "randorders")
    zorder_layout(orders, ["o_custkey", "o_totalprice"], n_files).drop(
        "zval"
    ).write.parquet(zpath)
    orders.repartition(n_files).write.parquet(rpath)

    # middle box: central 1/4 of each dimension
    stats = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]
    clo, chi = stats[0], stats[1]
    plo, phi = stats[2], stats[3]
    cust_rng = (clo + (chi - clo) * 3 // 8, clo + (chi - clo) * 5 // 8)
    price_rng = (plo + (phi - plo) * 0.375, plo + (phi - plo) * 0.625)

    z_touched, z_total = _files_touched(zpath, cust_rng, price_rng)
    r_touched, r_total = _files_touched(rpath, cust_rng, price_rng)
    assert z_total == n_files and r_total == n_files
    assert r_touched == n_files  # random layout: every file intersects
    assert z_touched <= n_files // 2, (
        f"z-order touched {z_touched}/{n_files} files — no skipping win"
    )

    # and the layout loses no rows
    back = spark.read.parquet(zpath)
    assert back.count() == orders.count()


def test_optimize_table_compacts_and_zorders(spark, tmp_path):
    """optimize_table must shrink many small files into few, preserve
    every row, and leave a z-ordered layout whose footer stats skip
    files for box predicates."""
    from music_streaming_etl_spark.sources.io import optimize_table

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = str(tmp_path / "messy")
    orders.repartition(40).write.parquet(path)  # 40 tiny files
    n_before = orders.count()

    n_files = optimize_table(
        spark, path, zorder_cols=["o_custkey", "o_totalprice"],
        target_file_bytes=8 * 1024,
    )
    import glob

    assert n_files == len(glob.glob(f"{path}/*.parquet"))
    assert n_files < 40
    back = spark.read.parquet(path)
    assert back.count() == n_before
    assert set(back.columns) == {"o_orderkey", "o_custkey", "o_totalprice"}

    # the rewritten files must skip for a 2-D box (middle quarter)
    stats = back.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).collect()[0]
    cust = (stats[0] + (stats[1] - stats[0]) * 3 // 8,
            stats[0] + (stats[1] - stats[0]) * 5 // 8)
    price = (stats[2] + (stats[3] - stats[2]) * 0.375,
             stats[2] + (stats[3] - stats[2]) * 0.625)
    touched, total = _files_touched(path, cust, price)
    assert touched < total, (touched, total)
