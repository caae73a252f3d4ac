"""Round-8 staged surface (plans/staged_r8_queries.py) — full pre-
registration battery: cell-exact oracle parity, DESCRIBE type-parity,
independent brute-force property twins, and the pin test for the
double→decimal cast ambiguity that shaped the module's design.

These keys are NOT in the live registry (frozen at 273 through round
7); this suite is the evidence that round 8 can register them without
staging unproven code into the driver window.
"""

from __future__ import annotations

import decimal
import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.plans.staged_r8_queries import (
    REGISTRY_STAGED_R8,
    q_brown_forsythe,
    q_changepoint_mean_shift,
    q_kruskal_wallis,
)

from test_oracle_type_parity import TABLES, canon_duck, canon_spark


@pytest.mark.parametrize("name", sorted(REGISTRY_STAGED_R8))
def test_staged_r8_oracle_parity(spark, sf_dir, duck, name):
    """Cell-exact vs DuckDB at sf0.001 — the driver-gate replica."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    from selfcheck import compare

    fn, osql = REGISTRY_STAGED_R8[name]
    sdf = fn(spark, sf_dir).toPandas()
    spark.catalog.clearCache()
    odf = duck.execute(osql).fetchdf()
    assert compare(name, sdf, odf), f"{name} diverged from oracle"


def test_staged_r8_oracle_type_parity(spark, sf_dir, duck):
    """The registry-wide DESCRIBE gate, applied pre-registration so
    round-8 wiring cannot trip test_oracle_type_parity."""
    problems = []
    for name, (fn, oracle) in REGISTRY_STAGED_R8.items():
        spark_types = {
            f.name.lower(): canon_spark(f.dataType.simpleString())
            for f in fn(spark, sf_dir).schema.fields
        }
        desc = duck.execute(f"DESCRIBE {oracle}").fetchall()
        for col, dtype, *_ in desc:
            dt = canon_duck(dtype)
            st = spark_types.get(col.lower())
            if dt == "hugeint" or (dt.startswith("decimal(38,") and dt != st):
                problems.append(
                    f"{name}.{col}: oracle widened to {dtype} (spark={st})"
                )
            elif st is not None and dt != st:
                problems.append(f"{name}.{col}: oracle={dt} spark={st}")
        oracle_cols = {c.lower() for c, *_ in desc}
        if set(spark_types) != oracle_cols:
            problems.append(
                f"{name}: column-set mismatch spark-only="
                f"{sorted(set(spark_types) - oracle_cols)} "
                f"oracle-only={sorted(oracle_cols - set(spark_types))}"
            )
    assert not problems, "\n".join(problems)


# --------------------------------------------------------------------------
# independent brute-force twins (pandas/pure-python, no shared code
# with the distributed plans)
# --------------------------------------------------------------------------


def _orders_cents(duck):
    return duck.execute(
        "SELECT o_orderpriority AS g, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v, "
        "CAST(o_orderdate AS DATE) AS day FROM orders"
    ).fetchdf()


def test_kruskal_wallis_matches_bruteforce(spark, sf_dir, duck):
    """H from pandas' pooled average ranks (textbook formula with tie
    correction) equals the distributed value-grain decomposition."""
    df = _orders_cents(duck)
    ranks = df["v"].rank(method="average")
    n = len(df)
    sum_terms = sum(
        rg * rg / ng
        for rg, ng in zip(
            ranks.groupby(df["g"]).sum(), ranks.groupby(df["g"]).count()
        )
    )
    t = df["v"].value_counts()
    ties = float((t**3 - t).sum())
    h = (12.0 / (n * (n + 1.0))) * sum_terms - 3.0 * (n + 1.0)
    h /= 1.0 - ties / (float(n) ** 3 - n)

    row = q_kruskal_wallis(spark, sf_dir).collect()[0]
    assert row.n_rows == n
    assert row.n_groups == df["g"].nunique()
    # ADVICE r7: the EMITTED rank_terms must be the textbook
    # ΣR_g²/n_g (the /4 un-doubling folded in), not 4× it
    assert row.rank_terms == pytest.approx(sum_terms, rel=1e-9)
    assert row.h_stat == pytest.approx(h, rel=1e-9)


def test_brown_forsythe_matches_bruteforce(spark, sf_dir, duck):
    """F on |v − median_g| (TRUE midpoint median, the
    scipy.stats.levene(center='median') convention — pandas .median()
    interpolates the same way) via plain per-group float sums equals
    the distributed doubled-grid exact-integer pivot plan."""
    df = duck.execute(
        "SELECT l_returnflag AS g, "
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v "
        "FROM lineitem"
    ).fetchdf()
    z_parts = []
    for g, sub in df.groupby("g"):
        m = sub["v"].median()  # midpoint-interpolated true median
        z_parts.append(pd.DataFrame({"g": g, "z": (sub["v"] - m).abs()}))
    z = pd.concat(z_parts)
    k = z["g"].nunique()
    n = len(z)
    sg = sum(
        s * s / c
        for s, c in zip(
            z.groupby("g")["z"].sum().astype(float),
            z.groupby("g")["z"].count(),
        )
    )
    grand = float(z["z"].sum()) ** 2 / n
    ssb = sg - grand
    ssw = float((z["z"].astype(float) ** 2).sum()) - sg
    f_ref = (ssb / (k - 1)) / (ssw / (n - k))

    row = q_brown_forsythe(spark, sf_dir).collect()[0]
    assert row.n_rows == n and row.n_groups == k
    assert row.ss_between == pytest.approx(ssb, rel=1e-9)
    assert row.ss_within == pytest.approx(ssw, rel=1e-9)
    assert row.f_stat == pytest.approx(f_ref, rel=1e-9)


def test_changepoint_matches_bruteforce(spark, sf_dir, duck):
    """Argmax split of the day-grain series via a plain python loop
    (earliest-day tie-break) equals the distributed prefix-sum plan."""
    df = _orders_cents(duck)
    daily = (
        df.groupby("day")["v"]
        .agg(["count", "sum"])
        .sort_index()
        .reset_index()
    )
    nt = int(daily["count"].sum())
    st = int(daily["sum"].sum())
    best = None
    cn = cs = 0
    for _, r in daily.iterrows():
        cn += int(r["count"])
        cs += int(r["sum"])
        if cn >= nt:
            break
        m1, m2 = cs / cn, (st - cs) / (nt - cn)
        stat = (cn * (nt - cn) / nt) * (m1 - m2) ** 2
        if best is None or stat > best[1]:
            best = (r["day"], stat, cn)

    row = q_changepoint_mean_shift(spark, sf_dir).collect()[0]
    assert row.split_date == pd.Timestamp(best[0]).date()
    assert row.n_before == best[2]
    assert row.n_after == nt - best[2]
    assert row.shift_stat == pytest.approx(best[1], rel=1e-9)


def _write_orders(spark, sf_dir, tmp_path, rows, name="crafted"):
    """Minimal orders.parquet (the three columns the staged keys
    read) plus empty siblings for the rest of the table set."""
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    spark.createDataFrame(
        rows,
        "o_orderdate timestamp, o_totalprice double, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    for t in TABLES:
        if t != "orders":
            pq.write_table(
                pq.read_table(f"{sf_dir}/{t}.parquet").slice(0, 0),
                str(d / f"{t}.parquet"),
            )
    return str(d)


def test_changepoint_tie_breaks_to_earliest_day(spark, sf_dir, tmp_path):
    """Argmax total order (stat DESC, day ASC): a symmetric series
    makes the first and third splits bit-identically tied (same
    |mean difference|, same n₁n₂/N), so the EARLIEST day must win —
    this pins the ordering itself, which the sf0.001 twin only
    exercises incidentally."""
    import datetime as dt

    days = [dt.datetime(2024, 1, i + 1) for i in range(4)]
    rows = [
        (days[0], 0.0, "1-URGENT"),
        (days[1], 1.0, "1-URGENT"),
        (days[2], 1.0, "1-URGENT"),
        (days[3], 0.0, "1-URGENT"),
    ]
    d = _write_orders(spark, sf_dir, tmp_path, rows)
    row = q_changepoint_mean_shift(spark, d).collect()[0]
    # splits after day1 and day3 tie exactly (diff = ∓50/3 cents,
    # squared; n1·n2/N = 3/4 both); day2's split has stat 0
    assert row.split_date == dt.date(2024, 1, 1)
    assert row.n_before == 1 and row.n_after == 3
    assert row.shift_stat == pytest.approx((3.0 / 4.0) * (200.0 / 3.0) ** 2)


def test_kruskal_domain_guard_nulls_stats(spark, sf_dir, tmp_path):
    """A group value OUTSIDE the closed pivot domain is counted in
    n_groups/n_rows but cannot contribute a pivoted term — both
    engines would agree on a statistically wrong H, so the guard
    NULLs the derived stats instead (k != present)."""
    import datetime as dt

    day = dt.datetime(2024, 1, 1)
    rows = [
        (day, float(10 * i + p), pri)
        for i in range(3)
        for p, pri in enumerate(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW", "6-ROGUE"]
        )
    ]
    d = _write_orders(spark, sf_dir, tmp_path, rows)
    row = q_kruskal_wallis(spark, d).collect()[0]
    assert row.n_groups == 6 and row.n_rows == 18
    assert row.rank_terms is None and row.h_stat is None
    # the oracle takes the identical branch
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; glob its part files
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{d}/orders.parquet/*.parquet'"
    )
    from music_streaming_etl_spark.plans.staged_r8_queries import (
        ORACLE_KRUSKAL_WALLIS,
    )

    ok, on, orank, oh = con.execute(ORACLE_KRUSKAL_WALLIS).fetchone()
    con.close()
    assert (ok, on) == (6, 18) and orank is None and oh is None


# --------------------------------------------------------------------------
# the design-shaping pin: double→decimal cast ambiguity past 2^53
# --------------------------------------------------------------------------


@pytest.mark.engine_behavior_pin
def test_double_to_decimal_cast_is_ambiguous_past_2_53(spark):
    """DIRECTION PIN for the staged-r8 design rule (module docstring):
    Spark casts double→decimal via the JVM's Double.toString digits,
    which past 2^53 is NOT always the exact binary integer value —
    while DuckDB always converts the exact binary value. The pivoted
    fixed-order double sums exist BECAUSE of this. If this test ever
    fails (Spark starts casting the exact binary value for every
    sentinel), the carrier ban can be revisited — that is a playbook
    change, not a green light to silently flip behavior."""
    sentinels = [
        4.0829644555931686e17,  # the value that bit brown_forsythe
        1.3632997680123707e17,
        9.007199254740993e15,
        2.305843009213694e18,
    ]
    df = spark.createDataFrame([(v,) for v in sentinels], "d double")
    got = [
        int(r.dec)
        for r in df.select(
            F.col("d").cast("decimal(38,0)").alias("dec")
        ).collect()
    ]
    exact = [int(decimal.Decimal(v)) for v in sentinels]
    diverged = [g for g, e in zip(got, exact) if g != e]
    assert diverged, (
        "Spark's double->decimal cast now matches the exact binary "
        "value on every sentinel; the staged-r8 carrier ban is based "
        "on the old behavior - re-evaluate the playbook."
    )
    # DuckDB side: always the exact binary value
    con = duckdb.connect()
    for v, e in zip(sentinels, exact):
        assert int(con.execute(f"SELECT CAST(CAST({v!r} AS DOUBLE) AS DECIMAL(38,0))").fetchone()[0]) == e
    con.close()


def test_fixed_order_sum_matches_python_fold(spark):
    """The k-term fold is left-associated — same order as the SQL
    mirror text and plain python sum of the same floats."""
    from music_streaming_etl_spark.plans.staged_r8_queries import (
        _fixed_order_sum,
    )

    vals = [0.1, 0.2, 0.3, 1e17, -1e17]
    cols = [F.lit(v) for v in vals]
    got = spark.range(1).select(_fixed_order_sum(cols).alias("s")).collect()[0].s
    acc = vals[0]
    for v in vals[1:]:
        acc = acc + v
    assert got == acc  # bit-exact, not approx


def test_kruskal_single_group_is_null(spark, sf_dir, tmp_path):
    """k == 1: H's denominator N³−N is fine but ties == N³−N makes
    the correction 0 → NULL (all values in one group can still
    differ, then corr > 0 and H is finite ≥ 0 — both legs checked)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = pq.read_table(f"{sf_dir}/orders.parquet")
    one = src.filter(
        pa.compute.equal(src["o_orderpriority"], "1-URGENT")
    )
    d = tmp_path / "onegroup"
    d.mkdir()
    for t in TABLES:
        if t == "orders":
            pq.write_table(one, str(d / "orders.parquet"))
        else:
            pq.write_table(
                pq.read_table(f"{sf_dir}/{t}.parquet").slice(0, 0),
                str(d / f"{t}.parquet"),
            )
    row = q_kruskal_wallis(spark, str(d)).collect()[0]
    assert row.n_groups == 1
    # one group: rank_terms = R²/n with R = N(N+1)/2 ⇒ H numerator is
    # exactly 0; the tie correction keeps it 0 (or NULL if all tied)
    assert row.h_stat is None or row.h_stat == pytest.approx(0.0, abs=1e-9)
