"""Cross-engine parity pin for the emitted-final quantizer
(``functions/quantize.py``): q6/q9 must produce bit-identical values
in Spark and DuckDB on the same input doubles, including the 2^53
saturation gate where the quantum becomes unrepresentable and the
helpers switch to the identity. This is the round-7 replacement for
ROUND(DOUBLE, d) finals, whose BigDecimal-vs-float-scaling
implementation split hash-failed ``anova_oneway`` in the round-6
driver environment (VERDICT r6 item 1)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.functions.quantize import q6, q6_sql, q9, q9_sql

VALUES = [
    0.0,
    -0.0,
    1.4738478053429532,
    -1.4738478053429532,
    0.1234565,          # sits a hair off the 6dp grid
    -0.1234565,
    123456.789123456,
    1e-7,               # below one quantum -> floors to 0.0
    -1e-7,              # floors DOWN to -1e-6 (floor, not trunc)
    8.9e15,             # past the 2^53 gate -> identity
    -8.9e15,
    9.0071992547409e9,  # xi right at the gate boundary region
    3.999999999999999,
]


@pytest.mark.parametrize("fn,sql_fn", [(q6, q6_sql), (q9, q9_sql)])
def test_quantizer_cross_engine_bit_parity(spark, fn, sql_fn):
    df = spark.createDataFrame([(v,) for v in VALUES], "x double")
    got = [r[0] for r in df.select(fn(F.col("x")).alias("q")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(f"SELECT {sql_fn('?::DOUBLE')}", [v, v, v]).fetchone()[0]
        for v in VALUES
    ]
    assert got == want


def test_gate_is_identity_above_2_53(spark):
    big = 8.9e15
    df = spark.createDataFrame([(big,)], "x double")
    assert df.select(q6(F.col("x")).alias("q")).collect()[0][0] == big


def test_floor_semantics_negative(spark):
    df = spark.createDataFrame([(-1e-7,)], "x double")
    assert df.select(q6(F.col("x")).alias("q")).collect()[0][0] == -1e-06


# --------------------------------------------------------------------------
# round-8: the exact-integer-division carrier (`stats_queries._idiv`)
# --------------------------------------------------------------------------


def test_idiv_matches_python_and_duckdb_hugeint(spark):
    """The entire round-8 IEEE-free arithmetic class (anova's S²/n
    terms and micro-statistics, ks_two_sample's d_micro) rides on
    `_idiv(a, b)` being EXACTLY Python's // for non-negative exact
    decimals AND exactly DuckDB's HUGEINT // — across the full
    magnitude envelope up to the DECIMAL(38,0) ceiling, through the
    quotient-near-integer cases where a naive floor(a/b) would round
    HALF_UP across the boundary, and NULL (never an ANSI error) on a
    zero divisor."""
    import duckdb

    from music_streaming_etl_spark.plans.stats_queries import _idiv

    cases = [
        (0, 1),
        (7, 2),
        (10**37, 10**6),                     # quotient 1e31: near the
        (5 * 10**36, 7 * 10**5),             # DECIMAL(38,6) carrier cap
        (2**53 + 1, 2),                      # past the double-exact gate
        (10**30 - 1, 10**15),                # quotient just below 1e15
        (999999999999999999999999, 10**10),  # frac part ~.99999 — the
        (10**25 + 10**12 - 1, 10**12),       # HALF_UP-vs-floor traps
        (123456789012345678901234567, 991),
        (3, 0),                              # zero divisor -> NULL
    ]
    df = spark.createDataFrame(
        [(str(a), str(b)) for a, b in cases], "a string, b string"
    ).select(
        F.col("a").cast("decimal(38,0)").alias("a"),
        F.col("b").cast("decimal(38,0)").alias("b"),
    )
    got = [
        None if r.q is None else int(r.q)
        for r in df.select(_idiv(F.col("a"), F.col("b")).alias("q"))
        .collect()
    ]
    expect = [None if b == 0 else a // b for a, b in cases]
    assert got == expect, "Spark _idiv != Python //"
    con = duckdb.connect()
    for (a, b), e in zip(cases, expect):
        duck = con.execute(
            f"SELECT CAST({a} AS HUGEINT) // NULLIF(CAST({b} AS HUGEINT), 0)"
        ).fetchone()[0]
        assert (None if duck is None else int(duck)) == e, (a, b)
    con.close()


def test_idiv_quotient_ceiling_raises_loudly(spark):
    """`_idiv`'s division carrier is DECIMAL(38,6) — 32 integer
    digits. A quotient ≥ 1e32 must raise LOUDLY under ANSI (the
    helper's documented ceiling), never return a silently wrong
    value; every registry user is audited ≤ ~1e27 at sf100k."""
    import pytest as _pytest

    from music_streaming_etl_spark.plans.stats_queries import _idiv

    df = spark.createDataFrame([("1" + "0" * 36, "3")], "a string, b string").select(
        F.col("a").cast("decimal(38,0)").alias("a"),
        F.col("b").cast("decimal(38,0)").alias("b"),
    )
    with _pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        df.select(_idiv(F.col("a"), F.col("b")).alias("q")).collect()
