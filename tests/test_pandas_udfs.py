"""Parity tests: the Pandas-UDF escape hatches must agree with the
native implementations (so the two paths can't drift), plus the
grouped-map z-score example."""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.aggregates import agg_mode
from music_streaming_etl_spark.operators.pandas_udfs import (
    agg_mode_pandas,
    zscore_per_group,
)


def test_pandas_mode_matches_native(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    native = {
        r["o_orderstatus"]: r["m"]
        for r in agg_mode(orders, ["o_orderstatus"], "o_orderpriority", "m").collect()
    }
    via_pandas = {
        r["o_orderstatus"]: r["m"]
        for r in agg_mode_pandas(
            orders, ["o_orderstatus"], "o_orderpriority", "m"
        ).collect()
    }
    assert native == via_pandas


def test_pandas_mode_tie_break(spark):
    df = spark.createDataFrame(
        [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a")], "g string, v string"
    )
    assert agg_mode_pandas(df, ["g"], "v", "m").collect()[0]["m"] == "a"


def test_zscore_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "g string, v double"
    )
    rows = zscore_per_group(df, ["g"], "v", "z").collect()
    za = sorted(r["z"] for r in rows if r["g"] == "a")
    assert za == [pytest.approx(-1.0), pytest.approx(1.0)]
    zb = [r["z"] for r in rows if r["g"] == "b"]
    assert zb == [0.0]  # single-row group → 0, not NaN


def test_token_spans_udtf_offsets_reconstruct(spark):
    """UDTF surface (§2.8): every emitted span must slice back to its
    token, and token counts must agree with the native tokens()."""
    from music_streaming_etl_spark.operators.pandas_udfs import (
        make_token_spans_udtf,
    )

    spark.udtf.register("token_spans", make_token_spans_udtf())
    docs = spark.createDataFrame(
        [(1, "hello  world"), (2, " pad left"), (3, None), (4, "one")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT d.doc_id, d.text, t.token, t.start, t.end "
        "FROM udtf_docs d, LATERAL token_spans(d.text) t"
    ).collect()

    assert {(r["doc_id"], r["token"]) for r in rows} == {
        (1, "hello"), (1, "world"), (2, "pad"), (2, "left"), (4, "one"),
    }
    for r in rows:  # offsets are real: slicing reproduces the token
        assert r["text"][r["start"]:r["end"]] == r["token"]


def test_arrow_python_udf_matches_plain_python(spark):
    """The Arrow-optimized UDF must compute byte-identically to the
    same function run as plain Python — transport change only."""
    from music_streaming_etl_spark.operators.pandas_udfs import (
        arrow_python_udf_fingerprint,
    )

    def ref_fnv(text):
        h = 0xCBF29CE484222325
        for b in text.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h - 0x8000000000000000

    df = spark.createDataFrame(
        [("hello",), ("wörld",), (None,), ("",)], "t string"
    )
    fp = arrow_python_udf_fingerprint()
    got = {r["t"]: r["fp"] for r in df.select("t", fp("t").alias("fp")).collect()}
    assert got["hello"] == ref_fnv("hello")
    assert got["wörld"] == ref_fnv("wörld")
    assert got[""] == ref_fnv("")
    assert got[None] is None
