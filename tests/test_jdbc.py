"""Real JDBC source/sink round trip (SURVEY §2.1 S1/S6/S8) against an
embedded Derby database (the JDBC driver Spark ships with) — the same
reader/writer config drives Postgres/Redshift by swapping url+driver.

Covers: overwrite write with batch size (the reference's 50k-chunk
bulk load), full-table read, and the partitioned parallel range read
that replaces the reference's single-connection extract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.sources.io import jdbc_reader, jdbc_writer

PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    return f"jdbc:derby:{db};create=true"


def test_jdbc_write_read_round_trip(spark, derby_url):
    df = spark.range(0, 500).selectExpr(
        "id", "CAST(id % 7 AS DOUBLE) AS val", "concat('n', id) AS name"
    )
    jdbc_writer(
        df, derby_url, "t_users", mode="overwrite", properties=PROPS,
        batch_size=50_000,
        column_types="name VARCHAR(255)",  # Derby's CLOB default can't be filtered
    ).save()
    back = jdbc_reader(spark, derby_url, "t_users", properties=PROPS).load()
    assert back.count() == 500
    assert back.filter(F.col("name") == "n42").collect()[0]["val"] == 0.0


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    df = spark.range(0, 500).selectExpr("id", "CAST(id AS DOUBLE) AS val")
    jdbc_writer(df, derby_url, "t_part", mode="overwrite", properties=PROPS).save()
    part = jdbc_reader(
        spark,
        derby_url,
        "t_part",
        properties=PROPS,
        partition_column="id",
        lower_bound=0,
        upper_bound=500,
        num_partitions=4,
    ).load()
    assert part.rdd.getNumPartitions() == 4
    assert part.count() == 500
    # range predicates must not lose or duplicate boundary rows
    assert part.select(F.sum("id")).collect()[0][0] == sum(range(500))


def test_jdbc_overwrite_replaces(spark, derby_url):
    a = spark.range(0, 10).selectExpr("id")
    b = spark.range(100, 105).selectExpr("id")
    jdbc_writer(a, derby_url, "t_ow", mode="overwrite", properties=PROPS).save()
    jdbc_writer(b, derby_url, "t_ow", mode="overwrite", properties=PROPS).save()
    back = jdbc_reader(spark, derby_url, "t_ow", properties=PROPS).load()
    assert sorted(r["id"] for r in back.collect()) == list(range(100, 105))


def test_truncatecolumns_substrings_to_declared_width(spark, derby_url):
    """COPY TRUNCATECOLUMNS parity: over-width strings load truncated
    to the declared VARCHAR width instead of erroring."""
    df = spark.createDataFrame(
        [(1, "short"), (2, "x" * 40)], "id long, name string"
    )
    jdbc_writer(
        df, derby_url, "t_trunc", properties=PROPS,
        varchar_widths={"name": 10}, truncate_columns=True,
    ).save()
    back = {
        r["id"]: r["name"]
        for r in jdbc_reader(spark, derby_url, "t_trunc", properties=PROPS)
        .load().collect()
    }
    assert back == {1: "short", 2: "x" * 10}


def test_maxerror_zero_fails_fast_on_overwidth(spark, derby_url):
    """COPY MAXERROR 0 parity: without TRUNCATECOLUMNS an over-width
    row aborts the whole write (no partial silent load), and
    max_errors>0 is rejected up front."""
    df = spark.createDataFrame(
        [(1, "ok"), (2, "y" * 40)], "id long, name string"
    )
    with pytest.raises(Exception) as exc:
        jdbc_writer(
            df, derby_url, "t_strict", properties=PROPS,
            varchar_widths={"name": 10},
        ).save()
    assert "truncat" in str(exc.value).lower() or "22001" in str(exc.value)

    with pytest.raises(ValueError, match="max_errors"):
        jdbc_writer(df, derby_url, "t_strict", properties=PROPS, max_errors=5)


def test_check_no_nulls_pushdown_runs_source_side(spark, derby_url):
    """The validation aggregate executes inside the database (JDBC
    query option) — the scan Spark sees is the 1-row report, not the
    table."""
    from music_streaming_etl_spark.operators.validation import (
        check_no_nulls_pushdown,
    )
    from music_streaming_etl_spark.sources.io import jdbc_query_reader

    # nulls ride in numeric columns: Derby's JDBC dialect cannot
    # setNull() a string into a VARCHAR-overridden column (CLOB
    # mismatch) — a dialect quirk irrelevant to the pushdown itself
    df = spark.createDataFrame(
        [
            (1, "a", 30.0, 1.0),
            (2, "b", None, 2.0),
            (3, "c", 25.0, None),
            (4, "d", None, 4.0),
        ],
        "user_id long, user_name string, age double, score double",
    )
    jdbc_writer(
        df, derby_url, "t_users_val", properties=PROPS,
        column_types="user_name VARCHAR(64)",
    ).save()

    res = check_no_nulls_pushdown(
        spark, derby_url, "t_users_val",
        ["user_id", "user_name", "age", "score"], properties=PROPS,
    )
    assert not res.passed
    assert res.details["null_counts"] == {"age": 2, "score": 1}

    # plan-level proof of pushdown: the JDBC relation's schema is the
    # aggregate's 1-row report — the table columns never reach Spark
    rep = jdbc_query_reader(
        spark, derby_url,
        "SELECT COUNT(*) AS total_rows FROM t_users_val", PROPS,
    ).load()
    assert [f.name.lower() for f in rep.schema.fields] == ["total_rows"]
    assert rep.count() == 1

    clean = df.filter("age IS NOT NULL AND score IS NOT NULL")
    jdbc_writer(
        clean, derby_url, "t_users_clean", properties=PROPS,
        column_types="user_name VARCHAR(64)",
    ).save()
    ok = check_no_nulls_pushdown(
        spark, derby_url, "t_users_clean",
        ["user_id", "user_name", "age", "score"], properties=PROPS,
    )
    assert ok.passed
