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
