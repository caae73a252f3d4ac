from __future__ import annotations

import duckdb
import pytest

from music_streaming_etl_spark.session import get_spark

#: the driver's pre-registered oracle views — single source for the
#: shared ``duck`` fixture (test_oracle_type_parity re-exports it for
#: its canon helpers' callers)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck(sf_dir):
    """DuckDB connection with the testdata tables as views — the
    oracle side of every parity test (one shared definition; was
    triplicated across test modules)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()
