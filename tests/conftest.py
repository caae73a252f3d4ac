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


def pytest_configure(config):
    # ADVICE r7: engine-behavior DIRECTION PINS (tests that assert a
    # measured Spark/DuckDB quirk still EXISTS) carry this marker so
    # an engine upgrade that fixes the quirk reads as "playbook
    # re-evaluation needed" (deselect with `-m 'not
    # engine_behavior_pin'`), not as a generic suite failure.
    config.addinivalue_line(
        "markers",
        "engine_behavior_pin: asserts a measured engine quirk still "
        "exists; failure after an engine upgrade means re-evaluate "
        "the determinism playbook, not a code regression",
    )


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
