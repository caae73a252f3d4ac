"""Degenerate-input battery: every fix found by running the full
oracle selfcheck against EMPTY and 3-ROW variants of the testdata
(``scripts/make_degenerate_testdata.py``) is pinned here.

The bug classes this sweep caught (round 4):

- ANSI DIVIDE_BY_ZERO crashes where the DuckDB oracle yields NULL —
  single-day regressions (den == 0), one-group ANOVA (k-1 == 0),
  one-language keyness corpora (na == 0), zero-candidate LSH
  precision, all-zero bootstrap resample weights, zero-positive gains
  tables. Fixed with ``try_divide`` (identical to ``/`` on every
  nonzero denominator, NULL — DuckDB's answer — on zero).
- ``sqrt`` of a catastrophic-cancellation negative (m2 == -1e-18 on a
  single-row moment group): Spark returns NaN, DuckDB RAISES. Both
  sides clamp with greatest(m2, 0) — computed identically, so the
  same cells clamp.
- Ungrouped-vs-grouped aggregate shape: an ungrouped agg always emits
  a row, a GROUP BY over zero rows emits none (daily_autocorrelation
  with no lag-k overlap).
- Empty-input plumbing: schema inference over a zero-partition
  parquet sink, k-means codebooks with no seeds (VOID literal
  arrays), ``collect()[0]`` on an empty query-vector frame.

Kept intentionally DIVERGENT (asserted below so a Spark behavior
change is noticed): CUBE / ROLLUP / GROUPING SETS over an EMPTY
relation emit no grand-total row in Spark, while DuckDB (and the SQL
standard, and Postgres) emit one all-NULL row with count 0. The
driver gate runs at sf0.01 where the inputs are never empty.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from music_streaming_etl_spark.plans.registry import REGISTRY  # noqa: E402

_SC_PATH = os.path.join(
    os.path.dirname(__file__), "..", "scripts", "selfcheck.py"
)


def _load(modname: str, path: str):
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# keys that crashed or mismatched on the 3-row variant before the fix
TINY_KEYS = [
    "revenue_trend",
    "anova_oneway",
    "keyness_llr",
    "lsh_quality",
    "pearson_correlation",
    "distribution_moments",
    "regression_slope_daily",
    "bootstrap_mean_ci",
    "gains_table",
    "daily_autocorrelation",
]

# keys that crashed or mismatched on the empty variant before the fix
EMPTY_KEYS = [
    "check_freshness",  # r5: empty input must fail CLOSED, same in oracle
    "suggest_constraints",
    "partitioned_sink_prune",
    "similarity_topk_pq",
    "similarity_topk_ivfpq",
    "similarity_topk_ivf_kmeans",
    "lsh_quality",
    "daily_autocorrelation",
]

# keys that crashed or mismatched on the constant variant (unique
# keys, every other value tied) before the fix
CONSTANT_KEYS = [
    "ks_drift",
    "psi_drift",
    "spearman_correlation",
    "embedding_dim_stats",
    "sparse_cosine_topk",
    "cohens_kappa",
    "eb_shrunk_rates",
    "duplicate_spans",
    "repetition_stats",
]

# engine-semantics divergence, documented not fixed
GRANDTOTAL_DIVERGENT = [
    "cube_returnflag_status",
    "rollup_priority_status",
    "grouping_sets",
]


@pytest.fixture(scope="module")
def degenerate_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("degen")
    gen = _load("make_degenerate_testdata", os.path.join(
        os.path.dirname(__file__), "..", "scripts",
        "make_degenerate_testdata.py",
    ))
    return gen.generate("/root/testdata/sf0.001", str(root), rows=3)


def _oracle_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _check(spark, sf_dir: str, key: str) -> None:
    sc = _load("selfcheck_mod_for_tests", _SC_PATH)
    fn, oracle = REGISTRY[key]
    try:
        sdf = fn(spark, sf_dir).toPandas()
    finally:
        spark.catalog.clearCache()  # battery owns query-cache lifetime
    if oracle is None:
        return  # rows-only key: not raising IS the assertion
    odf = _oracle_con(sf_dir).execute(oracle).fetchdf()
    assert sc.compare(key, sdf, odf), f"{key} diverged on {sf_dir}"


@pytest.mark.parametrize("key", sorted(set(TINY_KEYS)))
def test_tiny_inputs_match_oracle(spark, degenerate_dirs, key):
    _check(spark, degenerate_dirs["tiny"], key)


@pytest.mark.parametrize("key", sorted(set(EMPTY_KEYS)))
def test_empty_inputs_match_oracle(spark, degenerate_dirs, key):
    _check(spark, degenerate_dirs["empty"], key)


@pytest.mark.parametrize("key", sorted(set(CONSTANT_KEYS)))
def test_constant_inputs_match_oracle(spark, degenerate_dirs, key):
    _check(spark, degenerate_dirs["constant"], key)


def test_freshness_fails_closed_on_empty(spark, degenerate_dirs):
    """V7 contract: no rows → no max timestamp → NOT fresh. A missing
    feed must never read as a healthy one (VERDICT r4 item 3)."""
    fn, _ = REGISTRY["check_freshness"]
    row = fn(spark, degenerate_dirs["empty"]).collect()[0]
    assert row["total_rows"] == 0
    assert row["fresh"] is False


@pytest.mark.parametrize("key", GRANDTOTAL_DIVERGENT)
def test_grandtotal_divergence_is_stable(spark, degenerate_dirs, key):
    """Spark emits NO grand-total row for CUBE/ROLLUP/GROUPING SETS
    over an empty relation; DuckDB emits one. Assert the divergence
    exactly so a Spark semantics change (or an accidental query
    rewrite) surfaces here instead of in a driver round."""
    fn, oracle = REGISTRY[key]
    sf_dir = degenerate_dirs["empty"]
    sdf = fn(spark, sf_dir).toPandas()
    odf = _oracle_con(sf_dir).execute(oracle).fetchdf()
    assert len(sdf) == 0, f"{key}: Spark now emits {len(sdf)} rows on empty"
    assert len(odf) == 1, f"{key}: oracle grand-total expectation changed"
