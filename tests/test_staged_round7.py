"""Round-7 staged surface (plans/staged_queries.py) — full pre-
registration battery: cell-exact oracle parity, DESCRIBE type-parity,
MERGE clause semantics, physical-regime equality, degenerate inputs.

These keys are NOT in the live registry (frozen at 270 through round
6, VERDICT r5 item 7); this suite is the evidence that round 7 can
register them without staging unproven code into the driver window.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from music_streaming_etl_spark.plans.staged_queries import (
    REGISTRY_STAGED,
    q_merge_into_customers,
)
from music_streaming_etl_spark.sources.upsert import merge_into

from test_oracle_type_parity import canon_duck, canon_spark


@pytest.mark.parametrize("name", sorted(REGISTRY_STAGED))
def test_staged_oracle_parity(spark, sf_dir, duck, name):
    """Cell-exact vs DuckDB at sf0.001 — the driver-gate replica."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
    )
    from selfcheck import compare

    fn, osql = REGISTRY_STAGED[name]
    sdf = fn(spark, sf_dir).toPandas()
    spark.catalog.clearCache()
    odf = duck.execute(osql).fetchdf()
    assert compare(name, sdf, odf), f"{name} diverged from oracle"


def test_staged_oracle_type_parity(spark, sf_dir, duck):
    """The registry-wide DESCRIBE gate, applied to the staged keys so
    round-7 registration cannot trip test_oracle_type_parity."""
    problems = []
    for name, (fn, oracle) in REGISTRY_STAGED.items():
        spark_types = {
            f.name.lower(): canon_spark(f.dataType.simpleString())
            for f in fn(spark, sf_dir).schema.fields
        }
        desc = duck.execute(f"DESCRIBE {oracle}").fetchall()
        for col, dtype, *_ in desc:
            dt = canon_duck(dtype)
            st = spark_types.get(col.lower())
            if dt == "hugeint" or (dt.startswith("decimal(38,") and dt != st):
                problems.append(f"{name}.{col}: oracle widened to {dtype} (spark={st})")
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


def _tiny_target(spark):
    return spark.createDataFrame(
        [
            Row(k=1, name="a", bal=10.0),   # matched, updated
            Row(k=2, name="b", bal=20.0),   # matched, deleted
            Row(k=3, name="c", bal=30.0),   # carry-through
        ]
    )


def _tiny_staging(spark):
    return spark.createDataFrame(
        [
            Row(k=1, delta=5.0, drop=False),
            Row(k=2, delta=0.0, drop=True),
            Row(k=9, delta=99.0, drop=False),  # unmatched -> insert
        ]
    )


def _merge_tiny(spark, **kw):
    return merge_into(
        _tiny_target(spark),
        _tiny_staging(spark),
        on=["k"],
        when_matched_delete=F.col("s.drop"),
        when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        when_not_matched_insert={
            "k": F.col("s.k"),
            "bal": F.col("s.delta"),
        },
        **kw,
    )


@pytest.mark.parametrize("bcast", [True, False])
def test_merge_into_all_four_row_fates(spark, bcast):
    out = {r["k"]: r for r in _merge_tiny(spark, broadcast_staging=bcast).collect()}
    assert set(out) == {1, 3, 9}          # 2 deleted, 9 inserted
    assert out[1]["bal"] == 15.0          # updated: 10 + 5
    assert out[1]["name"] == "a"          # unlisted col carries through
    assert out[3] == Row(k=3, name="c", bal=30.0)  # untouched
    assert out[9]["bal"] == 99.0          # inserted
    assert out[9]["name"] is None         # absent insert col -> typed NULL


def test_merge_into_regimes_identical(spark):
    a = sorted(_merge_tiny(spark, broadcast_staging=True).collect())
    b = sorted(_merge_tiny(spark, broadcast_staging=False).collect())
    assert a == b
    # output schema is exactly the target's, both regimes
    tgt = _tiny_target(spark).schema
    assert _merge_tiny(spark, broadcast_staging=True).schema == tgt
    assert _merge_tiny(spark, broadcast_staging=False).schema == tgt


@pytest.mark.parametrize("bcast", [True, False])
def test_merge_into_no_insert_clause_discards_unmatched(spark, bcast):
    out = merge_into(
        _tiny_target(spark),
        _tiny_staging(spark),
        on=["k"],
        when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        broadcast_staging=bcast,
    )
    keys = {r["k"] for r in out.collect()}
    assert keys == {1, 2, 3}  # no delete clause, staging 9 discarded


@pytest.mark.parametrize("bcast", [True, False])
def test_merge_into_degenerate_empty_sides(spark, bcast):
    t, s = _tiny_target(spark), _tiny_staging(spark)
    ins = {"k": F.col("s.k"), "bal": F.col("s.delta")}
    # empty staging: target unchanged
    out = merge_into(
        t, s.limit(0), on=["k"],
        when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        when_not_matched_insert=ins, broadcast_staging=bcast,
    )
    assert sorted(out.collect()) == sorted(t.collect())
    # empty target: inserts only
    out = merge_into(
        t.limit(0), s, on=["k"],
        when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        when_not_matched_insert=ins, broadcast_staging=bcast,
    )
    got = {r["k"]: r["bal"] for r in out.collect()}
    assert got == {1: 5.0, 2: 0.0, 9: 99.0}


@pytest.mark.parametrize("bcast", [True, False])
def test_merge_into_null_delete_predicate_falls_through_to_update(spark, bcast):
    """SQL three-valued logic: WHEN MATCHED AND cond THEN DELETE
    fires only on TRUE — a NULL predicate must leave the row for the
    UPDATE clause, not silently drop it (where(~(m & NULL)) would)."""
    t = spark.createDataFrame([Row(k=1, bal=10.0)])
    s = spark.createDataFrame(
        [Row(k=1, delta=5.0, drop=None)],
        schema="k bigint, delta double, drop boolean",
    )
    out = merge_into(
        t, s, on=["k"],
        when_matched_delete=F.col("s.drop"),
        when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
        broadcast_staging=bcast,
    ).collect()
    assert out == [Row(k=1, bal=15.0)]


@pytest.mark.parametrize("bcast", [True, False])
def test_merge_into_composite_key(spark, bcast):
    """Multi-column ON keys: both regimes join on the full key tuple
    (the anti-join's name-based `on` list and the aliased equality
    predicate must agree)."""
    t = spark.createDataFrame(
        [Row(a=1, b="x", v=1.0), Row(a=1, b="y", v=2.0), Row(a=2, b="x", v=3.0)]
    )
    s = spark.createDataFrame(
        [Row(a=1, b="x", nv=10.0), Row(a=2, b="y", nv=40.0)]
    )
    out = merge_into(
        t, s, on=["a", "b"],
        when_matched_update={"v": F.col("s.nv")},
        when_not_matched_insert={"a": F.col("s.a"), "b": F.col("s.b"), "v": F.col("s.nv")},
        broadcast_staging=bcast,
    )
    got = {(r["a"], r["b"]): r["v"] for r in out.collect()}
    # (1,x) updated; (1,y)/(2,x) carried; (2,y) inserted
    assert got == {(1, "x"): 10.0, (1, "y"): 2.0, (2, "x"): 3.0, (2, "y"): 40.0}


def test_merge_into_auto_gate_respects_disabled_broadcast(spark):
    """The auto regime picker must never force a broadcast the
    session has disabled (threshold -1) — and by extension the
    deflated gate only admits provably-small frames. With
    broadcasting off, the auto plan must be the full-outer SMJ."""
    t, s = _tiny_target(spark), _tiny_staging(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = merge_into(
            t, s, on=["k"],
            when_matched_update={"bal": F.col("t.bal") + F.col("s.delta")},
            when_not_matched_insert={"k": F.col("s.k"), "bal": F.col("s.delta")},
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "FullOuter" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_merge_into_rejects_unknown_columns(spark):
    with pytest.raises(ValueError, match="when_matched_update"):
        merge_into(
            _tiny_target(spark), _tiny_staging(spark), on=["k"],
            when_matched_update={"nope": F.lit(1)},
        )
    with pytest.raises(ValueError, match="when_not_matched_insert"):
        merge_into(
            _tiny_target(spark), _tiny_staging(spark), on=["k"],
            when_not_matched_insert={"nope": F.lit(1)},
        )


def test_merge_into_rejects_merge_key_rewrite(spark):
    # ANSI MERGE forbids UPDATE SET on the join key: a rewritten key
    # could collide with an inserted row (the INSERT anti-join uses
    # the ORIGINAL target keys) and yield duplicate keys
    with pytest.raises(ValueError, match="merge-key"):
        merge_into(
            _tiny_target(spark), _tiny_staging(spark), on=["k"],
            when_matched_update={"k": F.col("s.k") + 100},
        )


def test_full_probe_equals_brute_force(spark, sf_dir):
    """The promotion's load-bearing property, asserted Spark-vs-Spark
    (independent of the SQL oracle): n_probe == n_clusters must
    reproduce exact brute-force top-k bit-for-bit."""
    from music_streaming_etl_spark.operators.similarity import (
        similarity_topk,
        similarity_topk_ivf_learned,
    )
    from music_streaming_etl_spark.plans.testdata_queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0)
    exact = similarity_topk(emb, query, "vec_id", "embedding", k=10).collect()
    full = similarity_topk_ivf_learned(
        emb, query, "vec_id", "embedding", dim=64, k=10,
        n_clusters=8, n_probe=8, iterations=3,
    ).select("rank", "id", "score").collect()
    assert full == exact


def test_merge_into_broadcast_plan_never_shuffles_target(spark, sf_dir):
    """The 100 TB contract of the broadcast regime: the wide target
    reaches the matched-clause join without an Exchange (only the
    key-only INSERT anti-join may shuffle)."""
    plan = q_merge_into_customers(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the full-width customer scan must feed the broadcast join
    # directly: no Exchange between FileScan parquet ...customer and
    # the join. Cheap structural proxy: at most the anti-join's
    # exchanges exist, and no SortMergeJoin appears at all.
    assert "SortMergeJoin" not in plan
