"""Incremental view maintenance == recompute-from-scratch, across
insert-only deltas, retractions, new groups, and vanished groups."""

from __future__ import annotations

import random


from music_streaming_etl_spark.operators.ivm import (
    aggregate_delta,
    incremental_refresh,
)

SCHEMA = "k string, x long"


def _agg(df):
    return aggregate_delta(df, ["k"], sums={"sx": "x"})


def _full(spark, rows):
    return _agg(spark.createDataFrame(rows, SCHEMA))


def _as_dict(df):
    return {
        r["k"]: (r["n"], r["sx"]) for r in df.collect()
    }


def test_ivm_matches_recompute_over_random_delta_stream(spark):
    rng = random.Random(5)
    base = [
        (rng.choice("abcde"), rng.randrange(100)) for _ in range(200)
    ]
    view = incremental_refresh(None, _full(spark, base), ["k"], ["sx"])
    seen = list(base)
    for step in range(4):
        delta = [
            (rng.choice("abcdefg"), rng.randrange(100))
            for _ in range(50)
        ]
        seen += delta
        view = incremental_refresh(
            view, _full(spark, delta), ["k"], ["sx"]
        )
        assert _as_dict(view) == _as_dict(_full(spark, seen)), step


def test_ivm_retractions_and_group_disappearance(spark):
    base = [("a", 10), ("a", 5), ("b", 7)]
    view = incremental_refresh(None, _full(spark, base), ["k"], ["sx"])
    # retract BOTH 'a' rows: sign=-1 over the ORIGINAL values
    retract = spark.createDataFrame(
        [("a", 10, -1), ("a", 5, -1)],
        "k string, x long, __delta_sign int",
    )
    d2 = aggregate_delta(retract, ["k"], sums={"sx": "x"})
    view2 = incremental_refresh(view, d2, ["k"], ["sx"])
    got = _as_dict(view2)
    assert "a" not in got  # count hit zero -> group dropped
    assert got["b"] == (1, 7)


def test_ivm_min_max_insert_only(spark):
    import pytest

    base = spark.createDataFrame([("a", 5), ("a", 9)], SCHEMA)
    d0 = aggregate_delta(
        base, ["k"], sums={"sx": "x"}, mins={"mn": "x"}, maxs={"mx": "x"}
    )
    view = incremental_refresh(
        None, d0, ["k"], ["sx"], min_cols=["mn"], max_cols=["mx"],
        insert_only=True,
    )
    delta = spark.createDataFrame([("a", 2), ("b", 4)], SCHEMA)
    d1 = aggregate_delta(
        delta, ["k"], sums={"sx": "x"}, mins={"mn": "x"}, maxs={"mx": "x"}
    )
    view = incremental_refresh(
        view, d1, ["k"], ["sx"], min_cols=["mn"], max_cols=["mx"],
        insert_only=True,
    )
    rows = {r["k"]: r for r in view.collect()}
    assert rows["a"]["mn"] == 2 and rows["a"]["mx"] == 9
    assert rows["a"]["n"] == 3 and rows["a"]["sx"] == 16
    assert rows["b"]["mn"] == rows["b"]["mx"] == 4
    # the guard: extrema without the insert-only declaration refuse
    with pytest.raises(ValueError):
        incremental_refresh(
            view, d1, ["k"], ["sx"], min_cols=["mn"], insert_only=False
        )


def test_aggregate_delta_rejects_extrema_with_retractions(spark):
    # ADVICE r3: a __delta_sign retraction delta carries NEGATED
    # source values — min/max partials over it would be silently
    # poisoned; aggregate_delta must refuse, like incremental_refresh.
    import pytest as _pytest

    from music_streaming_etl_spark.operators.ivm import aggregate_delta

    delta = spark.createDataFrame(
        [("a", 5, 1), ("a", 5, -1)], "k string, v long, __delta_sign int"
    )
    with _pytest.raises(ValueError, match="insert-only"):
        aggregate_delta(delta, ["k"], sums={"s": "v"}, mins={"lo": "v"})
    # sums/count-only over the same retraction delta stays legal
    out = aggregate_delta(delta, ["k"], sums={"s": "v"}).collect()
    assert out[0]["n"] == 0 and out[0]["s"] == 0
