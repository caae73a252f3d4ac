"""As-of join unit tests: at-or-before semantics, no-predecessor
NULLs, equal-timestamp inclusion, key isolation."""

from __future__ import annotations

import datetime as dt

from music_streaming_etl_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2024, 6, 25, h, m)


def test_asof_basic_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(10)),   # after right@9 → match 9
            (2, 1, _ts(8)),    # before any right → NULL
            (3, 1, _ts(12)),   # after right@9 and right@11 → match 11
            (4, 2, _ts(10)),   # other key: right@10 exactly → match (<=)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 1, _ts(9)),
            (102, 1, _ts(11)),
            (103, 2, _ts(10)),
            (104, 3, _ts(1)),  # unrelated key never leaks
        ],
        "event_id long, user_id long, ts timestamp",
    )
    out = {
        r["event_id"]: (r["event_id_r"], r["ts_r"])
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["event_id", "ts"], suffix="_r"
        ).collect()
    }
    assert out[1] == (101, _ts(9))
    assert out[2] == (None, None)
    assert out[3] == (102, _ts(11))
    assert out[4] == (103, _ts(10))
    assert len(out) == 4


def test_asof_seq_col_breaks_right_ts_ties(spark):
    """Colliding right timestamps within a key resolve to the HIGHEST
    seq; a tied right row at exactly left_ts is still visible (<=) —
    the (ts, side, seq) total order regression test."""
    import pytest

    left = spark.createDataFrame(
        [
            (1, 1, _ts(10)),  # right@10 ties left ts → highest-seq right wins
            (2, 1, _ts(11)),  # strictly after the 10:00 collision group
            (3, 2, _ts(9)),   # other key, between its two colliding rows? none → 9:00 group
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            # three right rows at the SAME ts for key 1
            (201, 1, _ts(10), 5, "a"),
            (202, 1, _ts(10), 9, "b"),   # highest seq → must win
            (203, 1, _ts(10), 7, "c"),
            (204, 2, _ts(9), 1, "x"),
            (205, 2, _ts(9), 2, "y"),    # highest seq → must win
        ],
        "quote_id long, user_id long, ts timestamp, seq long, px string",
    )
    out = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["px"], seq_col="seq"
        ).collect()
    }
    assert out == {1: "b", 2: "b", 3: "y"}

    with pytest.raises(ValueError, match="seq_col"):
        asof_join(left, right, "user_id", "ts", "ts", ["px"], seq_col="nope")


def test_asof_forward_direction(spark):
    """forward = smallest right_ts >= left_ts; equality eligible;
    nothing after → NULL; lowest seq wins an equal-ts collision."""
    left = spark.createDataFrame(
        [
            (1, 1, _ts(10)),   # rights at 11,13 → 11
            (2, 1, _ts(13)),   # right exactly at 13 → 13 (>=)
            (3, 1, _ts(14)),   # nothing after → NULL
            (4, 2, _ts(5)),    # collision group at 6 → lowest seq
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 1, _ts(11), 1, "a"),
            (102, 1, _ts(13), 1, "b"),
            (103, 1, _ts(9), 1, "z"),   # before every left → never matches forward
            (104, 2, _ts(6), 4, "hi"),
            (105, 2, _ts(6), 2, "lo"),  # lowest seq → must win
        ],
        "quote_id long, user_id long, ts timestamp, seq long, px string",
    )
    out = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["px"],
            seq_col="seq", direction="forward",
        ).collect()
    }
    assert out == {1: "a", 2: "b", 3: None, 4: "lo"}


def test_asof_nearest_direction_and_tie(spark):
    """nearest picks the closer side; an exact-distance tie goes
    backward (pandas merge_asof contract)."""
    left = spark.createDataFrame(
        [
            (1, 1, _ts(10)),       # 9:00 vs 12:00 → backward 9:00
            (2, 1, _ts(11, 30)),   # 9:00 vs 12:00 → forward 12:00
            (3, 1, _ts(10, 30)),   # exact tie 90min both ways → backward
            (4, 2, _ts(10)),       # only a later right exists → forward
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (101, 1, _ts(9), "early"),
            (102, 1, _ts(12), "late"),
            (103, 2, _ts(23), "only"),
        ],
        "quote_id long, user_id long, ts timestamp, px string",
    )
    out = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(
            left, right, "user_id", "ts", "ts", ["px"], direction="nearest"
        ).collect()
    }
    assert out == {1: "early", 2: "late", 3: "early", 4: "only"}


def test_asof_tolerance(spark):
    """tolerance_seconds nulls matches farther than the bound, in
    every direction."""
    left = spark.createDataFrame(
        [(1, 1, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(101, 1, _ts(9), "p")],
        "quote_id long, user_id long, ts timestamp, px string",
    )
    for direction, want in [
        ("backward", None), ("nearest", None), ("forward", None),
    ]:
        (row,) = asof_join(
            left, right, "user_id", "ts", "ts", ["px"],
            direction=direction, tolerance_seconds=1800,
        ).collect()
        assert row["px_asof"] is want, direction
    # within tolerance → match survives
    (row,) = asof_join(
        left, right, "user_id", "ts", "ts", ["px"],
        direction="nearest", tolerance_seconds=3600,
    ).collect()
    assert row["px_asof"] == "p"


def test_asof_invalid_direction(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, _ts(1))], "e long, u long, ts timestamp")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, "u", "ts", "ts", [], direction="sideways")
