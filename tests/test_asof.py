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
