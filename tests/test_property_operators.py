"""Property-based tests for the composed operators: as-of join vs a
naive quadratic reference, and MinHash soundness (every returned pair
really meets the Jaccard threshold, computed independently)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from music_streaming_etl_spark.operators.asof import asof_join
from music_streaming_etl_spark.operators.dedup import dedup_minhash_pairs

BASE = dt.datetime(2024, 6, 25)

left_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50)),  # (key, minute)
    min_size=1,
    max_size=15,
)
right_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50)),
    min_size=0,
    max_size=15,
    unique=True,  # unique (key, ts) — the documented determinism precondition
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows)
def test_asof_matches_naive_reference(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(lrows)],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(100 + i, k, BASE + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(rrows)],
        "event_id long, k long, ts timestamp",
    ) if rrows else spark.createDataFrame([], "event_id long, k long, ts timestamp")

    got = {
        r["event_id"]: r["event_id_r"]
        for r in asof_join(
            left, right, "k", "ts", "ts", ["event_id"], suffix="_r"
        ).collect()
    }

    # naive reference: scan all right rows per left row
    rlist = [(100 + i, k, BASE + dt.timedelta(minutes=m)) for i, (k, m) in enumerate(rrows)]
    for i, (k, m) in enumerate(lrows):
        lts = BASE + dt.timedelta(minutes=m)
        cands = [(rid, rts) for rid, rk, rts in rlist if rk == k and rts <= lts]
        expected = max(cands, key=lambda c: (c[1], c[0]))[0] if cands else None
        assert got[i] == expected, (i, k, m)


doc_strategy = st.lists(
    st.lists(
        st.sampled_from(["spark", "join", "scan", "merge", "sort", "hash", "agg"]),
        min_size=3,
        max_size=12,
    ).map(" ".join),
    min_size=2,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=doc_strategy)
def test_minhash_pairs_are_sound(spark, texts):
    """Soundness: every emitted pair's Jaccard (recomputed in Python
    on 3-gram shingle sets) is ≥ threshold and ids are ordered.
    (Recall is probabilistic by construction — not asserted.)"""
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pairs = dedup_minhash_pairs(
        df, "doc_id", "text", threshold=0.5, num_hashes=16, num_bands=4, shingle_n=3
    ).collect()

    def sh(t: str) -> set:
        toks = t.lower().split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for r in pairs:
        assert r["id_a"] < r["id_b"]
        a, b = sh(texts[r["id_a"]]), sh(texts[r["id_b"]])
        j = len(a & b) / len(a | b)
        assert j >= 0.5
        assert abs(j - r["jaccard_sim"]) < 1e-6


rank_rows = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 4)),  # (score with ties, salt)
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=rank_rows, n=st.integers(1, 7))
def test_global_rank_and_ntile_match_windows(spark, rows, n):
    """global_rank/global_ntile must equal row_number()/ntile() over
    the same total order for ANY data (ties, uneven sizes, n > rows)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from music_streaming_etl_spark.operators.ranking import (
        global_ntile,
        global_rank,
    )

    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(rows)], "id long, score long"
    ).repartition(3)
    order = [F.desc("score"), F.asc("id")]  # total order (id unique)
    w = Window.orderBy(*order)

    got_rank = {r["id"]: r["rank"] for r in global_rank(df, order, 3).collect()}
    want_rank = {
        r["id"]: r["rank"]
        for r in df.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got_rank == want_rank

    got_tile = {r["id"]: r["tile"] for r in global_ntile(df, order, n, 3).collect()}
    want_tile = {
        r["id"]: r["tile"]
        for r in df.withColumn("tile", F.ntile(n).over(w).cast("bigint")).collect()
    }
    assert got_tile == want_tile


funnel_events = st.lists(
    st.tuples(
        st.integers(1, 5),                      # user
        st.integers(0, 30),                     # second offset (ties likely)
        st.sampled_from(["view", "click", "purchase", "other"]),
    ),
    min_size=0,
    max_size=50,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(events=funnel_events)
def test_funnel_counts_match_bruteforce(spark, events):
    """funnel_counts must agree with a per-user Python simulation for
    ANY event stream — including timestamp ties, missing steps, and
    repeated step events."""
    import datetime as dt

    from music_streaming_etl_spark.operators.timeseries import funnel_counts

    steps = ["view", "click", "purchase"]
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(seconds=sec), kind) for u, sec, kind in events
    ]

    # brute force: per user, walk steps via earliest-strictly-after
    per_user: dict = {}
    for u, ts, kind in rows:
        per_user.setdefault(u, []).append((ts, kind))
    want = [0] * len(steps)
    for evs in per_user.values():
        prev = None
        for i, step in enumerate(steps):
            cands = [
                ts for ts, kind in evs
                if kind == step and (prev is None or ts > prev)
            ]
            if not cands:
                break
            prev = min(cands)
            want[i] += 1

    if not rows:
        return  # createDataFrame needs a schema'd empty frame; skip
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = funnel_counts(df, "user_id", "ts", "event_type", steps).collect()[0]
    got = [out[f"n_{s}"] for s in steps]
    assert got == want, (got, want, rows)


# ---------------------------------------------------------------------------
# daily_anomalies flag algebra: the integer inequality
# (n·x − S)² > 4(n·SS − S²) must agree with |x − μ| > 2σ computed in
# floating point — pure-python check of the algebraic identity the
# Spark/DuckDB twins both implement over integer cents.
# ---------------------------------------------------------------------------

int_windows = st.lists(
    st.integers(0, 10**12), min_size=7, max_size=7  # trailing-7 history
)


@settings(max_examples=300, deadline=None)
@given(win=int_windows, x=st.integers(0, 10**12))
def test_anomaly_integer_algebra_matches_float_sigma(win, x):
    n = len(win)
    s = sum(win)
    ss = sum(v * v for v in win)
    lhs = (n * x - s) ** 2
    rhs = 4 * (n * ss - s * s)
    mu = s / n
    var = ss / n - mu * mu
    # only assert where floats are decisively on one side — RELATIVE
    # separation (values reach ~1e24 where float64 ulp is ~1e8, so an
    # absolute band would be meaningless); the boundary band itself is
    # legitimately decided by the exact integer comparison
    dev2 = (x - mu) ** 2
    band = 1e-9 * max(1.0, dev2 + 4 * var)
    if dev2 > 4 * var + band:
        assert lhs > rhs
    if dev2 < 4 * var - band:
        assert not lhs > rhs
