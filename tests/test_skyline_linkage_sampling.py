"""Brute-force property twins for the round-3 operators — the DuckDB
oracle can mirror a shared mistake; these tests re-derive the
semantics independently (pure Python / numpy) on randomized inputs,
plus partitioning-independence for the sampler."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.sampling import weighted_sample_topk
from music_streaming_etl_spark.operators.skyline import skyline_2d
from music_streaming_etl_spark.operators.text import sparse_cosine_pairs


def _brute_skyline(points):
    pts = set(points)
    out = set()
    for p in pts:
        dominated = any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts
            if q != p
        )
        if not dominated:
            out.add(p)
    return out


def test_skyline_matches_brute_force_random(spark):
    rng = random.Random(7)
    for trial, (n, xr, yr, buckets) in enumerate(
        [(200, 1000, 1000, 64), (300, 20, 20, 8), (50, 5, 5, 64), (120, 10**9, 100, 16)]
    ):
        pts = [(rng.randrange(xr), rng.randrange(yr)) for _ in range(n)]
        # duplicates on purpose: operator contract dedupes internally
        pts += pts[: n // 10]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {
            (r["x"], r["y"])
            for r in skyline_2d(df, "x", "y", n_buckets=buckets).collect()
        }
        assert got == _brute_skyline(pts), f"trial {trial}"


def test_skyline_degenerate_shapes(spark):
    # single point; all-identical; perfectly anti-correlated chain
    # (every point on the frontier); x-range smaller than bucket count
    one = spark.createDataFrame([(5, 5)], "x long, y long")
    assert [(r["x"], r["y"]) for r in skyline_2d(one, "x", "y").collect()] == [(5, 5)]
    same = spark.createDataFrame([(3, 3)] * 8, "x long, y long")
    assert [(r["x"], r["y"]) for r in skyline_2d(same, "x", "y").collect()] == [(3, 3)]
    chain = [(i, 100 - i) for i in range(100)]
    df = spark.createDataFrame(chain, "x long, y long")
    got = {(r["x"], r["y"]) for r in skyline_2d(df, "x", "y", n_buckets=7).collect()}
    assert got == set(chain)


def test_weighted_sample_is_partitioning_independent(spark):
    rows = [(i, float(1 + (i * 37) % 100)) for i in range(500)]
    a = spark.createDataFrame(rows, "id long, w double").repartition(1)
    b = spark.createDataFrame(rows, "id long, w double").repartition(13)
    ka = [(r["rank"], r["id"]) for r in weighted_sample_topk(a, "id", "w", 25).collect()]
    kb = [(r["rank"], r["id"]) for r in weighted_sample_topk(b, "id", "w", 25).collect()]
    assert ka == kb
    assert len(ka) == 25 and len({i for _, i in ka}) == 25  # without replacement


def test_weighted_sample_prefers_heavy_rows(spark):
    # 10 rows of weight 1000 vs 490 rows of weight 1: the heavy rows
    # should dominate the sample (E-S expectation; deterministic here
    # because the coin is fixed by the md5 of the id)
    rows = [(i, 1000.0 if i < 10 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = {r["id"] for r in weighted_sample_topk(df, "id", "w", 10).collect()}
    assert len(got & set(range(10))) >= 8
    # non-positive / null weights are excluded by contract
    rows2 = [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)]
    df2 = spark.createDataFrame(rows2, "id long, w double")
    assert {r["id"] for r in weighted_sample_topk(df2, "id", "w", 10).collect()} == {4}


def test_sparse_cosine_matches_numpy(spark):
    import numpy as np

    corpus = [
        (1, "apple banana apple cherry"),
        (2, "apple banana banana date"),
        (3, "cherry date elder fig"),
        (4, "apple apple apple apple"),
        (5, "grape melon kiwi lime"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in sparse_cosine_pairs(df, "doc_id", "text", threshold=0.0).collect()
    }
    # independent reconstruction
    docs = {i: t.split() for i, t in corpus}
    vocab = sorted({t for ts in docs.values() for t in ts})
    n = len(docs)
    dfreq = {t: sum(t in set(ts) for ts in docs.values()) for t in vocab}
    vecs = {}
    for i, ts in docs.items():
        vecs[i] = np.array(
            [ts.count(t) * round(math.log(n / dfreq[t]), 6) for t in vocab]
        )
    for (a, b), cos in got.items():
        va, vb = vecs[a], vecs[b]
        na, nb = math.sqrt(float(va @ va)), math.sqrt(float(vb @ vb))
        want = round(float(va @ vb) / (na * nb), 6)
        assert abs(cos - want) <= 1e-6, (a, b, cos, want)
    # zero-idf-only overlap (terms in every doc) never creates pairs
    # beyond threshold semantics; pair set must be symmetric-free
    assert all(a < b for a, b in got)


def test_sparse_cosine_max_df_caps_postings(spark):
    # a stop-term shared by ALL docs is excluded by the cap, so pairs
    # connected only through it disappear
    corpus = [
        (1, "stop alpha"),
        (2, "stop beta"),
        (3, "stop alpha gamma"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    uncapped = sparse_cosine_pairs(df, "doc_id", "text", threshold=0.0)
    capped = sparse_cosine_pairs(df, "doc_id", "text", threshold=0.0, max_df=2)
    assert {(r["id_a"], r["id_b"]) for r in uncapped.collect()} == {
        (1, 2), (1, 3), (2, 3),
    }
    assert {(r["id_a"], r["id_b"]) for r in capped.collect()} == {(1, 3)}


def test_fs_score_weights_and_classes(spark):
    from music_streaming_etl_spark.operators.linkage import (
        FieldSpec,
        fs_classify,
        fs_score,
    )

    df = spark.createDataFrame(
        [(1, True, True), (2, True, False), (3, False, False)],
        "id long, a boolean, b boolean",
    )
    fields = [
        FieldSpec("a", F.col("a"), 0.9, 0.1),   # agree +log2(9)=3.169925
        FieldSpec("b", F.col("b"), 0.8, 0.2),   # agree +2.0, disagree -2.0
    ]
    score = fs_score(fields)
    rows = {
        r["id"]: (r["s"], r["v"])
        for r in df.select(
            "id", score.alias("s"), fs_classify(score, 0.0, 5.0).alias("v")
        ).collect()
    }
    assert rows[1] == (round(math.log2(9) + 2.0, 6), "match")
    assert rows[2] == (round(math.log2(9) - 2.0, 6), "possible")
    w_dis_a = round(math.log2(0.1 / 0.9), 6)
    assert rows[3] == (round(w_dis_a - 2.0, 6), "non_match")


def test_bitemporal_lookup_matches_brute_force(spark):
    import datetime as dt
    import random

    from music_streaming_etl_spark.operators.scd import bitemporal_lookup

    rng = random.Random(11)
    base = dt.datetime(2024, 1, 1)
    states = []
    sid = 0
    for user in range(6):
        for _ in range(25):
            sid += 1
            valid = base + dt.timedelta(minutes=rng.randrange(0, 5000))
            # tx lag 0..180 min, including exact-0 (on-time) rows
            tx = valid + dt.timedelta(minutes=rng.randrange(0, 180))
            states.append((user, f"s{sid}", valid, tx, sid))
    facts = []
    for fid in range(80):
        facts.append((1000 + fid, fid % 6, base + dt.timedelta(minutes=rng.randrange(0, 5200))))
    sdf = spark.createDataFrame(
        states, "user_id long, state string, valid_ts timestamp, tx_ts timestamp, sid long"
    )
    fdf = spark.createDataFrame(facts, "fact_id long, user_id long, ts timestamp")
    got = {
        r["fact_id"]: (r["state_at"], r["valid_from_at"])
        for r in bitemporal_lookup(
            fdf, sdf, "user_id", "ts", "valid_ts", "tx_ts", ["state"], "sid"
        ).collect()
    }
    for fid, user, t in facts:
        vis = [
            (v, s_id, st)
            for (u, st, v, tx, s_id) in states
            if u == user and v <= t and tx <= t
        ]
        want = max(vis)[::] if vis else None
        if want is None:
            assert got[fid] == (None, None), fid
        else:
            v, _, st = max(vis, key=lambda r: (r[0], r[1]))
            assert got[fid] == (st, v), fid


def test_percentile_cont_matches_duckdb_quantile(spark, sf_dir):
    """The explicit interpolation construction equals the engine-native
    quantile_cont definition (DuckDB), not just our own oracle SQL."""
    import duckdb

    from music_streaming_etl_spark.plans.advanced_queries import (
        q_percentile_cont_by_group,
    )

    got = {
        r["priority"]: (r["p50_cents"], r["p90_cents"])
        for r in q_percentile_cont_by_group(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'"
    )
    want = {
        p: (round(a, 6), round(b, 6))
        for p, a, b in con.execute(
            """
            SELECT o_orderpriority,
                   quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.5),
                   quantile_cont(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0.9)
            FROM orders GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want


def test_capped_balance_identity_matches_loop(spark):
    """The closed form b_n = S_n - least(0, min prefix S) must equal
    the sequential recurrence b_n = max(0, b_{n-1} + d_n) on random
    walks, including deep-negative stretches."""
    import random

    from pyspark.sql import Window

    rng = random.Random(3)
    rows = []
    for user in range(5):
        for i in range(200):
            rows.append((user, i, rng.randrange(-50, 40)))
    df = spark.createDataFrame(rows, "user_id long, seq long, delta long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = F.sum("delta").over(w)
    got = {
        (r["user_id"], r["seq"]): r["b"]
        for r in df.select(
            "user_id", "seq",
            (s - F.least(F.lit(0), F.min(s).over(w))).alias("b"),
        ).collect()
    }
    by_user = {}
    for user, seq, delta in rows:
        by_user.setdefault(user, []).append((seq, delta))
    for user, items in by_user.items():
        b = 0
        for seq, delta in sorted(items):
            b = max(0, b + delta)
            assert got[(user, seq)] == b, (user, seq)


def test_weighted_sample_large_weights_not_collapsed(spark):
    # ADVICE r3: the raw ln(u)/w key rounded to 6dp collapses all
    # weights ≳ 4e7 into one bucket, silently degenerating to a
    # key-ascending pick. With max-weight normalization the relative
    # weights must still drive the sample at any magnitude: 10 rows at
    # 1e11 vs 490 at 1e8 (1000:1 odds, same ratio as the small-weight
    # twin above) should dominate identically.
    heavy = [(i, 1e11 if i < 10 else 1e8) for i in range(500)]
    small = [(i, 1000.0 if i < 10 else 1.0) for i in range(500)]
    got_heavy = [
        (r["rank"], r["id"])
        for r in weighted_sample_topk(
            spark.createDataFrame(heavy, "id long, w double"), "id", "w", 10
        ).collect()
    ]
    got_small = [
        (r["rank"], r["id"])
        for r in weighted_sample_topk(
            spark.createDataFrame(small, "id long, w double"), "id", "w", 10
        ).collect()
    ]
    # scale-invariance of E-S keys: same weight RATIOS => same sample
    assert got_heavy == got_small
    assert len({i for _, i in got_heavy} & set(range(10))) >= 8
