"""Brute-force property twins for the decision/finance/ranking batch
(plans/decision_queries.py). The DuckDB oracle can mirror a shared
mistake; these re-derive the semantics independently in pure Python /
numpy on the real test corpus (and randomized inputs for the
recursions), so a wrong formula can't pass just because both engines
encode it the same way."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from music_streaming_etl_spark.plans.decision_queries import (
    _RBO_P,
    q_holt_linear_trend,
    q_max_drawdown,
    q_rank_biased_overlap,
    q_revenue_recognition,
    q_ucb1_allocation,
    q_welch_t_test,
)


def _orders_pd(sf_dir: str) -> pd.DataFrame:
    df = pd.read_parquet(f"{sf_dir}/orders.parquet")
    df["cents"] = (
        df["o_totalprice"].map(lambda v: round(v, 2)) * 100
    ).round().astype("int64")
    return df


def test_welch_matches_textbook_formula(spark, sf_dir):
    od = _orders_pd(sf_dir)
    a = od.loc[od.o_orderpriority == "1-URGENT", "cents"].to_numpy()
    b = od.loc[od.o_orderpriority == "5-LOW", "cents"].to_numpy()
    m1, m2 = a.mean(), b.mean()
    v1, v2 = a.var(ddof=1), b.var(ddof=1)
    se1, se2 = v1 / len(a), v2 / len(b)
    t = (m1 - m2) / math.sqrt(se1 + se2)
    df_w = (se1 + se2) ** 2 / (
        se1**2 / (len(a) - 1) + se2**2 / (len(b) - 1)
    )
    row = q_welch_t_test(spark, sf_dir).collect()[0]
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert abs(row["mean_diff_cents"] - (m1 - m2)) < 1e-3
    assert abs(row["t_stat"] - t) < 1e-5
    assert abs(row["df_welch"] - df_w) < 1e-2


def test_max_drawdown_matches_brute_force(spark, sf_dir):
    od = _orders_pd(sf_dir)
    od["day"] = od["o_orderdate"].dt.date
    got = {
        r["o_orderpriority"]: r
        for r in q_max_drawdown(spark, sf_dir).collect()
    }
    for prio, g in od.groupby("o_orderpriority"):
        daily = g.groupby("day")["cents"].sum().sort_index()
        peak, best = 0, (-1, None, None)  # (dd, day, peak)
        for day, v in daily.items():
            peak = max(peak, v)
            dd = peak - v
            if dd > best[0]:
                best = (dd, day, peak)
        r = got[prio]
        assert r["max_drawdown_cents"] == best[0], prio
        assert r["trough_day"] == best[1], prio
        assert r["peak_cents"] == best[2], prio


def _brute_rbo(ra: list, rb: list, k: int = 20) -> float:
    """Truncated RBO with the query's own term quantization (r7
    form: 1e-9-unit integer FLOOR per term, raw x0.1 emit — the
    engine-unambiguous quantizer that replaced ROUND finals)."""
    import math

    pa = {item: i + 1 for i, item in enumerate(ra[:k])}
    pb = {item: i + 1 for i, item in enumerate(rb[:k])}
    total = 0
    for d in range(1, k + 1):
        ov = sum(
            1
            for item, r in pa.items()
            if r <= d and item in pb and pb[item] <= d
        )
        total += math.floor(float(_RBO_P[d - 1]) * ov / d * 1e9)
    return float(total) / 1e9 * 0.1


def test_rbo_matches_brute_force(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    clicks = ev[ev.event_type == "click"].copy()
    clicks["item"] = (
        clicks["props"].str.extract(r'"k": (\d+)')[0].astype("int64")
    )
    clicks["day"] = clicks["ts"].dt.date

    def top20(sub):
        c = (
            sub.groupby("item")
            .size()
            .reset_index(name="c")
            .sort_values(["c", "item"], ascending=[False, True])
        )
        return c["item"].head(20).tolist()

    cut = pd.Timestamp("2024-01-16").date()
    ra = top20(clicks[clicks.day < cut])
    rb = top20(clicks[clicks.day >= cut])
    row = q_rank_biased_overlap(spark, sf_dir).collect()[0]
    assert row["rbo"] == _brute_rbo(ra, rb)
    assert row["overlap_at_20"] == len(set(ra) & set(rb))


def test_revenue_recognition_conserves_cents(spark, sf_dir):
    """Every order's 12 allocations sum back to its cents exactly, so
    the month-grain totals must sum to total order cents."""
    od = _orders_pd(sf_dir)
    out = q_revenue_recognition(spark, sf_dir).toPandas()
    assert out["recognized_cents"].sum() == od["cents"].sum()
    # spot-check one month against brute force
    target = pd.Timestamp("2024-06-01").date()
    brute = 0
    for _, r in od.iterrows():
        d0 = pd.Timestamp(r["o_orderdate"])
        for off in range(12):
            m = (d0 + pd.DateOffset(months=off)).to_period("M").start_time
            if m.date() == target:
                brute += r["cents"] // 12 + (
                    1 if off < r["cents"] % 12 else 0
                )
    got = out.loc[out["month"] == target, "recognized_cents"]
    if brute or len(got):
        assert int(got.iloc[0]) == brute


def test_ucb1_scores_and_rank(spark, sf_dir):
    od = _orders_pd(sf_dir)
    n_total = len(od)
    rows = q_ucb1_allocation(spark, sf_dir).collect()
    scored = []
    for r in rows:
        sub = od[od.o_orderpriority == r["arm"]]
        n = len(sub)
        x = int((sub.o_orderstatus == "F").sum())
        assert (r["n"], r["x"]) == (n, x), r["arm"]
        # r7 quantizer: micro-unit floor (q6), not round
        ucb = math.floor((x / n + math.sqrt(2 * math.log(n_total) / n)) * 1e6) / 1e6
        assert r["ucb_score"] == ucb, r["arm"]
        scored.append((ucb, r["arm"]))
    want = sorted(scored, key=lambda t: (-t[0], t[1]))
    got = sorted(rows, key=lambda r: r["allocation_rank"])
    assert [r["arm"] for r in got] == [a for _, a in want]


def _brute_holt(ys: list[int]) -> tuple[int, int]:
    l = ys[0] * 1000000
    b = 0
    for y in ys[1:]:
        ym = y * 1000000
        l_new = math.floor((ym + l + b) / 2.0)
        b = math.floor((3 * (l_new - l) + 7 * b) / 10.0)
        l = l_new
    return l, b


def test_holt_matches_brute_force(spark, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.date
    got = {
        r["etype"]: r for r in q_holt_linear_trend(spark, sf_dir).collect()
    }
    for etype, g in ev.groupby("event_type"):
        ys = g.groupby("day").size().sort_index().tolist()
        l, b = _brute_holt(ys)
        r = got[etype]
        assert r["n_days"] == len(ys)
        assert (r["level_micro"], r["trend_micro"]) == (l, b), etype
        assert r["forecast_7d_micro"] == l + 7 * b


def test_holt_randomized_series_matches(spark):
    """Randomized short series, including a decaying one that drives
    the trend state negative — the floor()-semantics regression trap
    (`DIV` truncates toward zero; the engine floors)."""
    import random

    rng = random.Random(11)
    series = [
        [rng.randrange(0, 5000) for _ in range(rng.randrange(1, 40))],
        [5000 - 120 * i for i in range(35)],  # steady decay, negative b
        [7],
        [3, 3, 3, 3],
    ]
    # fold through the same lambda the query uses, via a temp frame
    import datetime as dt

    data = []
    for sid, ys in enumerate(series):
        base = dt.datetime(2024, 3, 1)
        for i, y in enumerate(ys):
            data.append((f"s{sid}", base + dt.timedelta(days=i), y))
    df = spark.createDataFrame(data, "etype string, day timestamp, cnt long")
    from pyspark.sql import functions as SF

    daily = df.select(
        "etype",
        SF.to_date("day").alias("day"),
        (SF.col("cnt") * 1000000).cast("bigint").alias("ym"),
    )
    folded = daily.groupBy("etype").agg(
        SF.aggregate(
            SF.array_sort(SF.collect_list(SF.struct("day", "ym"))),
            SF.struct(
                SF.lit(0).cast("bigint").alias("n"),
                SF.lit(0).cast("bigint").alias("l"),
                SF.lit(0).cast("bigint").alias("b"),
            ),
            lambda st, e: SF.when(
                st["n"] == 0,
                SF.struct(
                    SF.lit(1).cast("bigint").alias("n"),
                    e["ym"].alias("l"),
                    SF.lit(0).cast("bigint").alias("b"),
                ),
            ).otherwise(
                SF.struct(
                    (st["n"] + 1).alias("n"),
                    SF.floor(
                        (e["ym"] + st["l"] + st["b"]).cast("double") / 2.0
                    )
                    .cast("bigint")
                    .alias("l"),
                    SF.floor(
                        (
                            3
                            * (
                                SF.floor(
                                    (e["ym"] + st["l"] + st["b"]).cast(
                                        "double"
                                    )
                                    / 2.0
                                ).cast("bigint")
                                - st["l"]
                            )
                            + 7 * st["b"]
                        ).cast("double")
                        / 10.0
                    )
                    .cast("bigint")
                    .alias("b"),
                )
            ),
        ).alias("st")
    )
    got = {r["etype"]: (r["st"]["l"], r["st"]["b"]) for r in folded.collect()}
    for sid, ys in enumerate(series):
        assert got[f"s{sid}"] == _brute_holt(ys), f"s{sid}"
