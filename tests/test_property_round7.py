"""Round-4 brute-force property twins for the driver-window front —
the 8 r3-advanced keys that slipped past last round's 50-key window
plus the oldest backlog cohort query. The DuckDB oracle can mirror a
shared mistake; these re-derive each query's semantics independently
in pure Python / pandas from the same parquet and compare cell-exact
(floats within 2e-6 of the 6dp round)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from itertools import combinations

import pandas as pd

SF = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    # mirrors CAST(price AS DECIMAL(18,2)) * 100 on exact-2dp inputs
    return int(round(x * 100))


def test_capped_running_balance_matches_recursion(spark):
    # the closed form b_n = S_n - min(0, min-prefix S) must equal the
    # textbook recursion b_n = max(0, b_{n-1} + d_n) row by row
    from music_streaming_etl_spark.plans.advanced_queries import (
        q_capped_running_balance,
    )

    rows = q_capped_running_balance(spark, SF).collect()
    assert rows
    by_user: dict = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for recs in by_user.values():
        recs.sort(key=lambda r: (r["ts"], r["event_id"]))
        b = 0
        for r in recs:
            b = max(0, b + r["delta_cents"])
            assert r["balance_cents"] == b, (r, b)


def test_rolling_median_7d_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.advanced_queries import (
        q_rolling_median_7d,
    )

    rows = q_rolling_median_7d(spark, SF).collect()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    od = pd.to_datetime(orders["o_orderdate"]).dt.date
    daily: dict = defaultdict(lambda: defaultdict(int))
    for prio, day, price in zip(
        orders["o_orderpriority"], od, orders["o_totalprice"]
    ):
        daily[prio][day] += _cents(price)
    got = {(r["priority"], r["day"]): r for r in rows}
    expected_keys = {(p, d) for p, m in daily.items() for d in m}
    assert set(got) == expected_keys
    one_day = pd.Timedelta(days=1).to_pytimedelta()
    for (prio, day), r in got.items():
        vals = sorted(
            daily[prio][day - k * one_day]
            for k in range(7)
            if (day - k * one_day) in daily[prio]
        )
        n = len(vals)
        assert r["n_days"] == n
        assert r["med_cents"] == vals[(n + 1) // 2 - 1], (prio, day)


def test_cohort_ltv_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.advanced_queries import q_cohort_ltv

    rows = q_cohort_ltv(spark, SF).collect()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    od = pd.to_datetime(orders["o_orderdate"])
    mon = od.dt.year * 12 + (od.dt.month - 1)
    first = mon.groupby(orders["o_custkey"]).min()
    rev: dict = defaultdict(int)
    users: dict = defaultdict(set)
    for cust, m, price in zip(orders["o_custkey"], mon, orders["o_totalprice"]):
        m0 = first[cust]
        key = (m0, m - m0)
        rev[key] += _cents(price)
        users[key].add(cust)
    got = {
        ((r["cohort_month"].year * 12 + r["cohort_month"].month - 1),
         r["age_months"]): r
        for r in rows
    }
    assert set(got) == set(rev)
    cum: dict = defaultdict(int)
    for (m0, age) in sorted(rev):
        cum[m0] += rev[(m0, age)]
        r = got[(m0, age)]
        assert r["rev_cents"] == rev[(m0, age)]
        assert r["active_users"] == len(users[(m0, age)])
        assert r["cum_rev_cents"] == cum[m0], (m0, age)


def test_growth_accounting_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.advanced_queries import (
        q_growth_accounting,
    )

    rows = q_growth_accounting(spark, SF).collect()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    od = pd.to_datetime(orders["o_orderdate"])
    mon = od.dt.year * 12 + (od.dt.month - 1)
    active: dict = defaultdict(set)  # customer -> set of month indexes
    for cust, m in zip(orders["o_custkey"], mon):
        active[cust].add(m)
    tally: dict = defaultdict(lambda: [0, 0, 0])  # month -> [new, ret, res]
    for cust, months in active.items():
        ms = sorted(months)
        for i, m in enumerate(ms):
            if i == 0:
                tally[m][0] += 1
            elif ms[i - 1] == m - 1:
                tally[m][1] += 1
            else:
                tally[m][2] += 1
    got = {
        (r["month"].year * 12 + r["month"].month - 1): r for r in rows
    }
    assert set(got) == set(tally)
    for m, (new, ret, res) in tally.items():
        r = got[m]
        assert (r["new_users"], r["retained_users"], r["resurrected_users"]) == (
            new, ret, res,
        ), m


def test_daily_autocorrelation_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.advanced_queries import (
        q_daily_autocorrelation,
    )

    rows = {r["lag"]: r for r in q_daily_autocorrelation(spark, SF).collect()}
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    od = pd.to_datetime(orders["o_orderdate"]).dt.date
    daily: dict = defaultdict(int)
    for day, price in zip(od, orders["o_totalprice"]):
        daily[day] += _cents(price)
    one_day = pd.Timedelta(days=1).to_pytimedelta()
    for k in (1, 7):
        pairs = [
            (daily[d], daily[d + k * one_day])
            for d in daily
            if (d + k * one_day) in daily
        ]
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        acf = (n * sxy - sx * sy) / (
            math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
        )
        r = rows[k]
        assert r["n_pairs"] == n
        assert abs(r["acf"] - round(acf, 6)) < 2e-6, k


def test_ks_drift_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.advanced_queries import q_ks_drift

    row = q_ks_drift(spark, SF).collect()[0]
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    years = pd.to_datetime(orders["o_orderdate"]).dt.year
    grain: dict = defaultdict(lambda: [0, 0])
    for price, y in zip(orders["o_totalprice"], years):
        grain[_cents(price)][int(y) < 1998] += 1
    na = sum(v[1] for v in grain.values())
    nb = sum(v[0] for v in grain.values())
    best = (-1, None)
    ca = cb = 0
    for v in sorted(grain):
        ca += grain[v][1]
        cb += grain[v][0]
        diff = abs(ca * nb - cb * na)
        if diff > best[0]:  # ties keep the SMALLEST value
            best = (diff, v)
    assert (row["n_early"], row["n_late"]) == (na, nb)
    assert row["at_cents"] == best[1]
    assert abs(row["ks_stat"] - round(best[0] / (na * nb), 6)) < 2e-6


def test_cohort_retention_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_cohort_retention,
    )

    rows = q_cohort_retention(spark, SF).collect()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    od = pd.to_datetime(orders["o_orderdate"])
    mon = od.dt.year * 12 + (od.dt.month - 1)
    first = mon.groupby(orders["o_custkey"]).min()
    cells: dict = defaultdict(set)
    for cust, m in zip(orders["o_custkey"], mon):
        cells[(first[cust], m - first[cust])].add(cust)
    got = {
        ((r["cohort_month"].year * 12 + r["cohort_month"].month - 1),
         r["month_offset"]): r["n_customers"]
        for r in rows
    }
    assert got == {k: len(v) for k, v in cells.items()}


def test_frequent_triples_matches_brute_force(spark):
    # Apriori pruning must not change the answer: every triple
    # supported by >= 2 orders, exactly
    from music_streaming_etl_spark.plans.advanced_queries import (
        q_frequent_triples,
    )

    rows = q_frequent_triples(spark, SF).collect()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    baskets: dict = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        baskets[o].add(p)
    support = Counter(
        t
        for parts in baskets.values()
        for t in combinations(sorted(parts), 3)
    )
    expected = {t: c for t, c in support.items() if c >= 2}
    got = {(r["u"], r["v"], r["w"]): r["support"] for r in rows}
    assert got == expected
