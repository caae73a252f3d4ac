"""Brute-force twins for the correlation-heavy TPC-H shapes headed
into the round-5/6 driver windows: Q21 (double-correlated EXISTS /
NOT EXISTS), Q22 (scalar-AVG subquery + anti-join), Q20 (correlated
quantity threshold), Q17 (correlated scalar avg), Q15 (scalar MAX),
and Q2 (correlated MIN). Each re-derived with plain Python set/dict logic
from the same parquet — the decorrelated Spark plans and the oracle
SQL share the correlated-subquery blind spot; these don't."""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import Decimal

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_tpch_q21_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.tpch_queries import (
        q_tpch_q21_waiting_supplier,
    )

    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    orders = pd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    supp = pd.read_parquet(
        f"{SF}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    odate = dict(
        zip(orders["o_orderkey"], pd.to_datetime(orders["o_orderdate"]))
    )
    ship = pd.to_datetime(li["l_shipdate"])
    # late is LINE-grain (the query and oracle never dedup it): a
    # supplier with three late lines on one qualifying order counts 3
    late_lines = Counter()
    order_supps: dict = defaultdict(set)
    for ok, sk, sd in zip(li["l_orderkey"], li["l_suppkey"], ship):
        order_supps[ok].add(sk)
        if ok in odate and (sd - odate[ok]).days > 365:
            late_lines[(ok, sk)] += 1
    late_by_order: dict = defaultdict(set)
    for ok, sk in late_lines:
        late_by_order[ok].add(sk)
    names = dict(zip(supp["s_suppkey"], supp["s_name"]))
    numwait = Counter()
    for (ok, sk), n_lines in late_lines.items():
        multi_supplier = len(order_supps[ok] - {sk}) > 0
        other_late = len(late_by_order[ok] - {sk}) > 0
        if multi_supplier and not other_late:
            numwait[names[sk]] += n_lines
    want = sorted(((-n, name) for name, n in numwait.items()))[:20]
    rows = sorted(
        q_tpch_q21_waiting_supplier(spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    assert [(r["s_name"], r["numwait"]) for r in rows] == [
        (name, -n) for n, name in want
    ]


def test_tpch_q22_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.tpch_queries import (
        q_tpch_q22_idle_customers,
    )

    cust = pd.read_parquet(
        f"{SF}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    )
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
    has_order = set(orders["o_custkey"])
    pos = [
        Decimal(str(b)).quantize(Decimal("0.01"))
        for b in cust["c_acctbal"]
        if b > 0
    ]
    avg_bal = float(sum(pos)) / len(pos)
    agg: dict = defaultdict(lambda: [0, Decimal(0)])
    for ck, nk, bal in zip(
        cust["c_custkey"], cust["c_nationkey"], cust["c_acctbal"]
    ):
        if bal > avg_bal and ck not in has_order:
            agg[nk][0] += 1
            agg[nk][1] += Decimal(str(bal)).quantize(Decimal("0.01"))
    got = {
        r["c_nationkey"]: (r["n_customers"], r["total_balance"])
        for r in q_tpch_q22_idle_customers(spark, SF).collect()
    }
    assert set(got) == set(agg)
    for nk, (n, tot) in agg.items():
        assert got[nk][0] == n
        assert abs(got[nk][1] - float(tot)) <= 1e-6, nk


def test_tpch_q20_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.tpch_queries import (
        q_tpch_q20_dominant_supplier,
    )

    part = pd.read_parquet(
        f"{SF}/part.parquet", columns=["p_partkey", "p_name"]
    )
    small = set(part.loc[part["p_name"].str.startswith("small "), "p_partkey"])
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )
    sd = pd.to_datetime(li["l_shipdate"])
    in_window = (sd >= "1996-01-01") & (sd < "1997-01-01")
    pair: dict = defaultdict(float)
    total: dict = defaultdict(float)
    for pk, sk, q, ok in zip(
        li["l_partkey"], li["l_suppkey"], li["l_quantity"], in_window
    ):
        if ok and pk in small:
            pair[(pk, sk)] += q
            total[pk] += q
    dominant = {sk for (pk, sk), q in pair.items() if q > 0.2 * total[pk]}
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    region = pd.read_parquet(f"{SF}/region.parquet")
    america = set(region.loc[region["r_name"] == "AMERICA", "r_regionkey"])
    nk = set(
        nation.loc[nation["n_regionkey"].isin(america), "n_nationkey"]
    )
    supp = pd.read_parquet(
        f"{SF}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"],
    )
    want = {
        (sk, nm)
        for sk, nm, snk in zip(
            supp["s_suppkey"], supp["s_name"], supp["s_nationkey"]
        )
        if snk in nk and sk in dominant
    }
    got = {
        (r["s_suppkey"], r["s_name"])
        for r in q_tpch_q20_dominant_supplier(spark, SF).collect()
    }
    assert got == want


def test_tpch_q17_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.tpch_queries import (
        q_tpch_q17_small_quantity,
    )

    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    qty_sum: dict = defaultdict(Decimal)
    qty_n = Counter()
    for pk, q in zip(li["l_partkey"], li["l_quantity"]):
        qty_sum[pk] += Decimal(str(q)).quantize(Decimal("0.01"))
        qty_n[pk] += 1
    avg = {pk: float(qty_sum[pk]) / qty_n[pk] for pk in qty_sum}
    total = Decimal(0)
    for pk, q, price in zip(
        li["l_partkey"], li["l_quantity"], li["l_extendedprice"]
    ):
        if q < 0.2 * avg[pk]:
            total += Decimal(str(price)).quantize(Decimal("0.01"))
    [r] = q_tpch_q17_small_quantity(spark, SF).collect()
    assert abs(r["avg_yearly"] - float(total) / 7.0) <= 1e-6


def test_tpch_q15_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.tpch_queries import (
        q_tpch_q15_top_supplier,
    )

    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=[
            "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount",
        ],
    )
    sd = pd.to_datetime(li["l_shipdate"])
    ok = (sd >= "1996-01-01") & (sd < "1996-04-01")
    rev: dict = defaultdict(Decimal)
    for sk, price, disc, keep in zip(
        li["l_suppkey"], li["l_extendedprice"], li["l_discount"], ok
    ):
        if keep:
            rev[sk] += Decimal(str(price * (1 - disc))).quantize(
                Decimal("0.0001")
            )
    mx = max(rev.values())
    supp = pd.read_parquet(
        f"{SF}/supplier.parquet", columns=["s_suppkey", "s_name"]
    )
    names = dict(zip(supp["s_suppkey"], supp["s_name"]))
    want = {
        (sk, names[sk], float(v)) for sk, v in rev.items() if v == mx
    }
    got = {
        (r["s_suppkey"], r["s_name"], r["total_revenue"])
        for r in q_tpch_q15_top_supplier(spark, SF).collect()
    }
    assert got == want


def test_tpch_q2_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.tpch_queries import (
        q_tpch_q2_min_cost_supplier,
    )

    nation = pd.read_parquet(f"{SF}/nation.parquet")
    region = pd.read_parquet(f"{SF}/region.parquet")
    europe = set(region.loc[region["r_name"] == "EUROPE", "r_regionkey"])
    nmap = {
        nk: nm
        for nk, nm, rk in zip(
            nation["n_nationkey"], nation["n_name"], nation["n_regionkey"]
        )
        if rk in europe
    }
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    sinfo = {
        sk: (nm, bal, nmap[nk])
        for sk, nm, nk, bal in zip(
            supp["s_suppkey"], supp["s_name"], supp["s_nationkey"],
            supp["s_acctbal"],
        )
        if nk in nmap
    }
    part = pd.read_parquet(f"{SF}/part.parquet")
    parts = set(
        part.loc[
            (part["p_type"] == "LARGE") & (part["p_size"] <= 10), "p_partkey"
        ]
    )
    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"],
    )
    pair_cost: dict = {}
    for pk, sk, price, q in zip(
        li["l_partkey"], li["l_suppkey"], li["l_extendedprice"],
        li["l_quantity"],
    ):
        if pk in parts and sk in sinfo:
            c = price / q  # IEEE double division, same as both engines
            k = (pk, sk)
            if k not in pair_cost or c < pair_cost[k]:
                pair_cost[k] = c
    part_min: dict = {}
    for (pk, _), c in pair_cost.items():
        if pk not in part_min or c < part_min[pk]:
            part_min[pk] = c
    winners = []
    for (pk, sk), c in pair_cost.items():
        if c == part_min[pk]:
            nm, bal, nname = sinfo[sk]
            winners.append((-bal, nname, nm, pk, c))
    winners.sort()
    want = [
        (i + 1, -negbal, nm, nname, pk, c)
        for i, (negbal, nname, nm, pk, c) in enumerate(winners[:100])
    ]
    rows = sorted(
        q_tpch_q2_min_cost_supplier(spark, SF).collect(),
        key=lambda r: r["rank"],
    )
    got = [
        (r["rank"], r["s_acctbal"], r["s_name"], r["n_name"],
         r["p_partkey"], r["supply_cost"])
        for r in rows
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[2] == w[2] and g[3] == w[3] and g[4] == w[4]
        assert abs(g[1] - w[1]) <= 1e-9 and abs(g[5] - w[5]) <= 1e-12, g[0]
