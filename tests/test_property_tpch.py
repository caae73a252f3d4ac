"""Brute-force twins for the correlation-heavy TPC-H shapes headed
into the round-5/6 driver windows: Q21 (double-correlated EXISTS /
NOT EXISTS), Q22 (scalar-AVG subquery + anti-join), Q20 (correlated
quantity threshold). Each re-derived with plain Python set/dict logic
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
