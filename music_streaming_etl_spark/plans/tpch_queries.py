"""TPC-H-pattern analytic queries beyond Q1/Q3/Q5 — the decision-
support shapes a warehouse user runs daily, adapted to the driver's
testdata columns (no l_commitdate / l_shipmode, so Q4's and Q12's
predicates are re-expressed on the columns that exist; the *plan
shapes* — EXISTS semi-join, conditional aggregation, join-filter-agg,
HAVING subquery — are the point).

Every query follows the engine's determinism playbook: decimal-exact
money sums (``dec_sum``), total-order top-k via ``global_topk``
(TakeOrderedAndProject, never a single-partition window), BIGINT
counts on both engines.

Scale notes (100 TB): fact-scaled tables (orders, customer, supplier
— they grow with SF) always shuffle-join on their keys with partial
aggregation below; only true dims (part here, nation/region elsewhere)
and provably tiny derived sets (a scalar aggregate, the max-revenue
row set) carry broadcast hints. AQE may still demote a shuffle join to
broadcast at runtime when a side truly fits — that is the safe
direction; a forced ``F.broadcast`` on a fact-scaled side is not.
Filters sit directly on the scan so parquet row-group pruning and AQE
see them. Q18's HAVING subquery aggregates lineitem *before* joining —
the classic shuffle-shrink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.ranking import global_topk
from .testdata_queries import _t, _tf, dec_sum


def q_tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority census of orders with at least one
    "late" line (EXISTS). The reference predicate (commitdate <
    receiptdate) is re-expressed as "a line shipped more than 30 days
    after the order date" on the available columns.

    Scale shape (r4 rewrite — the probe measured the naive left-semi
    at 27.2s/60M lines, the worst riser of the TPC-H block, because a
    semi join has no map-side reduction and shuffled every line):

    1. EXISTS with a MONOTONE residual decomposes to a per-key max:
       ∃ line (ship > od+30) ⟺ max(ship) > od+30, so lineitem
       partial-aggregates map-side and the shuffle carries ONE row
       per order instead of every line.
    2. The residual implies a static scan bound Catalyst cannot
       derive through the non-equi condition: a qualifying line has
       ship > od+30 ≥ window_start+30, so that bound is pushed to
       the parquet scan and prunes non-qualifying lines before the
       aggregate. The max over the FILTERED lines still decides the
       predicate (any line at or below the bound can never satisfy
       it for an in-window order).

    Joining the one-row-per-key max frame inner (not semi) is exact:
    no duplicate explosion, and the filter is the EXISTS check."""
    window_start, window_end = "1996-01-01", "1996-04-01"
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit(window_start))
        & (F.to_date("o_orderdate") < F.lit(window_end))
    )
    ship_bound = F.date_add(F.to_date(F.lit(window_start)), 30)
    max_ship = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", F.to_date("l_shipdate").alias("__ship"))
        .filter(F.col("__ship") > ship_bound)
        .groupBy("l_orderkey")
        .agg(F.max("__ship").alias("__max_ship"))
    )
    late = (
        orders.join(max_ship, orders.o_orderkey == max_ship.l_orderkey)
        .filter(
            F.col("__max_ship")
            > F.date_add(F.to_date("o_orderdate"), 30)
        )
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


ORACLE_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + INTERVAL 30 DAY
  )
GROUP BY 1
"""


def q_tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure filter→agg revenue forecast — the predicate-pushdown
    showcase (all three filters reach the parquet scan; no shuffle at
    all beyond the final single-row combine)."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * F.col("l_discount")
    return li.filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(dec_sum(rev, "revenue", scale=4))


ORACLE_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 24
"""


def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: top-20 customers by revenue lost to returns in a quarter —
    fact→fact join shuffled on orderkey, customer shuffle-joined on
    custkey (customer grows with SF — not broadcastable at 100 TB),
    then a bounded global top-k."""
    # fan-out REJECTED by measurement (r9): returnflag + quarter
    # filters leave too few rows for the exchange to pay for itself
    # (0.89 s vs 0.57 s; OPTIMIZATION_r09.md).
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01"))
    )
    cust = _t(spark, sf_dir, "customer")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).join(cust, orders.o_custkey == cust.c_custkey, "inner")
    agg = joined.groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment").agg(
        dec_sum(rev, "revenue", scale=4)
    )
    return global_topk(agg, [F.desc("revenue"), F.asc("c_custkey")], 20).select(
        "rank", "c_custkey", "c_name", "c_acctbal", "c_mktsegment", "revenue"
    )


ORACLE_Q10 = """
WITH agg AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE l.l_returnflag = 'R'
    AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
    AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
  GROUP BY 1, 2, 3, 4
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey ASC) AS BIGINT) AS rank,
       c_custkey, c_name, c_acctbal, c_mktsegment, revenue
FROM agg
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q12_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: conditional two-way counts per group (CASE-WHEN
    aggregation). Re-expressed on the available columns: per
    return-flag, how many 1996-shipped lines belong to urgent/high- vs
    lower-priority orders."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
    ).select("l_orderkey", "l_returnflag")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
    )


ORACLE_Q12 = """
SELECT l.l_returnflag,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
GROUP BY 1
"""


def q_tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: promo revenue share for one month — lineitem⨝part with the
    part dim broadcast, conditional decimal sums, one-row ratio.
    Both sums stay decimal-exact until the final double division, so
    the percentage is bit-identical across engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-09-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-10-01"))
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,4)"
    )
    promo = F.col("p_type").startswith("PROMO")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
    return joined.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(promo, rev).otherwise(F.lit(0).cast("decimal(28,4)"))).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct")
    )


ORACLE_Q14 = """
SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
             THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))
             ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE)
     / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE)
       AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-09-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1996-10-01'
"""


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers with very large orders — aggregate lineitem to
    order grain FIRST (HAVING sum(qty) > 200), then join the shrunken
    key set back to orders/customer. The pre-join aggregation is the
    shuffle-shrink that makes this viable at 100 TB."""
    # fan-out on the GROUP key (r9, guide §2.5/§2.4): the pre-join
    # aggregation shuffles on l_orderkey anyway, so the fan-out
    # exchange replaces it — parallel partial aggregation for free.
    li = _tf(spark, sf_dir, "lineitem", "l_orderkey").select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(dec_sum(F.col("l_quantity"), "total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("order_date"), "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    joined = big.join(
        orders, big.l_orderkey == orders.o_orderkey, "inner"
    ).join(cust, orders.o_custkey == cust.c_custkey, "inner")
    picked = joined.select(
        "c_custkey", "c_name", "o_orderkey", "order_date", "o_totalprice", "total_qty"
    )
    return global_topk(
        picked, [F.desc("o_totalprice"), F.asc("o_orderkey")], 100
    ).select(
        "rank", "c_custkey", "c_name", "o_orderkey", "order_date",
        "o_totalprice", "total_qty",
    )


ORACLE_Q18 = """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY 1 HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) > 200
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS BIGINT) AS rank,
       c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS order_date, o.o_totalprice, b.total_qty
FROM big b
JOIN orders o ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 100
"""


def q_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated scalar subquery — revenue from lines whose
    quantity is under 20% of that part's average quantity. Expressed as
    per-part aggregate + join-back (what a warehouse planner decorrelates
    to); the per-part avg is decimal-exact so the 0.2× threshold
    compares identical doubles in both engines."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(28,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    joined = li.join(
        per_part.withColumnRenamed("l_partkey", "p_key"),
        li.l_partkey == F.col("p_key"),
        "inner",
    )
    return joined.filter(F.col("l_quantity") < 0.2 * F.col("avg_qty")).agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,2)")).cast("double")
            / 7.0
        ).alias("avg_yearly")
    )


ORACLE_Q17 = """
WITH per_part AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem l JOIN per_part p ON l.l_partkey = p.l_partkey
WHERE l.l_quantity < 0.2 * p.avg_qty
"""


def q_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: scalar MAX subquery — the supplier(s) whose quarterly
    revenue equals the maximum. The max is broadcast back over the
    per-supplier aggregate; equality compares two doubles produced by
    the identical decimal-sum expression, so it is exact."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(dec_sum(rev, "total_revenue", scale=4))
    max_rev = per_supp.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    top = per_supp.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_revenue")
    )
    # `top` is the handful of max-revenue rows — broadcast THAT side;
    # supplier grows with SF and must never be broadcast.
    return supp.join(
        F.broadcast(top), top.l_suppkey == supp.s_suppkey, "inner"
    ).select("s_suppkey", "s_name", "total_revenue")


ORACLE_Q15 = """
WITH per_supp AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, p.total_revenue
FROM per_supp p JOIN supplier s ON p.l_suppkey = s.s_suppkey
WHERE p.total_revenue = (SELECT MAX(total_revenue) FROM per_supp)
"""


def q_tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar AVG subquery + NOT EXISTS anti-join — wealthy
    customers (balance above the positive-balance average) who have
    never ordered, rolled up per nation. The scalar average broadcasts;
    the anti-join streams orders' key set; decimal-exact balance sums."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,2)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    wealthy = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    idle = wealthy.join(
        orders, wealthy.c_custkey == orders.o_custkey, "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dec_sum(F.col("c_acctbal"), "total_balance"),
    )


ORACLE_Q22 = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(28,2))) AS DOUBLE) AS total_balance
FROM customer c, avg_bal a
WHERE c.c_acctbal > a.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY 1
"""


def q_tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: one equi-join (lineitem ⋈ part on partkey) carrying a
    DISJUNCTION of brand/size/quantity conjunct groups — the planner
    must keep the join equi (hash/sort-merge on partkey) and evaluate
    the OR as a post-join residual instead of degrading to a
    nested-loop over the disjuncts. Re-expressed on the testdata
    columns (p_container/l_shipmode don't exist; p_size stands in)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    joined = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey, "inner"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(11, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(26, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(cond).agg(
        dec_sum(rev, "revenue", scale=4),
        F.count(F.lit(1)).alias("n_lines"),
    )


ORACLE_Q19 = """
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 26 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape — the double-correlated EXISTS / NOT EXISTS: suppliers
    who were the ONLY late shipper on a multi-supplier order. Late is
    re-expressed as shipped >365 days after the order date (no
    l_receiptdate/l_commitdate in the testdata). Decorrelated Spark
    form: late lines → semi-join \"some other supplier on the order\" →
    anti-join \"some other LATE supplier on the order\" — both
    correlations become one-shuffle joins on l_orderkey, then a
    per-supplier rollup with a bounded top-k."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        .filter(
            F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 365
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o_key"), F.col("l_suppkey").alias("o_supp")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("lo_key"), F.col("l_suppkey").alias("lo_supp")
    )
    waiting = (
        late.join(
            others,
            (late.l_orderkey == others.o_key)
            & (late.l_suppkey != others.o_supp),
            "left_semi",
        )
        .join(
            late_others,
            (late.l_orderkey == late_others.lo_key)
            & (late.l_suppkey != late_others.lo_supp),
            "left_anti",
        )
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    agg = (
        waiting.join(supp, waiting.l_suppkey == supp.s_suppkey, "inner")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return global_topk(agg, [F.desc("numwait"), F.asc("s_name")], 20).select(
        "rank", "s_name", "numwait"
    )


ORACLE_Q21 = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) > 365
), waiting AS (
  SELECT t.l_orderkey, t.l_suppkey
  FROM late t
  WHERE EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = t.l_orderkey AND l2.l_suppkey <> t.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM late l3
                    WHERE l3.l_orderkey = t.l_orderkey AND l3.l_suppkey <> t.l_suppkey)
), agg AS (
  SELECT s.s_name, COUNT(*) AS numwait
  FROM waiting w JOIN supplier s ON w.l_suppkey = s.s_suppkey
  GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY numwait DESC, s_name ASC) AS BIGINT) AS rank,
       s_name, numwait
FROM agg
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


def q_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — the correlated scalar-MIN subquery: for each part,
    the supplier(s) achieving the minimum supply cost, restricted to
    one region. No partsupp table exists in the testdata, so supply
    cost of (part, supplier) is re-expressed as their minimum observed
    unit price ``l_extendedprice / l_quantity`` over lineitem.

    Decorrelated Spark form: per-(part, supplier) MIN → per-part MIN
    → equi-join back on (partkey, cost). Cost stays DOUBLE end-to-end
    — MIN and IEEE division are bit-exact in both engines, so the
    equality join is deterministic (no decimal rounding anywhere).
    Scale shape: both aggregations partial-agg below a single shuffle
    on l_partkey; supplier/nation/region dims broadcast only via the
    size-aware policy; final output is a bounded global top-k."""
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
    )
    # region-restricted (part, supplier) supply costs
    pair_cost = (
        li.join(part.hint("broadcast"), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("unit_cost").alias("supply_cost"))
    )
    part_min = pair_cost.groupBy(
        F.col("p_partkey").alias("m_partkey")
    ).agg(F.min("supply_cost").alias("min_cost"))
    winners = pair_cost.join(
        part_min,
        (F.col("p_partkey") == F.col("m_partkey"))
        & (F.col("supply_cost") == F.col("min_cost")),
    ).select("p_partkey", "s_name", "s_acctbal", "n_name", "supply_cost")
    return global_topk(
        winners,
        [
            F.desc("s_acctbal"),
            F.asc("n_name"),
            F.asc("s_name"),
            F.asc("p_partkey"),
        ],
        100,
    ).select("rank", "s_acctbal", "s_name", "n_name", "p_partkey", "supply_cost")


ORACLE_Q2 = """
WITH supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), pair_cost AS (
  SELECT p.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal, s.n_name,
         MIN(l.l_extendedprice / l.l_quantity) AS supply_cost
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supp s ON l.l_suppkey = s.s_suppkey
  WHERE p.p_type = 'LARGE' AND p.p_size <= 10
  GROUP BY 1, 2, 3, 4, 5
), part_min AS (
  SELECT p_partkey, MIN(supply_cost) AS min_cost FROM pair_cost GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey) AS BIGINT) AS rank,
       c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.supply_cost
FROM pair_cost c JOIN part_min m
  ON c.p_partkey = m.p_partkey AND c.supply_cost = m.min_cost
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, c.p_partkey
LIMIT 100
"""


def q_tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bidirectional nation-pair trade volume — revenue
    shipped between NATION_1 and NATION_2 (either direction) by year.
    The OR-of-two-pairs predicate is evaluated post-join as a residual
    over two broadcast-joined nation names; lineitem⋈orders and
    orders⋈customer shuffle on their keys (both sides fact-scaled),
    lineitem⋈supplier likewise. Partial aggregation runs below the
    final 3-column group-by."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
        .select("c_custkey", "cust_nation")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
    )
    joined = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        joined.withColumn(
            "l_year", F.year(F.to_date("l_shipdate")).cast("bigint")
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dec_sum(rev, "revenue", scale=4))
    )


ORACLE_Q7 = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       EXTRACT(YEAR FROM CAST(l.l_shipdate AS DATE)) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
"""


def q_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_2's market share of PROMO-part revenue sold
    into the ASIA region, by year — the conditional-sum-over-sum
    ratio (SUM(CASE)/SUM). Both sums are decimal-exact then cast to
    DOUBLE before the divide, so the ratio is bit-identical across
    engines. Five joins: part/nation/region broadcast, the
    fact-scaled orders/customer/supplier sides shuffle."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    nr = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(nr), F.col("c_nationkey") == F.col("cn_key"))
        .select("c_custkey")
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(part.hint("broadcast"), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nation_vol = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
        F.lit(0.0)
    )
    return (
        joined.withColumn(
            "o_year", F.year(F.to_date("o_orderdate")).cast("bigint")
        )
        .groupBy("o_year")
        .agg(
            (
                F.sum(nation_vol.cast("decimal(28,4)")).cast("double")
                / F.sum(vol.cast("decimal(28,4)")).cast("double")
            ).alias("mkt_share")
        )
    )


ORACLE_Q8 = """
SELECT EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE)) AS o_year,
       CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_2'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0.0 END AS DECIMAL(28,4))) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE)
       AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
GROUP BY 1
"""


def q_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on 'gear' parts by supplier nation and year.
    No ps_supplycost exists, so cost is re-expressed as
    ``0.1 × p_retailprice × l_quantity`` (a fixed carrying-cost
    fraction of list price — the *plan* shape, a 4-table join with a
    LIKE-filtered part dim and a two-level group-by, is the point).
    The per-row amount has true scale ≤ 4, cast to DECIMAL(28,4)
    before SUM on both engines."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    ).select("p_partkey", "p_retailprice")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "nation")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        0.1
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(part.hint("broadcast"), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("o_year", F.year(F.to_date("o_orderdate")).cast("bigint"))
        .groupBy("nation", "o_year")
        .agg(dec_sum(amount, "sum_profit", scale=4))
    )


ORACLE_Q9 = """
SELECT n.n_name AS nation,
       EXTRACT(YEAR FROM CAST(o.o_orderdate AS DATE)) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1 * p.p_retailprice * l.l_quantity
                AS DECIMAL(28,4))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY 1, 2
"""


def q_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape — the scalar-subquery fraction threshold: parts whose
    EUROPE-supplied revenue exceeds 0.1% of the total across all such
    parts. The total is a 1-row aggregate cross-joined (broadcast) into
    the per-part rollup — Spark's decorrelation of
    ``HAVING SUM(...) > (SELECT SUM(...) * 0.001 ...)``. Both the
    per-part and total sums are decimal-exact → DOUBLE, and the
    threshold multiply is the same double op in both engines, so the
    filter boundary is deterministic. One shuffle on l_partkey; the
    total reuses the per-part rollup (re-agg of ~|part| rows, not a
    second scan)."""
    nr = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("sn_key"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
    )
    per_part = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(dec_sum(F.col("val"), "part_value", scale=4))
    )
    total = per_part.agg(
        (F.sum(F.col("part_value").cast("decimal(28,4)")).cast("double") * 0.001)
        .alias("threshold")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
    )


ORACLE_Q11 = """
WITH per_part AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS part_value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY 1
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT CAST(SUM(CAST(part_value AS DECIMAL(28,4))) AS DOUBLE) * 0.001 FROM per_part)
"""


def q_tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape — the two-level aggregation over a LEFT OUTER join:
    distribution of customers by how many non-'4-NOT SPECIFIED' orders
    they placed (customers with none count in the c_count=0 bucket —
    the left join is semantically load-bearing, an inner join would
    drop them). Two shuffles: custkey, then the tiny c_count rollup."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").like("4-%")
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority NOT LIKE '4-%'
  GROUP BY 1
)
GROUP BY 1
"""


def q_tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct-supplier census per (brand, type, size) for
    a filtered part set, EXCLUDING a bad-supplier list (the
    customer-complaints NOT IN, re-expressed as s_name ending in '7')
    — a left-anti join, the scalable form of NOT IN. supplier↔part
    pairs come from lineitem (no partsupp table). COUNT(DISTINCT)
    shuffles on the 3-column group key with partial distinct below."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7")
    ).select(F.col("s_suppkey").alias("bad_key"))
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(part.hint("broadcast"), li.l_partkey == part.p_partkey)
        .join(bad, li.l_suppkey == bad.bad_key, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY 1, 2, 3
"""


def q_tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — the nested semi-join chain with a correlated
    quantity threshold: AMERICA-region suppliers who shipped more than
    20% of some 'small *' part's total 1996 volume (the ps_availqty >
    0.5×SUM(l_quantity) correlation, re-expressed on shipped volume).
    Decorrelated: per-(part, supplier) sums and per-part totals are
    two rollups of ONE shuffled base (exchange reuse), joined on
    partkey; qualifying suppkeys then left-semi-join supplier.
    Quantities are integral doubles, so the sums and the 0.2×
    threshold are bit-exact in both engines."""
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_name").like("small %")
    ).select("p_partkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(part.hint("broadcast"), F.col("l_partkey") == F.col("p_partkey"))
    )
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("pair_qty")
    )
    totals = pair.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("pair_qty").alias("total_qty")
    )
    dominant = (
        pair.join(totals, pair.l_partkey == totals.t_partkey)
        .filter(F.col("pair_qty") > F.lit(0.2) * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    nr = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("sn_key"))
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("sn_key"))
        .join(dominant, F.col("s_suppkey") == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


ORACLE_Q20 = """
WITH pair AS (
  SELECT l.l_partkey, l.l_suppkey, SUM(l.l_quantity) AS pair_qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'small %'
    AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
  GROUP BY 1, 2
), totals AS (
  SELECT l_partkey, SUM(pair_qty) AS total_qty FROM pair GROUP BY 1
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AMERICA'
  AND EXISTS (
    SELECT 1 FROM pair p JOIN totals t ON p.l_partkey = t.l_partkey
    WHERE p.l_suppkey = s.s_suppkey AND p.pair_qty > 0.2 * t.total_qty
  )
"""


REGISTRY_TPCH: dict = {
    "tpch_q2_min_cost_supplier": (q_tpch_q2_min_cost_supplier, ORACLE_Q2),
    "tpch_q7_volume_shipping": (q_tpch_q7_volume_shipping, ORACLE_Q7),
    "tpch_q8_market_share": (q_tpch_q8_market_share, ORACLE_Q8),
    "tpch_q9_product_profit": (q_tpch_q9_product_profit, ORACLE_Q9),
    "tpch_q11_important_parts": (q_tpch_q11_important_parts, ORACLE_Q11),
    "tpch_q13_order_distribution": (q_tpch_q13_order_distribution, ORACLE_Q13),
    "tpch_q16_supplier_counts": (q_tpch_q16_supplier_counts, ORACLE_Q16),
    "tpch_q20_dominant_supplier": (q_tpch_q20_dominant_supplier, ORACLE_Q20),
    "tpch_q19_disjunctive": (q_tpch_q19_disjunctive, ORACLE_Q19),
    "tpch_q21_waiting_supplier": (q_tpch_q21_waiting_supplier, ORACLE_Q21),
    "tpch_q22_idle_customers": (q_tpch_q22_idle_customers, ORACLE_Q22),
    "tpch_q15_top_supplier": (q_tpch_q15_top_supplier, ORACLE_Q15),
    "tpch_q17_small_quantity": (q_tpch_q17_small_quantity, ORACLE_Q17),
    "tpch_q4_late_orders": (q_tpch_q4_late_orders, ORACLE_Q4),
    "tpch_q6_forecast": (q_tpch_q6_forecast, ORACLE_Q6),
    "tpch_q10_returns": (q_tpch_q10_returns, ORACLE_Q10),
    "tpch_q12_priority_mix": (q_tpch_q12_priority_mix, ORACLE_Q12),
    "tpch_q14_promo_effect": (q_tpch_q14_promo_effect, ORACLE_Q14),
    "tpch_q18_large_orders": (q_tpch_q18_large_orders, ORACLE_Q18),
}
