"""Deeper analytic query surface: multi-hop star joins, window
functions, rollup/pivot, sessionization. These go beyond the
reference's two-join/two-agg core to prove the engine handles the
query shapes a production deployment of it would grow into — each
still DuckDB-oracle-checked with the same determinism rules
(decimal-exact sums, total-order windows).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.ranking import global_ntile, global_rank, global_topk
from .stats_queries import _floor_sat_safe
from .testdata_queries import _t, _tf, dec_sum


def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: top-10 unshipped orders by revenue for one
    segment — selective dim filter driving a fact join, then a
    bounded top-k with a total order."""
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1995-03-15")
    )
    # fan-out REJECTED by measurement (r9): the selective shipdate/
    # orderdate/segment filters shrink the join inputs enough that the
    # added exchange loses (0.65 s vs 0.52 s; OPTIMIZATION_r09.md).
    li = _t(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1995-03-15")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
        # customer is fact-scaled even after the segment filter — semi-join
        # shuffles on custkey; AQE demotes to broadcast when it truly fits.
        .join(cust, orders.o_custkey == cust.c_custkey, "left_semi")
    )
    agg = joined.groupBy("o_orderkey", F.to_date("o_orderdate").alias("order_date")).agg(
        dec_sum(rev, "revenue", scale=4)
    )
    return global_topk(agg, [F.desc("revenue"), F.asc("o_orderkey")], 10).select(
        "rank", "o_orderkey", "order_date", "revenue"
    )


ORACLE_Q3 = """
WITH agg AS (
  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
         CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
    AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    AND EXISTS (SELECT 1 FROM customer c
                WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING')
  GROUP BY 1, 2
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS BIGINT) AS rank,
       o_orderkey, order_date, revenue
FROM agg QUALIFY rank <= 10
"""


def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join lineitem→orders→customer→nation→region —
    the deepest join chain in the suite. orders and customer grow
    with the fact (they are NOT dims), so they shuffle-join on their
    keys — AQE picks the physical strategy; only the true dims
    nation (25 rows) and region (5 rows) carry broadcast hints."""
    # fan-out on the join key (r9, guide §2.5/§2.4): reuses the
    # lineitem-side exchange of the orders join when it shuffles.
    li = _tf(spark, sf_dir, "lineitem", "l_orderkey").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy(F.col("r_name").alias("region")).agg(
        dec_sum(rev, "revenue", scale=4),
        F.count(F.lit(1)).alias("n_items"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


ORACLE_REVENUE_REGION = """
SELECT r.r_name AS region,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items,
       COUNT(DISTINCT o.o_custkey) AS n_customers
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1
"""


def q_window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over their order history — frame
    ordered by (date, orderkey) so running values are a total order
    (date ties alone would be nondeterministic)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.to_date("o_orderdate"), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
        .over(w)
        .cast("double")
        .alias("running_revenue"),
    )


ORACLE_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY CAST(o_orderdate AS DATE), o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
FROM orders
"""


def q_rollup_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (priority, status): per-combination, per-priority
    subtotal, and grand-total rows in one pass."""
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("o_totalprice"), "total_price"),
    )


ORACLE_ROLLUP = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns per priority (fixed value list
    — required for a deterministic schema, and the only sane form at
    scale: an unbounded pivot is a schema explosion)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("O", F.lit(0)).alias("n_open"),
            F.coalesce("F", F.lit(0)).alias("n_filled"),
            F.coalesce("P", F.lit(0)).alias("n_pending"),
        )
    )


ORACLE_PIVOT = """
SELECT o_orderpriority,
       COALESCE(COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END), 0) AS n_open,
       COALESCE(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END), 0) AS n_filled,
       COALESCE(COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END), 0) AS n_pending
FROM orders GROUP BY 1
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity boundary) via
    lag + cumulative sum — the batch twin of a streaming session
    window. Total order inside each user: (ts, event_id)."""
    # fan-out on the WINDOW key (r9, guide §2.5/§2.4): the window's
    # required hash distribution is satisfied by the fan-out exchange,
    # so parallelism comes free — one exchange either way.
    ev = _tf(spark, sf_dir, "events", "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_gap = ev.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long")
            - F.lag(F.col("ts").cast("long"), 1).over(w)
            > 1800,
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    sessions = with_gap.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).cast("bigint"),
    )
    return sessions.groupBy("user_id").agg(
        (F.max("session_id") + 1).alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(CAST(ts AS TIMESTAMP))
                   - lag(epoch(CAST(ts AS TIMESTAMP)), 1)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id, CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM s GROUP BY 1
"""


def q_genre_kpis_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship genre_kpis expressed through the SQL API instead
    of the DataFrame API — Catalyst plans both identically; this entry
    proves the SQL surface end-to-end (temp views + spark.sql)."""
    for name in ("lineitem", "orders", "customer"):
        _t(spark, sf_dir, name).createOrReplaceTempView(f"v_{name}")
    return spark.sql(
        """
        WITH merged AS (
          SELECT o.o_orderpriority AS genre,
                 to_date(l.l_shipdate) AS stat_date,
                 l.l_partkey, l.l_extendedprice, c.c_mktsegment
          FROM v_lineitem l
          LEFT JOIN v_orders o ON l.l_orderkey = o.o_orderkey
          LEFT JOIN v_customer c ON o.o_custkey = c.c_custkey
        ), base AS (
          SELECT * FROM merged WHERE genre IS NOT NULL
        ), lvl1 AS (
          SELECT genre, stat_date, c_mktsegment,
                 COUNT(1) AS grp_cnt,
                 COUNT(l_partkey) AS cnt_pk,
                 SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS sum_px,
                 COUNT(l_extendedprice) AS cnt_px
          FROM base GROUP BY genre, stat_date, c_mktsegment
        )
        SELECT genre, stat_date,
               SUM(cnt_pk) AS listen_count,
               CAST(SUM(sum_px) AS DOUBLE) / CAST(SUM(cnt_px) AS DOUBLE)
                 AS avg_track_duration,
               MIN(CASE WHEN c_mktsegment IS NOT NULL
                        THEN struct(-grp_cnt, c_mktsegment) END).c_mktsegment
                 AS most_popular_track
        FROM lvl1 GROUP BY genre, stat_date
        """
    )


def q_cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations
    in one pass (superset of the reference's flat group-bys)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        dec_sum(F.col("l_quantity"), "total_qty"),
    )


ORACLE_CUBE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_agg_count_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 scale-path variant: HyperLogLog++ distinct counts (rows-only
    check — HLL estimates differ engine to engine by construction;
    tests/test_aggregates.py bounds the error vs exact)."""
    from ..operators.aggregates import agg_count_distinct

    ev = _t(spark, sf_dir, "events")
    return agg_count_distinct(
        ev, ["event_type"], "user_id", "approx_unique_users", approximate=True
    )


def q_asof_join_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event enriched with the user's most
    recent signup event at-or-before it (union+window composition —
    see operators/asof.py; DuckDB verifies with a native ASOF JOIN).
    ``seq_col="event_id"`` breaks equal-``ts`` signup ties (backward:
    highest id = latest record wins) so the match never depends on
    partitioning or the data generator being collision-free; the
    oracle mirrors the tiebreak by collapsing signups to
    ``MAX(event_id)`` per (user, ts) before its ASOF join."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        signups,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["ts", "event_id"],
        seq_col="event_id",
        suffix="_signup",
    )


ORACLE_ASOF = """
WITH a AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'purchase'),
     b AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                  MAX(event_id) AS event_id
           FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
SELECT a.event_id, a.user_id, a.ts,
       b.ts AS ts_signup, b.event_id AS event_id_signup
FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND b.ts <= a.ts
"""


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join — time-to-convert: each signup enriched with
    the user's FIRST purchase at-or-after it, plus the conversion lag
    in whole seconds (integer floor — engine-agnostic). Same
    union+window composition as the backward form, traversed in the
    opposite direction (operators/asof.py ``direction="forward"``);
    ``seq_col="event_id"`` makes equal-``ts`` purchase ties
    deterministic (forward: lowest id = earliest record wins); the
    oracle mirrors by collapsing purchases to ``MIN(event_id)`` per
    (user, ts). DuckDB verifies with a native ``ASOF`` join on
    ``>=``."""
    from ..operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join(
        signups,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["ts", "event_id"],
        seq_col="event_id",
        suffix="_purchase",
        direction="forward",
    )
    lag = F.floor(
        F.unix_timestamp("ts_purchase") - F.unix_timestamp("ts")
    ).cast("bigint")
    return out.select(
        "event_id", "user_id", "ts", "ts_purchase", "event_id_purchase",
        lag.alias("seconds_to_convert"),
    )


ORACLE_ASOF_FWD = """
WITH a AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
           FROM events WHERE event_type = 'signup'),
     b AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                  MIN(event_id) AS event_id
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
SELECT a.event_id, a.user_id, a.ts,
       b.ts AS ts_purchase, b.event_id AS event_id_purchase,
       CAST(floor(epoch(b.ts)) - floor(epoch(a.ts)) AS BIGINT)
         AS seconds_to_convert
FROM a ASOF LEFT JOIN b ON a.user_id = b.user_id AND b.ts >= a.ts
"""


def q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-frequency table via explode — the unnest/flatten
    op (top-50 with a total order)."""
    from ..operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens("text")).alias("token"))
    agg = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    return global_topk(agg, [F.desc("n"), F.asc("token")], 50).select(
        "rank", "token", "n"
    )


ORACLE_TOKEN_FREQ = """
WITH tok AS (
  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
  FROM documents
), agg AS (
  SELECT token, COUNT(*) AS n FROM tok GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS BIGINT) AS rank,
       token, n
FROM agg QUALIFY rank <= 50
"""


def q_median_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower-median price per returnflag — deterministic in any
    engine, unlike interpolated medians and approx percentiles.

    ROUND-8 REWRITE, at the VALUE grain (the brown_forsythe median
    machinery): the original row-grain `row_number` window sorted
    EVERY fact row inside three single-task partitions — the 1000×
    probe measured 291s at 600M rows (2.1M rows/s, the seventh
    sweep's slowest healthy riser). Aggregating to (flag, DISTINCT
    price) first collapses the window input to the price DOMAIN
    (≤ ~10.4M values however large the fact grows) behind one
    map-side-combined shuffle; the per-group cumulative count then
    selects the value whose cumulative range covers rank
    ⌊(n_g+1)/2⌋. Output rows identical (the median VALUE does not
    depend on intra-tie order), so the oracle is unchanged.
    Floor division on BOTH sides: DuckDB's int "/" yields DOUBLE and
    CAST rounds half-to-even, Spark's cast truncates — floor is the
    one semantics every engine agrees on."""
    li = _t(spark, sf_dir, "lineitem")
    gv = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("l_returnflag")
    cw = gv.select(
        "l_returnflag",
        "l_extendedprice",
        "c",
        F.sum("c").over(wcum).cast("bigint").alias("cum"),
        F.sum("c").over(wall).cast("bigint").alias("n_g"),
    )
    target = F.floor((F.col("n_g") + 1) / 2).cast("bigint")
    return cw.filter(
        (F.col("cum") >= target) & (F.col("cum") - F.col("c") < target)
    ).select("l_returnflag", F.col("l_extendedprice").alias("median_price"))


ORACLE_MEDIAN = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM lineitem
)
SELECT l_returnflag, l_extendedprice AS median_price
FROM ranked WHERE rn = (cnt + 1) // 2
"""


def q_monthly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month rollup (date_trunc) — the natural partition
    grain for a 100 TB date-partitioned lake."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.to_date(F.date_trunc("month", "o_orderdate")).alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("o_totalprice"), "total_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


ORACLE_MONTHLY = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY 1
"""


def q_partitioned_sink_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + partition-pruned re-read: writes
    orders partitioned by priority, reads back ONE partition (the
    plan shows PartitionFilters, not a full scan)."""
    from .testdata_queries import SCRATCH

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(SCRATCH, f"orders_part_{tag}")
    src = _t(spark, sf_dir, "orders")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        src.write.mode("overwrite").partitionBy(
            "o_orderpriority"
        ).parquet(out)
    # explicit schema on the read-back: an empty source writes zero
    # partition directories and schema inference has nothing to read
    # (UNABLE_TO_INFER_SCHEMA); the writer's schema is authoritative
    # either way — and skipping inference also saves a footer read
    back = spark.read.schema(src.schema).parquet(out).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return back.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


ORACLE_PART_PRUNE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders WHERE o_orderpriority = '1-URGENT'
"""


def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation from orders where the
    supplier and customer share the nation — a 6-way join with a
    residual non-equi condition, region filter, and date range.
    orders/customer/supplier are fact-scaled (they grow with SF), so
    they shuffle-join; only nation/region broadcast."""
    # fan-out REJECTED by measurement (r9): the orderdate filter and
    # semi-joins shrink the work below what the added exchange costs
    # (1.28 s vs 0.82 s; OPTIMIZATION_r09.md).
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1994-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
    ).select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .select("r_regionkey")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left_semi")
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        dec_sum(rev, "revenue", scale=4),
        F.count(F.lit(1)).alias("n_items"),
    )


ORACLE_Q5 = """
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE c.c_nationkey = s.s_nationkey
  AND CAST(o.o_orderdate AS DATE) >= DATE '1994-01-01'
  AND CAST(o.o_orderdate AS DATE) <  DATE '1997-01-01'
  AND EXISTS (SELECT 1 FROM region r
              WHERE r.r_regionkey = n.n_regionkey
                AND r.r_name IN ('ASIA', 'EUROPE'))
GROUP BY 1
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — (priority), (status), and grand total
    in one pass (the general form rollup/cube specialize)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gs")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               COUNT(1) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
        FROM v_orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


def q_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantine routing report: events with non-positive value or a
    null user are quarantined, the rest load — per-type counts of
    both buckets in one pass (sum-of-flags, no double scan)."""
    from ..operators.validation import quarantine_split

    ev = _t(spark, sf_dir, "events")
    valid, bad = quarantine_split(
        ev, (F.col("value") > 0) & F.col("user_id").isNotNull()
    )
    v = valid.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_valid"))
    q = bad.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_quarantined"))
    return (
        v.join(q, "event_type", "full")
        .select(
            "event_type",
            F.coalesce("n_valid", F.lit(0)).alias("n_valid"),
            F.coalesce("n_quarantined", F.lit(0)).alias("n_quarantined"),
        )
    )


ORACLE_QUARANTINE = """
SELECT event_type,
       COUNT(CASE WHEN value > 0 AND user_id IS NOT NULL THEN 1 END) AS n_valid,
       COUNT(CASE WHEN NOT (value > 0 AND user_id IS NOT NULL)
                       OR (value > 0 AND user_id IS NOT NULL) IS NULL THEN 1 END) AS n_quarantined
FROM events GROUP BY 1
"""


def q_popularity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF stretch deliverable on testdata: part ≈ track, order lines
    ≈ plays, distinct orders ≈ listeners."""
    from .popularity import popularity_index

    li = _t(spark, sf_dir, "lineitem")
    return popularity_index(li, "l_partkey", "l_orderkey").withColumnRenamed(
        "track", "partkey"
    )


ORACLE_POPULARITY = """
WITH per AS (
  SELECT l_partkey AS partkey, COUNT(*) AS n_plays,
         COUNT(DISTINCT l_orderkey) AS n_listeners
  FROM lineitem GROUP BY 1
), m AS (SELECT MAX(n_plays) AS mp, MAX(n_listeners) AS ml FROM per)
SELECT partkey, n_plays, n_listeners,
       CAST(n_plays AS DOUBLE) / CAST(mp AS DOUBLE) * 0.6
             + CAST(n_listeners AS DOUBLE) / CAST(ml AS DOUBLE) * 0.4
         AS popularity_index
FROM per, m
"""


def q_engagement_top_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-based most popular 'track' (part) per 'genre'
    (p_type) — the spec's alternative to the frequency mode."""
    from .popularity import engagement_top_track

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey"
    )
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    plays = li.join(F.broadcast(part), "l_partkey", "left")
    return engagement_top_track(plays, "p_type", "l_partkey", "l_orderkey")


ORACLE_ENGAGEMENT_TOP = """
WITH per AS (
  SELECT l_partkey AS track, COUNT(*) AS n_plays,
         COUNT(DISTINCT l_orderkey) AS n_listeners
  FROM lineitem GROUP BY 1
), m AS (SELECT MAX(n_plays) AS mp, MAX(n_listeners) AS ml FROM per),
idx AS (
  SELECT track,
         CAST(n_plays AS DOUBLE) / CAST(mp AS DOUBLE) * 0.6
               + CAST(n_listeners AS DOUBLE) / CAST(ml AS DOUBLE) * 0.4
           AS popularity_index
  FROM per, m
), genres AS (
  SELECT DISTINCT p.p_type AS genre, l.l_partkey AS track
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type IS NOT NULL
)
SELECT genre, track, popularity_index
FROM genres g JOIN idx USING (track)
QUALIFY ROW_NUMBER() OVER (PARTITION BY genre
                           ORDER BY popularity_index DESC, track ASC) = 1
"""


def q_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile segmentation of customers by revenue — the
    marketing-style windowed bucketing (deterministic: total order on
    (revenue DESC, custkey)).

    Uses ``global_ntile`` — range-repartition + partition-offset ranks
    — instead of ``ntile().over(Window.orderBy(...))``, which would
    funnel every customer through one partition. Bucket sizing matches
    SQL NTILE exactly, so the DuckDB oracle still hash-matches."""
    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        dec_sum(F.col("o_totalprice"), "revenue")
    )
    tiled = global_ntile(
        rev, [F.desc("revenue"), F.asc("o_custkey")], 10
    ).withColumnRenamed("tile", "decile")
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dec_sum(F.col("revenue"), "decile_revenue"),
    )


ORACLE_DECILES = """
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
), tiled AS (
  SELECT revenue,
         CAST(NTILE(10) OVER (ORDER BY revenue DESC, o_custkey ASC) AS BIGINT) AS decile
  FROM rev
)
SELECT decile, COUNT(*) AS n_customers,
       CAST(SUM(CAST(revenue AS DECIMAL(28,2))) AS DOUBLE) AS decile_revenue
FROM tiled GROUP BY 1
"""


def q_revenue_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank p50/p90/p99 order-price per market segment —
    one partitioned window pass + conditional aggregation. Nearest-rank
    (ceil(p·n)) is deterministic in any engine, unlike interpolated
    PERCENTILE_CONT or sketch-based approx percentiles; at 100 TB run
    ``revenue_percentiles_approx`` instead (registered below) — one
    sketch aggregation, no per-segment window sort."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # customer is fact-scaled (grows with SF) — shuffle-join, no hint.
    seg = orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
    # ROUND-8 REWRITE, at the VALUE grain (the median_by_group fix):
    # the row-grain row_number window sorted every joined row inside
    # five single-task segment partitions. Distinct (segment, price)
    # counts + cumulative ranges select the identical nearest-rank
    # values (the value at rank k is invariant to intra-tie order),
    # bounded by the price domain at any corpus size; oracle unchanged.
    gv = seg.groupBy("c_mktsegment", "o_totalprice").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wcum = Window.partitionBy("c_mktsegment").orderBy(
        "o_totalprice"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = gv.select(
        "c_mktsegment",
        "o_totalprice",
        "c",
        F.sum("c").over(wcum).cast("bigint").alias("cum"),
        F.sum("c").over(Window.partitionBy("c_mktsegment"))
        .cast("bigint")
        .alias("cnt"),
    )

    def pick(p: float, alias: str):
        rank = F.ceil(F.col("cnt") * p).cast("bigint")
        return F.max(
            F.when(
                (F.col("cum") >= rank) & (F.col("cum") - F.col("c") < rank),
                F.col("o_totalprice"),
            )
        ).alias(alias)

    return ranked.groupBy("c_mktsegment").agg(
        pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99")
    )


def q_revenue_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path of ``revenue_percentiles``: GK-sketch
    ``percentile_approx`` in ONE aggregation pass — no per-segment
    window sort (the exact variant's parallelism is capped at the
    number of segments), partial sketches merge map-side, memory is
    O(accuracy) per group regardless of row count. Rows-only driver
    check by nature (sketch values are engine-specific); the pytest
    tolerance test bounds the error against the exact variant."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = orders.join(cust, orders.o_custkey == cust.c_custkey, "inner")
    pa = F.percentile_approx(
        "o_totalprice", [0.5, 0.9, 0.99], 10_000
    ).alias("pcts")
    return (
        seg.groupBy("c_mktsegment")
        .agg(pa)
        .select(
            "c_mktsegment",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
        )
    )


ORACLE_PERCENTILES = """
WITH ranked AS (
  SELECT c.c_mktsegment, o.o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice, o.o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY c.c_mktsegment) AS cnt
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT c_mktsegment,
       MAX(CASE WHEN rn = CAST(CEIL(cnt * 0.5) AS BIGINT) THEN o_totalprice END) AS p50,
       MAX(CASE WHEN rn = CAST(CEIL(cnt * 0.9) AS BIGINT) THEN o_totalprice END) AS p90,
       MAX(CASE WHEN rn = CAST(CEIL(cnt * 0.99) AS BIGINT) THEN o_totalprice END) AS p99
FROM ranked GROUP BY 1
"""


def q_event_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival statistics via lag() — the lead/lag
    window shape. Gaps are computed in integer MICROSECONDS
    (``unix_micros`` ↔ DuckDB ``epoch_us``) so both engines subtract
    the same exact integers; the mean divides two exact integers as
    doubles. Window is partitioned by user — no global sort."""
    # fan-out on the WINDOW key (r9, guide §2.5/§2.4): exchange reuse,
    # same as sessionize_events.
    ev = _tf(spark, sf_dir, "events", "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.withColumn("gap_us", us - F.lag(us, 1).over(w)).filter(
        F.col("gap_us").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        (F.sum("gap_us").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_gap_us"
        ),
    )


ORACLE_INTERARRIVAL = """
WITH g AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP))
           - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT user_id, COUNT(*) AS n_gaps,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
       CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_gap_us
FROM g WHERE gap_us IS NOT NULL GROUP BY 1
"""


def q_customer_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year customer retention via set operators — INTERSECT
    (retained), EXCEPT (churned / new). Each input is a pre-distincted
    single-column key set, so the set ops shuffle only distinct keys
    (the 100 TB-safe shape: dedup before the set op, not after)."""
    orders = _t(spark, sf_dir, "orders")
    yr = F.year(F.to_date("o_orderdate"))
    a95 = orders.filter(yr == 1995).select("o_custkey").distinct()
    a96 = orders.filter(yr == 1996).select("o_custkey").distinct()
    one = F.count(F.lit(1)).cast("bigint")
    retained = a95.intersect(a96).agg(one.alias("retained"))
    churned = a95.exceptAll(a96).agg(one.alias("churned"))
    new = a96.exceptAll(a95).agg(one.alias("new_customers"))
    # three single-row aggregates; the cross joins are 1×1×1
    return retained.crossJoin(churned).crossJoin(new)


ORACLE_RETENTION = """
WITH a95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1995),
     a96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(CAST(o_orderdate AS DATE)) = 1996)
SELECT (SELECT COUNT(*) FROM (SELECT * FROM a95 INTERSECT SELECT * FROM a96)) AS retained,
       (SELECT COUNT(*) FROM (SELECT * FROM a95 EXCEPT SELECT * FROM a96)) AS churned,
       (SELECT COUNT(*) FROM (SELECT * FROM a96 EXCEPT SELECT * FROM a95)) AS new_customers
"""


def q_rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling revenue: daily pre-aggregation, then a RANGE-frame
    window (6 preceding days .. current) over epoch-day integers — the
    time-based frame shape ROWS frames can't express (gaps in the
    calendar must widen the lookback, not slide it).

    Scale: the window input is the DAILY rollup — bounded by the
    calendar (~2.4k rows here, ~37k rows for a century), CONSTANT in
    fact size, so the unpartitioned window is safe at any data scale.
    The rolling sum accumulates DECIMAL inside the frame and casts to
    double only at the end — exact in both engines regardless of
    frame-evaluation order (segment trees vs sequential)."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,2)")).alias("day_rev")
    )
    epoch_day = F.datediff(F.col("d"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.orderBy(epoch_day.cast("long"))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "d",
        F.col("day_rev").cast("double").alias("day_revenue"),
        F.sum("day_rev").over(w).cast("double").alias("rolling_7d_revenue"),
    )


ORACLE_ROLLING_7D = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS day_rev
  FROM orders GROUP BY 1
)
SELECT d, CAST(day_rev AS DOUBLE) AS day_revenue,
       CAST(SUM(day_rev) OVER (ORDER BY date_diff('day', DATE '1970-01-01', d)
            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS rolling_7d_revenue
FROM daily
"""


def q_daily_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day conditional distinct counts — the FILTER-clause
    aggregation shape: overall DAU, purchasers only, error-affected
    users, plus purchase revenue, in ONE pass (no per-condition
    re-scan). Each conditional distinct is countDistinct over a
    CASE-nulled key; decimal-exact revenue."""
    ev = _t(spark, sf_dir, "events")
    d = F.to_date("ts").alias("d")
    is_purchase = F.col("event_type") == "purchase"
    is_error = F.col("event_type") == "error"
    return ev.groupBy(d).agg(
        F.countDistinct("user_id").alias("dau"),
        F.countDistinct(F.when(is_purchase, F.col("user_id"))).alias("purchasers"),
        F.countDistinct(F.when(is_error, F.col("user_id"))).alias("error_users"),
        F.sum(
            F.when(is_purchase, F.col("value").cast("decimal(28,2)"))
        ).cast("double").alias("purchase_revenue"),
    )


ORACLE_DAU = """
SELECT CAST(ts AS DATE) AS d,
       COUNT(DISTINCT user_id) AS dau,
       COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS purchasers,
       COUNT(DISTINCT CASE WHEN event_type = 'error' THEN user_id END) AS error_users,
       CAST(SUM(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(28,2)) END) AS DOUBLE) AS purchase_revenue
FROM events GROUP BY 1
"""


def q_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: 1996 shipments counted into overlapping 28-day
    campaign windows (one per priority per month, starting a week
    before the month) — point-in-range via the bucketed
    ``interval_join`` (equi-join on 10-day buckets + residual filter),
    never a nested-loop theta join."""
    from ..operators.joins import interval_join

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    epoch = F.lit("1970-01-01")
    months = (
        orders.select(
            "o_orderpriority",
            F.trunc(F.to_date("o_orderdate"), "mm").alias("m"),
        )
        .filter(F.year("m") == 1996)
        .distinct()
    )
    iv = (
        months.select(
            F.col("o_orderpriority").alias("prio"),
            F.date_sub("m", 7).alias("win_start"),
            F.date_add("m", 21).alias("win_end"),
        )
        .withColumn("s_day", F.datediff("win_start", epoch))
        .withColumn("e_day", F.datediff("win_end", epoch))
        .drop("win_end")
    )
    pts = li.filter(F.year(F.to_date("l_shipdate")) == 1996).select(
        F.datediff(F.to_date("l_shipdate"), epoch).alias("d_day")
    )
    joined = interval_join(pts, iv, "d_day", "s_day", "e_day", bucket_width=10)
    return joined.groupBy("prio", "win_start").agg(
        F.count(F.lit(1)).alias("n_shipments")
    )


ORACLE_RANGE_JOIN = """
WITH iv AS (
  SELECT DISTINCT o_orderpriority AS prio,
         CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE) AS m
  FROM orders
  WHERE year(CAST(o_orderdate AS DATE)) = 1996
), iv2 AS (
  SELECT prio,
         CAST(m - INTERVAL 7 DAY AS DATE) AS win_start,
         CAST(m + INTERVAL 21 DAY AS DATE) AS win_end
  FROM iv
), pts AS (
  SELECT CAST(l_shipdate AS DATE) AS d FROM lineitem
  WHERE year(CAST(l_shipdate AS DATE)) = 1996
)
SELECT prio, win_start, COUNT(*) AS n_shipments
FROM pts JOIN iv2 ON d >= win_start AND d < win_end
GROUP BY 1, 2
"""


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (melt) of the four lineitem measures, then a
    per-(flag, metric) decimal-exact rollup — the inverse of pivot and
    the standard reshape before generic per-metric processing. Spark's
    native ``unpivot`` plans as Expand (one scan, no join/union of N
    self-reads)."""
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="value",
    )
    return long.groupBy("l_returnflag", "metric").agg(
        dec_sum(F.col("value"), "total", scale=2)
    )


ORACLE_UNPIVOT = """
WITH long AS (
  SELECT l_returnflag, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT l_returnflag, 'l_tax', l_tax FROM lineitem
)
SELECT l_returnflag, metric,
       CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS total
FROM long GROUP BY 1, 2
"""


def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: customer-name pairs within edit distance 1 via
    symmetric-delete (SymSpell) blocking — equi-join on delete-1
    variants + exact levenshtein on candidates only, never the O(n²)
    cross join the naive form plans. Exact recall for the full
    Levenshtein metric (matches the oracle's unrestricted
    ``levenshtein <= 1`` predicate, indels included); keys keep
    all-but-one character so the constant ``Customer#`` prefix can't
    collapse the blocks (the failure the slice scheme had)."""
    from ..operators.dedup import fuzzy_pairs

    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1)


ORACLE_FUZZY = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""


def q_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over per-customer revenue within each
    market segment — the relative-standing window surface. Partitioned
    by segment (5 bounded partitions over pre-aggregated per-customer
    rows, not raw orders), totally ordered by (revenue, custkey)."""
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        orders.groupBy("o_custkey")
        .agg(dec_sum(F.col("o_totalprice"), "revenue"))
        .join(cust, orders.o_custkey == cust.c_custkey, "inner")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("revenue"), F.col("o_custkey")
    )
    return rev.select(
        "c_mktsegment",
        F.col("o_custkey").alias("custkey"),
        "revenue",
        # raw finals (round-7 sweep): percent_rank/cume_dist are
        # exact rank quotients — bit-identical across engines
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


ORACLE_PCT_RANK = """
WITH rev AS (
  SELECT o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
  FROM orders o GROUP BY 1
)
SELECT c.c_mktsegment, r.o_custkey AS custkey, r.revenue,
       percent_rank() OVER (PARTITION BY c.c_mktsegment
                                  ORDER BY r.revenue, r.o_custkey) AS pct_rank,
       cume_dist() OVER (PARTITION BY c.c_mktsegment
                               ORDER BY r.revenue, r.o_custkey) AS cume
FROM rev r JOIN customer c ON r.o_custkey = c.c_custkey
"""


def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history reconstructed from the raw event feed:
    each user's event_type stream collapses to versioned states with
    [valid_from, valid_to) intervals and an is_current flag — the
    'what was true WHEN the fact happened' table the reference's
    recreate-wholesale dims cannot answer. All windows are per-user
    (bounded), total order (ts, event_id)."""
    from ..operators.scd import scd2_history

    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    return scd2_history(
        ev, ["user_id"], ["event_type"], "ts", tiebreak=["event_id"]
    )


ORACLE_SCD2 = """
WITH ordered AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), versions AS (
  SELECT user_id, event_type, ts, event_id FROM ordered
  WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
)
SELECT user_id, event_type, ts AS valid_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
FROM versions
"""


def q_salted_skew_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation on a pathologically hot key:
    lineitem has only 3 return-flag values, so a plain groupBy sends
    ~1/3 of 100 TB to each of 3 reducers. ``salted_count`` sprays each
    flag across 16 deterministic salt buckets, partially aggregates,
    and re-combines — result identical to A1 ``agg_count`` (the oracle
    is a plain GROUP BY), plan is straggler-free. Mirrors the
    reference's 98%-one-country user skew (SURVEY.md §1.1)."""
    from ..operators.skew import salted_count

    li = _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    return salted_count(li, ["l_returnflag"], "l_orderkey", "n_items")


ORACLE_SALTED_COUNT = """
SELECT l_returnflag, COUNT(l_orderkey) AS n_items
FROM lineitem GROUP BY 1
"""


def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketed tables: orders and customer are
    both persisted bucketed+sorted on the customer key (8 buckets), so
    the join plans a sort-merge with ZERO Exchange on either side —
    the standard layout for a fact table joined on the same key by
    many recurring queries (`tests/test_scale_plans.py` asserts the
    no-Exchange plan). Result is oracle-identical to the plain join."""
    from ..operators.skew import bucketed_table, join_bucketed

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    bo = bucketed_table(spark, orders, f"orders_bkt_{tag}", "custkey")
    bc = bucketed_table(spark, cust, f"customer_bkt_{tag}", "custkey")
    return join_bucketed(bo, bc, "custkey").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dec_sum(F.col("o_totalprice"), "total_price"),
    )


ORACLE_BUCKETED_JOIN = """
SELECT c.c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two dim snapshots, each deterministically derived
    from ``customer`` (old: keys not ≡0 mod 7; new: keys not ≡0 mod 5,
    with acctbal bumped +100 on keys ≡0 mod 3 to simulate updates).
    The diff itself joins only (key, md5-digest) projections — ~40
    bytes/row through the shuffle no matter how wide the dim is."""
    from ..operators.cdc import snapshot_diff

    cust = _t(spark, sf_dir, "customer")
    old = cust.filter(F.col("c_custkey") % 7 != 0)
    new = cust.filter(F.col("c_custkey") % 5 != 0).withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 3 == 0, F.col("c_acctbal") + F.lit(100.0)
        ).otherwise(F.col("c_acctbal")),
    )
    return snapshot_diff(
        old, new, ["c_custkey"],
        ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )


ORACLE_SNAPSHOT_DIFF = """
WITH old AS (SELECT * FROM customer WHERE c_custkey % 7 <> 0),
new AS (
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 5 <> 0
)
SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
  CASE WHEN o.c_custkey IS NULL THEN 'insert'
       WHEN n.c_custkey IS NULL THEN 'delete'
       WHEN o.c_name IS NOT DISTINCT FROM n.c_name
        AND o.c_nationkey IS NOT DISTINCT FROM n.c_nationkey
        AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
        AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment
       THEN 'unchanged' ELSE 'update' END AS change_type
FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
"""


def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over a sparse per-user series:
    only 'purchase' events observe a value; every event row gets the
    user's last observed purchase value at that point in time. One
    bounded per-user window (running ``last(ignorenulls)``)."""
    from ..operators.timeseries import locf

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
    )
    return locf(
        ev, ["user_id"], ["ts", "event_id"], ["purchase_value"]
    ).select("user_id", "event_id", "ts", "purchase_value_filled")


ORACLE_LOCF = """
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
  last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS purchase_value_filled
FROM events
"""


def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic one-pass table profile of ``customer``: per column the
    row/null/distinct counts and min/max — the onboarding scan a new
    100 TB source gets before any modeling. Single aggregation job
    (multi-distinct via Expand), then a 1-row explode."""
    from ..operators.profile import profile_columns

    return profile_columns(
        _t(spark, sf_dir, "customer"),
        ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )


ORACLE_PROFILE = """
WITH src AS (SELECT * FROM customer)
SELECT 'c_custkey' AS "column", COUNT(*) AS n_rows,
  COUNT(*) - COUNT(c_custkey) AS n_nulls,
  COUNT(DISTINCT c_custkey) AS n_distinct,
  CAST(MIN(c_custkey) AS VARCHAR) AS min_value,
  CAST(MAX(c_custkey) AS VARCHAR) AS max_value FROM src
UNION ALL
SELECT 'c_name', COUNT(*), COUNT(*) - COUNT(c_name),
  COUNT(DISTINCT c_name), CAST(MIN(c_name) AS VARCHAR),
  CAST(MAX(c_name) AS VARCHAR) FROM src
UNION ALL
SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey),
  COUNT(DISTINCT c_nationkey), CAST(MIN(c_nationkey) AS VARCHAR),
  CAST(MAX(c_nationkey) AS VARCHAR) FROM src
UNION ALL
SELECT 'c_acctbal', COUNT(*), COUNT(*) - COUNT(c_acctbal),
  COUNT(DISTINCT c_acctbal), CAST(MIN(c_acctbal) AS VARCHAR),
  CAST(MAX(c_acctbal) AS VARCHAR) FROM src
UNION ALL
SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
  COUNT(DISTINCT c_mktsegment), CAST(MIN(c_mktsegment) AS VARCHAR),
  CAST(MAX(c_mktsegment) AS VARCHAR) FROM src
"""


def q_continuous_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: monthly revenue answered
    by RE-AGGREGATING a daily pre-aggregate (sum-of-sums over ≤31
    rows/month/key) instead of re-scanning the fact table — the only
    viable recurring-report shape at 100 TB. Decimal-exact
    accumulation at both grains makes rollup-of-rollup equal the
    direct monthly aggregate bit-for-bit, which the oracle (a direct
    monthly aggregate) checks."""
    from ..operators.rollup import reaggregate, time_rollup

    orders = _t(spark, sf_dir, "orders")
    daily = time_rollup(
        orders, "o_orderdate", "day", ["o_orderstatus"],
        {
            "revenue": F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double"),
            "n_orders": F.count(F.lit(1)).cast("bigint"),
        },
    )
    monthly = reaggregate(daily, "month", ["o_orderstatus"], ["revenue", "n_orders"])
    return monthly.select(
        F.col("bucket").alias("month"), "o_orderstatus", "revenue", "n_orders"
    )


ORACLE_CONTINUOUS_AGG = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month, o_orderstatus,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_orders
FROM orders GROUP BY 1, 2
"""


def q_hll_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-day DataSketches HLL sketches of
    o_custkey unioned up to monthly distinct-customer estimates.
    COUNT(DISTINCT) does not merge across pre-aggregated buckets; the
    sketch union is lossless over same-lgK sketches, so the monthly
    estimate equals sketching the raw month directly (asserted in
    tests/test_rollup.py). Rows-only driver check: DuckDB's HLL is a
    different implementation, so estimates are not cross-engine
    comparable."""
    from ..operators.rollup import hll_reaggregate, hll_rollup

    orders = _t(spark, sf_dir, "orders")
    daily = hll_rollup(orders, "o_orderdate", "day", [], "o_custkey")
    monthly = hll_reaggregate(daily, "month", [])
    return monthly.select(F.col("bucket").alias("month"), "approx_distinct")


def q_quantile_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE rollup: per-day equi-width histograms of
    o_totalprice (1000 buckets over [0, 500000) — width 500, the
    quantile error bound) merged up to monthly, then p50/p90/p99 per
    order priority read off the cumulative counts. Unlike
    ``approx_percentile`` this sketch is engine-portable, so the
    oracle recomputes the identical histogram directly from the facts
    in SQL — the hash-match PROVES the daily→monthly merge is lossless
    (counts sum exactly), the property that makes the rollup valid as
    a materialized view at 100 TB."""
    from ..operators.rollup import hist_quantiles, hist_reaggregate, hist_rollup

    orders = _t(spark, sf_dir, "orders")
    daily = hist_rollup(
        orders, "o_orderdate", "day", ["o_orderpriority"],
        "o_totalprice", 0.0, 500000.0, 1000,
    )
    monthly = hist_reaggregate(daily, "month", ["o_orderpriority"])
    est = hist_quantiles(
        monthly, ["o_orderpriority"], [0.5, 0.9, 0.99], 0.0, 500000.0, 1000
    )
    return est.select(
        F.to_date("bucket").alias("month"),
        "o_orderpriority",
        "q",
        F.col("est").alias("price_q"),
    )


ORACLE_QUANTILE_SKETCH = """
WITH h AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month, o_orderpriority,
         CAST(LEAST(GREATEST(FLOOR((CAST(o_totalprice AS DOUBLE) - 0.0) / 500000.0 * 1000), 0), 999) AS BIGINT) AS bidx,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2, 3
), c AS (
  SELECT month, o_orderpriority, bidx,
         SUM(cnt) OVER (PARTITION BY month, o_orderpriority ORDER BY bidx) AS cum,
         SUM(cnt) OVER (PARTITION BY month, o_orderpriority) AS tot
  FROM h
), qq AS (
  SELECT UNNEST([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q
), sel AS (
  SELECT month, o_orderpriority, q, MIN(bidx) AS bidx
  FROM c CROSS JOIN qq
  WHERE cum >= CEIL(q * tot)
  GROUP BY 1, 2, 3
)
SELECT month, o_orderpriority, q,
       0.0 + (bidx + 1) * 500000.0 / 1000 AS price_q
FROM sel
"""


def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over (o_custkey, o_totalprice), 8 bits/dim —
    the sort key ``zorder_layout`` clusters files by so parquet
    footer min/max prunes BOTH columns at once. The value computation
    is pure shifts over span-mapped grids, mirrored
    operation-for-operation by the SQL oracle; the layout's actual
    file-skipping win is asserted in tests/test_zorder.py."""
    from ..operators.layout import zorder_values

    orders = _t(spark, sf_dir, "orders")
    return zorder_values(
        orders.select("o_orderkey", "o_custkey", "o_totalprice"),
        ["o_custkey", "o_totalprice"],
        bits=8,
    ).select("o_orderkey", "zval")


def _oracle_zorder(bits: int = 8) -> str:
    def scale(v: str, lo: str, hi: str) -> str:
        return (
            f"CAST(CASE WHEN CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE) = 0.0 THEN 0 "
            f"ELSE FLOOR((CAST({v} AS DOUBLE) - CAST({lo} AS DOUBLE)) "
            f"/ (CAST({hi} AS DOUBLE) - CAST({lo} AS DOUBLE)) * {float(2**bits - 1)}) "
            f"END AS BIGINT)"
        )

    terms = []
    for b in range(bits):
        terms.append(f"(((gc >> {b}) & 1) << {b * 2})")
        terms.append(f"(((gp >> {b}) & 1) << {b * 2 + 1})")
    return f"""
WITH s AS (
  SELECT MIN(o_custkey) AS lo_c, MAX(o_custkey) AS hi_c,
         MIN(o_totalprice) AS lo_p, MAX(o_totalprice) AS hi_p
  FROM orders
), g AS (
  SELECT o_orderkey,
         {scale('o_custkey', 'lo_c', 'hi_c')} AS gc,
         {scale('o_totalprice', 'lo_p', 'hi_p')} AS gp
  FROM orders, s
)
SELECT o_orderkey, ({' | '.join(terms)}) AS zval FROM g
"""


def q_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch rollup: daily CMS of events.user_id (4×1024
    md5 counters) merged to monthly, then point-frequency estimates
    for users 1-10 read off the sketch — no fact re-scan. The oracle
    rebuilds the identical sketch DIRECTLY at month grain in SQL, so
    the hash-match proves the daily→monthly merge is lossless, the
    same property the histogram rollup proves for quantiles."""
    from ..operators.rollup import cms_estimate, cms_reaggregate, cms_rollup

    events = _t(spark, sf_dir, "events")
    daily = cms_rollup(events, "ts", "day", [], "user_id")
    monthly = cms_reaggregate(daily, "month", [])
    probes = spark.range(1, 11).select(F.col("id").alias("user_id"))
    est = cms_estimate(monthly, probes, [], "user_id")
    return est.select(
        F.to_date("bucket").alias("month"),
        F.col("user_id").cast("bigint").alias("user_id"),
        "est_count",
    )


ORACLE_CMS = """
WITH base AS (
  SELECT CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE) AS month,
         CAST(user_id AS VARCHAR) AS item
  FROM events
), r AS (
  SELECT month, item, i AS row_i FROM base, UNNEST([0, 1, 2, 3]) AS t(i)
), cms AS (
  SELECT month, row_i,
         CAST('0x' || substr(md5(CAST(row_i AS VARCHAR) || ':' || item), 1, 15) AS BIGINT) % 1024 AS col_j,
         COUNT(*) AS cnt
  FROM r GROUP BY 1, 2, 3
), probes AS (
  SELECT CAST(u AS VARCHAR) AS p FROM UNNEST([1, 2, 3, 4, 5, 6, 7, 8, 9, 10]) AS t(u)
), ph AS (
  SELECT p, i AS row_i,
         CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || p), 1, 15) AS BIGINT) % 1024 AS col_j
  FROM probes, UNNEST([0, 1, 2, 3]) AS t(i)
), est AS (
  SELECT c.month, ph.p, MIN(c.cnt) AS m, COUNT(*) AS nr
  FROM cms c JOIN ph ON c.row_i = ph.row_i AND c.col_j = ph.col_j
  GROUP BY 1, 2
)
SELECT month, CAST(p AS BIGINT) AS user_id,
       CAST(CASE WHEN nr < 4 THEN 0 ELSE m END AS BIGINT) AS est_count
FROM est
"""


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel over events: earliest view → first click
    strictly after it → first purchase strictly after that, counted
    per user. One shuffle however many steps (stacked same-partition
    conditional-min windows — see
    ``operators/timeseries.py::funnel_counts``)."""
    from ..operators.timeseries import funnel_counts

    events = _t(spark, sf_dir, "events")
    return funnel_counts(
        events, "user_id", "ts", "event_type", ["view", "click", "purchase"]
    )


ORACLE_FUNNEL = """
WITH t1 AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY 1
), t2 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > t1.t1
  GROUP BY 1
), t3 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > t2.t2
  GROUP BY 1
)
SELECT (SELECT COUNT(*) FROM t1) AS n_view,
       (SELECT COUNT(*) FROM t2) AS n_click,
       (SELECT COUNT(*) FROM t3) AS n_purchase
"""


def q_variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics over Spark 4's VARIANT type:
    ``parse_json`` once, ``try_variant_get`` typed paths — the
    shred-on-read shape that replaces string JSON re-parsing per
    expression. Malformed/missing paths yield NULL (try_ semantics)
    and drop out of the aggregates, mirroring SQL NULL discipline."""
    events = _t(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("bigint").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
    )


ORACLE_VARIANT = """
SELECT event_type,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1
"""


def q_lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:2016 / Spark 4 surface):
    top-3 orders per customer. Catalyst decorrelates the per-row
    subquery into a ranked join — no nested-loop re-execution per
    customer — the property that makes LATERAL usable at fact scale."""
    for name in ("orders", "customer"):
        _t(spark, sf_dir, name).createOrReplaceTempView(f"vl_{name}")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM vl_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM vl_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o
        """
    )


ORACLE_LATERAL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
) o
"""


def q_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization through Spark's BUILT-IN
    ``session_window`` aggregation (the engine-native twin of
    ``sessionize_events``' lag+cumsum form): one hash-aggregate over
    (user, dynamic session window), no per-user window sort in user
    code — the state merge is Catalyst's ``UpdatingSessionsExec``.

    Boundary semantics differ from the lag form by design:
    ``session_window`` closes a session when the gap is ``>=`` the
    30-min timeout (windows are [start, end) with end = last_ts + gap),
    while the lag form starts a new session only when the gap is
    strictly ``>``. The oracle mirrors the ``>=`` rule in exact
    microsecond integers.

    Scale: one shuffle on user_id, session state bounded by per-user
    event history — same argument as the streaming sessionizer.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("sw")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


ORACLE_SESSIONIZE_NATIVE = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                   - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
)
SELECT user_id,
       CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, session_id
"""


def q_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection on daily revenue, flagged
    with INTEGER-EXACT arithmetic so the boundary decision is
    bit-identical across engines: a day is anomalous when its revenue
    deviates from the trailing-7-day mean by more than 2 sigma —
    ``(n*x - S)^2 > 4*(n*SS - S^2)`` over integer cents (the algebraic
    form of ``(x-mu)^2 > (2*sigma)^2`` scaled by n^2), with n pinned
    to a full 7-day history. No floating-point sigma ever computed.

    Scale: the fact scan pre-aggregates to daily grain FIRST (one
    shuffle, ~365 rows/year); the trailing window then runs over the
    tiny daily frame — single-partition by design and bounded by
    calendar days, the same boundedness argument as
    ``rolling_7day_revenue``.
    """
    orders = _t(spark, sf_dir, "orders")
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("stat_date")
    ).agg(F.sum(cents).alias("rev_cents"))

    w = Window.orderBy("stat_date").rowsBetween(-7, -1)
    # decimal(18,0) carrier for the daily-cents factor (r6 capacity
    # audit): at the 100 TB grain daily cents reach ~9e14 — one decade
    # from the old decimal(15,0) ceiling; 18 digits restores three
    # decades, and the x·rev products stay within decimal(38,0)
    # (8.1e35 at 1000×-of-100TB). The DuckDB oracle runs the same
    # arithmetic in HUGEINT (exact 128-bit), so only this side needed
    # widening; outputs are integers/booleans, unchanged at test SF.
    st = daily.select(
        "stat_date",
        "rev_cents",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        F.sum("rev_cents").over(w).alias("s"),
        F.sum(
            F.col("rev_cents").cast("decimal(18,0)") * F.col("rev_cents")
        ).over(w).alias("ss"),
    )
    x = F.col("rev_cents").cast("decimal(18,0)")
    s = F.col("s").cast("decimal(25,0)")
    ss = F.col("ss")
    diff = (x * 7 - s).cast("decimal(19,0)")
    lhs = diff * diff
    rhs = (ss * 7 - (s * s).cast("decimal(38,0)")) * 4
    return st.select(
        "stat_date",
        "rev_cents",
        F.col("n_prior").cast("bigint").alias("n_prior"),
        ((F.col("n_prior") == 7) & (lhs > rhs)).alias("is_anomaly"),
    )


ORACLE_DAILY_ANOMALIES = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS stat_date,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS rev_cents
  FROM orders GROUP BY 1
), st AS (
  SELECT stat_date, rev_cents,
         COUNT(*) OVER w AS n_prior,
         SUM(CAST(rev_cents AS HUGEINT)) OVER w AS s,
         SUM(CAST(rev_cents AS HUGEINT) * rev_cents) OVER w AS ss
  FROM daily
  WINDOW w AS (ORDER BY stat_date ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT stat_date, CAST(rev_cents AS BIGINT) AS rev_cents,
       CAST(n_prior AS BIGINT) AS n_prior,
       (n_prior = 7 AND
        (7 * CAST(rev_cents AS HUGEINT) - s)
          * (7 * CAST(rev_cents AS HUGEINT) - s)
        > 4 * (7 * ss - s * s)) AS is_anomaly
FROM st
"""


def q_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB ``time_bucket_gapfill`` parity: per-priority daily
    order stats with EVERY calendar day present between each key's
    first and last active day — missing days appear with a zero count
    and the last known daily revenue carried forward (LOCF).

    Spark shape: pre-aggregate to daily grain, per-key min/max bounds,
    ``sequence() + explode`` builds the calendar spine distributed
    (never a driver-side date loop), left join actuals back, then one
    per-key ordered window for the carry-forward. The spine explode is
    bounded by days-per-key, the joins share the (key) partitioning,
    and nothing touches the driver — the same plan at any scale.
    """
    from ..operators.timeseries import locf

    orders = _t(spark, sf_dir, "orders")
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("stat_date"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(cents).alias("rev_cents"),
    )
    spine = (
        daily.groupBy("priority")
        .agg(F.min("stat_date").alias("d0"), F.max("stat_date").alias("d1"))
        .select(
            "priority",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("stat_date"),
        )
    )
    filled = spine.join(daily, ["priority", "stat_date"], "left")
    return locf(
        filled, ["priority"], ["stat_date"], ["rev_cents"]
    ).select(
        "priority",
        "stat_date",
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
        F.col("rev_cents_filled").alias("rev_cents_locf"),
    )


ORACLE_GAPFILL = """
WITH daily AS (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS stat_date,
         COUNT(*) AS n_orders,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS rev_cents
  FROM orders GROUP BY 1, 2
), b AS (
  SELECT priority, MIN(stat_date) AS d0, MAX(stat_date) AS d1
  FROM daily GROUP BY 1
), spine AS (
  SELECT priority,
         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS stat_date
  FROM b
), j AS (
  SELECT s.priority, s.stat_date,
         COALESCE(d.n_orders, 0) AS n_orders, d.rev_cents
  FROM spine s LEFT JOIN daily d
    ON s.priority = d.priority AND s.stat_date = d.stat_date
)
SELECT priority, stat_date, n_orders,
       CAST(last_value(rev_cents IGNORE NULLS) OVER (
         PARTITION BY priority ORDER BY stat_date
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS rev_cents_locf
FROM j
"""


def q_hopping_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) time-window aggregation through the engine's
    ``F.window(ts, windowDuration, slideDuration)``: 1-hour windows
    advancing every 15 minutes, so each event lands in exactly 4
    overlapping windows — the load-monitoring / rate-limiting shape
    streaming jobs use, here as its batch twin.

    Oracle mirrors the epoch-aligned window math explicitly: the 4
    window starts covering an event are ``bucket15(ts) − k·15min`` for
    k = 0..3 (µs-exact integer arithmetic).

    Scale: Catalyst expands each row to its 4 windows (an Expand,
    fan-out fixed at window/slide = 4) then one hash-aggregate —
    shuffle on (window), no window-function sort anywhere.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
        )
    )


ORACLE_HOPPING = """
WITH e AS (
  SELECT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
), x AS (
  SELECT user_id,
         (us - us % 900000000) - CAST(k AS BIGINT) * 900000000 AS start_us
  FROM e, unnest([0, 1, 2, 3]) AS t(k)
)
SELECT make_timestamp(start_us) AS window_start,
       make_timestamp(start_us + 3600000000) AS window_end,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM x GROUP BY start_us
"""


def q_hopping_windows_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for ``hopping_windows``: HLL
    ``approx_count_distinct`` partial-aggregates map-side, so the
    shuffle carries one sketch per (window, partition) instead of
    every (window, user) pair. Measured at the 100× probe: 8.7s vs
    85.3s exact — the distinct shuffle IS the exact form's bottleneck.
    Rows-only checked (estimates, by nature), like the other approx
    variants."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            "n_users_approx",
        )
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: customers grouped by first-order
    month, counted as retained in every later month they order again —
    the classic product-analytics cohort heatmap, exact distinct
    counts per (cohort_month, month_offset).

    Scale: first-order month is one aggregate over the fact keyed by
    customer; the join back is on the same key (co-partitioned), and
    the triangle aggregate is over (month × offset) — tiny output.
    Distinct counts shuffle once on (cohort, offset, custkey).
    """
    orders = _t(spark, sf_dir, "orders")
    mon = F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
    first = orders.groupBy("o_custkey").agg(F.min(mon).alias("m0"))
    return (
        orders.select("o_custkey", mon.alias("m"))
        .join(first, "o_custkey")
        .groupBy(
            F.make_date(
                (F.col("m0") / 12).cast("int"),
                F.col("m0") % 12 + 1,
                F.lit(1),
            ).alias("cohort_month"),
            (F.col("m") - F.col("m0")).cast("bigint").alias("month_offset"),
        )
        .agg(F.countDistinct("o_custkey").alias("n_customers"))
    )


ORACLE_COHORT = """
WITH o AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
  FROM orders
), f AS (
  SELECT o_custkey, MIN(m) AS m0 FROM o GROUP BY 1
)
SELECT make_date(CAST(m0 // 12 AS INT), CAST(m0 % 12 + 1 AS INT), 1)
         AS cohort_month,
       CAST(o.m - f.m0 AS BIGINT) AS month_offset,
       COUNT(DISTINCT o.o_custkey) AS n_customers
FROM o JOIN f ON o.o_custkey = f.o_custkey
GROUP BY 1, 2
"""


def q_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's ``value`` series
    (TimescaleDB ``time_weight('locf', …)`` parity): each observation
    holds until the next one, so the mean is
    ``Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_N−t_0)`` — integration in EXACT integer
    units (cents × microseconds; decimal accumulation), only the final
    ratio leaves integers, and IEEE division of identical integers is
    bit-identical across engines. Users with a single event carry no
    interval and are excluded (standard time_weight semantics).

    Scale: one shuffle on user_id for the lead() window, then a
    per-user aggregate — the same bounded per-entity-history argument
    as sessionization.
    """
    ev = _t(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t_us = F.unix_micros("ts")
    stepped = ev.select(
        "user_id",
        cents.alias("v_cents"),
        (F.lead(t_us, 1).over(w) - t_us).alias("dt_us"),
    )
    return (
        stepped.groupBy("user_id")
        .agg(
            F.sum(
                F.col("v_cents").cast("decimal(20,0)") * F.col("dt_us")
            ).alias("num"),
            F.sum("dt_us").alias("den"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .filter(F.col("den").isNotNull() & (F.col("den") > 0))
        .select(
            "user_id",
            "n_events",
            (
                F.col("num").cast("double") / F.col("den").cast("double")
            ).alias("twa_cents"),
        )
    )


ORACLE_TIME_WEIGHTED = """
WITH e AS (
  SELECT user_id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v_cents,
         epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
         lead(epoch_us(CAST(ts AS TIMESTAMP)), 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) - epoch_us(CAST(ts AS TIMESTAMP)) AS dt_us
  FROM events
), a AS (
  SELECT user_id,
         SUM(CAST(v_cents AS HUGEINT) * dt_us) AS num,
         SUM(dt_us) AS den,
         COUNT(*) AS n_events
  FROM e GROUP BY 1
)
SELECT user_id, n_events,
       CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS twa_cents
FROM a WHERE den IS NOT NULL AND den > 0
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive event
    types per user (the product-analytics "what do users do next"
    matrix), with each source type's transition share as an exact
    ratio of two bigint counts (single IEEE division — deterministic).

    Scale: one shuffle on user_id for the lead() window (bounded
    per-user history), then a tiny (type × type) aggregate; the share
    join is on the grouped frame, not the fact.
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type", 1).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    totals = trans.groupBy("src").agg(F.sum("n_trans").alias("n_src"))
    return trans.join(totals, "src").select(
        "src",
        "dst",
        "n_trans",
        (F.col("n_trans").cast("double") / F.col("n_src").cast("double"))
        .alias("share"),
    )


ORACLE_TRANSITIONS = """
WITH t AS (
  SELECT event_type AS src,
         lead(event_type, 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS dst
  FROM events
), c AS (
  SELECT src, dst, COUNT(*) AS n_trans
  FROM t WHERE dst IS NOT NULL GROUP BY 1, 2
)
SELECT src, dst, n_trans,
       CAST(n_trans AS DOUBLE)
         / CAST(SUM(n_trans) OVER (PARTITION BY src) AS DOUBLE) AS share
FROM c
"""


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent co-purchase pairs (market-basket support counts):
    parts appearing together in at least 2 orders, ordered pairs
    ``part_a < part_b`` so each pair counts once.

    Scale shape: distinct (order, part) FIRST (shrinks the self-join
    input), then an equi-self-join on the order key — both sides share
    the same partitioning, and fan-out is bounded by items-per-order
    squared (TPC-H ≤ 7 lines ⇒ ≤ 21 pairs/order), never a cross
    join. The support filter happens after one hash-aggregate on the
    pair. This is exactly how A-Priori's candidate-pair count runs on
    a cluster.

    The self-join carries an explicit MERGE hint: both sides are the
    SAME frame, so a broadcast can never be right — yet Catalyst's
    static estimate of the distinct's output undershoots and plans a
    BroadcastHashJoin, which the 100× scale probe demonstrated dying
    in ``notEnoughMemoryToBuildAndBroadcastTable``. Pinning sort-merge
    keeps the identical (correct) shape at every scale.
    """
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().hint("merge")
    a = op.alias("a")
    b = op.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("part_a"),
        F.col("b.l_partkey").alias("part_b"),
    )
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


ORACLE_COPURCHASE = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS n_orders
FROM op a JOIN op b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


def q_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares revenue trend per order priority (the
    ``regr_slope``/``regr_intercept`` surface) computed EXACTLY:
    x = day index (int), y = daily revenue cents (int), so every
    regression sum (Σx, Σy, Σxy, Σx²) is an exact integer and
    slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) is one IEEE division of
    two exact integers — bit-identical across engines, unlike the
    builtin regr_* aggregates whose double sums are order-dependent.

    Scale: daily pre-aggregate first (one shuffle); the regression
    sums are a second tiny aggregate per priority — a 5-row output
    regardless of fact size. Decimal(38,0) accumulators cannot
    overflow before ~1e38 cent-days.
    """
    orders = _t(spark, sf_dir, "orders")
    cents = (
        F.col("o_totalprice").cast("decimal(18,2)") * 100
    ).cast("bigint")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("stat_date"),
    ).agg(F.sum(cents).alias("y"))
    xy = daily.select(
        "priority",
        F.datediff("stat_date", F.lit("1992-01-01")).cast("long").alias("x"),
        "y",
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = xy.groupBy("priority").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * F.col("y")).alias("sxy"),
        F.sum(d("x") * F.col("x")).alias("sxx"),
    )
    num = sums["n"] * F.col("sxy") - F.col("sx") * F.col("sy")
    den = sums["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    # try_divide, not /: a single-day priority has den == 0, and ANSI
    # Spark raises DIVIDE_BY_ZERO where the DuckDB oracle yields NULL
    # (identical to / on every nonzero denominator)
    slope = F.try_divide(num.cast("double"), den.cast("double"))
    intercept = F.try_divide(
        F.col("sy").cast("double") - slope * F.col("sx").cast("double"),
        F.col("n").cast("double"),
    )
    return sums.select(
        "priority",
        F.col("n").cast("bigint").alias("n_days"),
        slope.alias("slope_cents_per_day"),
        intercept.alias("intercept_cents"),
    )


ORACLE_REVENUE_TREND = """
WITH daily AS (
  SELECT o_orderpriority AS priority,
         CAST(o_orderdate AS DATE) AS stat_date,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS y
  FROM orders GROUP BY 1, 2
), xy AS (
  SELECT priority,
         datediff('day', DATE '1992-01-01', stat_date) AS x, y
  FROM daily
), s AS (
  SELECT priority,
         COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx
  FROM xy GROUP BY 1
)
SELECT priority, CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day,
       (CAST(sy AS DOUBLE)
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept_cents
FROM s
"""


def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank over the co-purchase graph (edges =
    parts bought together, both directions): the "centrality" ranking
    a recommender seeds with. Iterative power iteration in FIXED-POINT
    integers (``operators/graph.py``) — promoted in round 7 from
    rows-only to a CELL-EXACT DuckDB oracle (``_oracle_pagerank``
    unrolls the same integer updates per iteration), so the whole
    power-iteration machinery is exactness-gated; the rank values are
    deterministic bit-for-bit across partitionings (property-tested).
    """
    from ..operators.graph import pagerank
    from ..operators.ranking import global_topk

    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().hint("merge")
    a, b = op.alias("a"), op.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") != F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    scores = pagerank(pairs, iterations=5).select(
        "node", F.col("rank").alias("score")
    )
    return global_topk(
        scores, [F.col("score").desc(), F.col("node").asc()], 20
    ).select("rank", F.col("node").alias("part"), "score")


def _oracle_pagerank(iterations: int = 5, dn: int = 850_000,
                     dd: int = 1_000_000) -> str:
    """DuckDB twin of ``operators/graph.py::pagerank`` on the
    co-purchase graph — the round-7 promotion of the whole
    power-iteration machinery from rows-only to a CELL-EXACT oracle
    (VERDICT r6 item 6). Possible because the Spark side is
    FIXED-POINT BIGINT end to end: every update is integer add /
    floor-div, so one unrolled CTE chain per iteration (the fixed
    iteration count makes recursion unnecessary) reproduces the rank
    vector bit-for-bit. HUGEINT carries the d-multiply exactly where
    Spark widens through DECIMAL(38,0); ``//`` on positive BIGINTs
    floors exactly like Spark's ``div``; the final BIGINT→DOUBLE cast
    and /1e18 are single correctly-rounded IEEE ops in both engines
    (1e18 is exactly representable)."""
    one = 10**18
    parts = [f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
),
out_deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         {one} // COUNT(*) AS base,
         CAST((CAST({dd - dn} AS HUGEINT) * ({one} // COUNT(*))) // {dd}
              AS BIGINT) AS teleport
  FROM nodes
),
r0 AS (SELECT node, CAST(t.base AS BIGINT) AS rank FROM nodes, t)"""]
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        parts.append(f""",
wd{i} AS (
  SELECT r.node, r.rank, d.deg
  FROM {p} r LEFT JOIN out_deg d ON d.src = r.node
),
dm{i} AS (
  SELECT CAST(COALESCE(SUM(rank), 0) AS BIGINT) AS dm
  FROM wd{i} WHERE deg IS NULL
),
inflow{i} AS (
  SELECT e.dst AS node, CAST(SUM(w.rank // w.deg) AS BIGINT) AS inflow
  FROM wd{i} w JOIN e ON e.src = w.node
  WHERE w.deg IS NOT NULL
  GROUP BY e.dst
),
r{i} AS (
  SELECT n.node,
         CAST(t.teleport
              + (CAST(COALESCE(i.inflow, 0) + (d.dm // t.n) AS HUGEINT)
                 * {dn}) // {dd} AS BIGINT) AS rank
  FROM nodes n LEFT JOIN inflow{i} i ON i.node = n.node, dm{i} d, t
)""")
    parts.append(f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, part ASC) AS BIGINT)
         AS rank,
       part, score
FROM (SELECT node AS part, CAST(rank AS DOUBLE) / 1e18 AS score
      FROM r{iterations})
ORDER BY score DESC, part ASC LIMIT 20
""")
    return "".join(parts)


def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution over customer names, composed
    entirely from existing operators: symmetric-delete-blocked fuzzy
    match (`fuzzy_pairs`, levenshtein ≤ 1, never a cross join) →
    connected components (`dedup_clusters`, iterative min-label) →
    one canonical record per entity (`dedup_keep_canonical`, a
    semi-join). The output is the resolved entity registry a
    downstream join uses instead of raw records.

    Output is the full member → entity mapping (every record labeled
    with its entity id and the entity's canonical name) — the lookup
    table a downstream join actually consumes. The oracle recomputes
    the same composition in SQL: levenshtein candidate pairs,
    recursive-CTE closure, min-root labels. (Delete-variant blocking
    has exact recall for the oracle's unrestricted levenshtein ≤ 1 —
    see `fuzzy_pairs`. The synthetic digit-substitution name space is
    densely connected — small diameter, so the min-label iteration
    converges in a handful of rounds.)
    """
    from ..operators.dedup import dedup_clusters, fuzzy_pairs

    cust = _t(spark, sf_dir, "customer")
    pairs = fuzzy_pairs(cust, "c_custkey", "c_name", max_dist=1)
    clusters = dedup_clusters(
        cust.select("c_custkey"), pairs, "c_custkey"
    )
    canon = cust.select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("entity_name"),
    )
    # canon is customer-scaled — shuffle-join on the entity key (no
    # forced broadcast; AQE may demote when the root set truly fits)
    return (
        clusters.withColumnRenamed("cluster_id", "entity_id")
        .join(canon, "entity_id")
        .select("c_custkey", "entity_id", "entity_name")
    )


ORACLE_ENTITY_RESOLUTION = """
WITH RECURSIVE p AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND levenshtein(a.c_name, b.c_name) <= 1
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM p
  UNION
  SELECT id_b AS src, id_a AS dst FROM p
), reach(root, id) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT r.root, e.dst FROM reach r JOIN edges e ON r.id = e.src
), cc AS (
  SELECT id AS c_custkey, MIN(root) AS entity_id FROM reach GROUP BY 1
)
SELECT cc.c_custkey, cc.entity_id, c.c_name AS entity_name
FROM cc JOIN customer c ON cc.entity_id = c.c_custkey
"""


def q_ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily revenue per
    order priority (1-day half-life, 15-day truncated lookback) in
    EXACT integer arithmetic — see operators/timeseries.py
    ``ewma_halflife_1d`` for the weight algebra and the overflow
    bound. The fact scan collapses to daily grain first (one shuffle);
    the EWMA itself is a ≤16-fan-out self-join of that dim-sized
    frame, co-partitioned on the key — identical cost profile at any
    fact scale."""
    from ..operators.timeseries import ewma_halflife_1d

    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("stat_date"),
    ).agg(F.sum(cents).alias("cents"))
    out = ewma_halflife_1d(
        daily, ["priority"], "stat_date", "cents", lookback_days=15
    )
    return out.select("priority", "stat_date", "ewma_cents")


ORACLE_EWMA = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS stat_date,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS cents
  FROM orders GROUP BY 1, 2
)
SELECT a.priority, a.stat_date,
       CAST(SUM(CAST(b.cents AS HUGEINT) * (CAST(1 AS BIGINT)
              << (15 - date_diff('day', b.stat_date, a.stat_date)))) AS DOUBLE)
       / CAST(SUM(CAST(1 AS BIGINT)
              << (15 - date_diff('day', b.stat_date, a.stat_date))) AS DOUBLE)
         AS ewma_cents
FROM daily a JOIN daily b
  ON a.priority = b.priority
 AND date_diff('day', b.stat_date, a.stat_date) BETWEEN 0 AND 15
GROUP BY 1, 2
"""


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrent sessions per calendar day: sessions
    come from the engine-native ``session_window`` aggregation (same
    30-min gap/[start, last+gap) bounds as ``sessionize_native``),
    then operators/timeseries.py ``peak_concurrency`` clips each
    session to its days, emits ±1 boundary deltas, and takes the max
    per-day running sum. All windows partition by day — never a
    global sort — and the session build is one shuffle on user_id."""
    from ..operators.timeseries import peak_concurrency

    ev = _t(spark, sf_dir, "events")
    sessions = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
        )
    )
    return peak_concurrency(sessions, "session_start", "session_end")


ORACLE_PEAK_CONCURRENCY = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                   - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
), s AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
), sess AS (
  SELECT CAST(MIN(ts) AS TIMESTAMP) AS s,
         CAST(MAX(ts) AS TIMESTAMP) + INTERVAL 30 MINUTE AS e
  FROM s GROUP BY user_id, session_id
), clipped AS (
  SELECT CAST(d.day AS DATE) AS day,
         greatest(s, CAST(CAST(d.day AS DATE) AS TIMESTAMP)) AS cs,
         least(e, CAST(CAST(d.day AS DATE) + 1 AS TIMESTAMP)) AS ce
  FROM sess,
       UNNEST(generate_series(CAST(s AS DATE), CAST(e AS DATE),
                              INTERVAL 1 DAY)) AS d(day)
), deltas AS (
  SELECT day, cs AS at, 1 AS delta FROM clipped
  UNION ALL
  SELECT day, ce AS at, -1 AS delta FROM clipped
), running AS (
  SELECT day, SUM(delta) OVER (PARTITION BY day ORDER BY at ASC, delta ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
  FROM deltas
)
SELECT day, CAST(MAX(open) AS BIGINT) AS peak_concurrent
FROM running GROUP BY day
"""


def q_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD-based robust outlier flags on daily revenue per order
    priority — the median/MAD twin of ``daily_anomalies``' mean/sigma
    test, immune to the outliers it is hunting. INTEGER-EXACT
    boundary: a day is anomalous when

        |cents - median| * 10000 > 44478 * MAD

    (3 × 1.4826 scaled by 10⁴ — no float ever computed). Medians are
    lower-medians selected by row_number under a total order, the
    same engine-agnostic rule as ``median_by_group``.

    Scale: daily grain first (one shuffle); two per-priority window
    passes over the dim-sized daily frame; the 5-row median/MAD
    frames broadcast back — bounded by |priority|, not by data."""
    orders = _t(spark, sf_dir, "orders")
    cents_expr = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("stat_date"),
    ).agg(F.sum(cents_expr).alias("cents"))

    def lower_median(df: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy("priority").orderBy(val, "stat_date")
        cw = Window.partitionBy("priority")
        ranked = df.select(
            "priority",
            F.col(val),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(cw).alias("cnt"),
        )
        return ranked.filter(
            F.col("rn") == F.floor((F.col("cnt") + 1) / 2).cast("int")
        ).select("priority", F.col(val).alias(out))

    med = lower_median(daily, "cents", "med")
    devs = daily.join(F.broadcast(med), "priority").select(
        "priority", "stat_date", "cents",
        F.abs(F.col("cents") - F.col("med")).alias("dev"), "med",
    )
    mad = lower_median(
        devs.select("priority", F.col("dev").alias("cents"), "stat_date"),
        "cents", "mad",
    )
    return devs.join(F.broadcast(mad), "priority").select(
        "priority", "stat_date", "cents", "med", "mad",
        (F.col("dev") * 10000 > F.col("mad") * 44478).alias("is_anomaly"),
    )


ORACLE_ROBUST_ANOMALIES = """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS stat_date,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
), medr AS (
  SELECT priority, cents,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY cents, stat_date) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS cnt
  FROM daily
), med AS (
  SELECT priority, cents AS med FROM medr
  WHERE rn = CAST(floor((cnt + 1) / 2) AS INT)
), devs AS (
  SELECT d.priority, d.stat_date, d.cents, abs(d.cents - m.med) AS dev, m.med
  FROM daily d JOIN med m USING (priority)
), madr AS (
  SELECT priority, dev,
         ROW_NUMBER() OVER (PARTITION BY priority ORDER BY dev, stat_date) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS cnt
  FROM devs
), mad AS (
  SELECT priority, dev AS mad FROM madr
  WHERE rn = CAST(floor((cnt + 1) / 2) AS INT)
)
SELECT d.priority, d.stat_date, d.cents, d.med, m.mad,
       (d.dev * 10000 > m.mad * 44478) AS is_anomaly
FROM devs d JOIN mad m USING (priority)
"""


def q_ab_test_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on a deterministic 50/50 user split
    (variant = user_id % 2; "conversion" = the user is an
    above-average buyer, ≥14 purchase events — a mere ≥1-purchase
    flag saturates on this synthetic corpus and degenerates the
    pooled variance). The statistic is a handful of IEEE ops over
    four exact integer counts — deterministic in any engine — rounded
    to 6 decimals like every float score in this engine; a degenerate
    pooled p ∈ {0, 1} yields NULL (the NULLIF contract), never a
    divide error. Scale: one shuffle to user grain (map-side partial
    agg), one to the 2-row variant grain; nothing else."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ) >= 14
        ).cast("int").alias("converted")
    )
    per_variant = per_user.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("variant")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    a = per_variant.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n0"), F.col("n_converted").alias("x0")
    )
    b = per_variant.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("n1"), F.col("n_converted").alias("x1")
    )
    # 1-row × 1-row cross join — scalar combine, nothing fact-scaled
    j = a.crossJoin(b)
    n0, x0 = F.col("n0").cast("double"), F.col("x0").cast("double")
    n1, x1 = F.col("n1").cast("double"), F.col("x1").cast("double")
    p = (x0 + x1) / (n0 + n1)
    se = F.sqrt(p * (1 - p) * (1 / n0 + 1 / n1))
    # when() short-circuits per branch, so a degenerate se=0 (pooled
    # p of exactly 0 or 1) yields NULL instead of an ANSI divide error
    z = F.when(se != 0, (x1 / n1 - x0 / n0) / se)
    return j.select(
        "n0", "x0", "n1", "x1",
        # raw final (round-7 sweep): fixed-order ops on exact counts
        z.alias("z_score"),
        (F.abs(z) > 1.959964).alias("significant_95"),
    )


ORACLE_AB_TEST = """
WITH per_user AS (
  SELECT user_id,
         CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 14
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY 1
), pv AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS variant,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY 1
), a AS (SELECT n_users AS n0, n_converted AS x0 FROM pv WHERE variant = 0),
   b AS (SELECT n_users AS n1, n_converted AS x1 FROM pv WHERE variant = 1),
z AS (
  SELECT n0, x0, n1, x1,
         (CAST(x1 AS DOUBLE) / n1 - CAST(x0 AS DOUBLE) / n0)
         / NULLIF(sqrt(((CAST(x0 AS DOUBLE) + x1) / (CAST(n0 AS DOUBLE) + n1))
                  * (1 - (CAST(x0 AS DOUBLE) + x1) / (CAST(n0 AS DOUBLE) + n1))
                  * (1.0 / n0 + 1.0 / n1)), 0) AS zval
  FROM a, b
)
SELECT n0, x0, n1, x1,
       zval AS z_score,
       abs(zval) > 1.959964 AS significant_95
FROM z
"""


def q_full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER reconciliation — the finance-closing query shape:
    daily order revenue vs daily purchase-event counts joined full
    outer on the date, each day tagged 'both' / 'orders_only' /
    'events_only'. Both sides are daily-grain aggregates (dim-sized
    however large the facts), so the full-outer shuffle is trivially
    bounded; the interesting part is the join type itself — the one
    core join kind the registry didn't yet exercise."""
    orders = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    o = orders.groupBy(F.to_date("o_orderdate").alias("stat_date")).agg(
        F.sum(cents).alias("rev_cents")
    )
    e = ev.filter(F.col("event_type") == "purchase").groupBy(
        F.to_date("ts").alias("stat_date")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
    j = o.join(e, "stat_date", "full_outer")
    status = (
        F.when(F.col("rev_cents").isNotNull() & F.col("n_purchases").isNotNull(), "both")
        .when(F.col("rev_cents").isNull(), "events_only")
        .otherwise("orders_only")
    )
    return j.select("stat_date", "rev_cents", "n_purchases", status.alias("status"))


ORACLE_FULL_OUTER = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS stat_date,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_cents
  FROM orders GROUP BY 1
), e AS (
  SELECT CAST(ts AS DATE) AS stat_date, CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT stat_date, CAST(rev_cents AS BIGINT) AS rev_cents, n_purchases,
       CASE WHEN rev_cents IS NOT NULL AND n_purchases IS NOT NULL THEN 'both'
            WHEN rev_cents IS NULL THEN 'events_only'
            ELSE 'orders_only' END AS status
FROM o FULL JOIN e USING (stat_date)
"""


def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram ($5,000 bins) of order value per
    priority — the ``width_bucket`` surface, computed with explicit
    ``floor()`` so the bin boundary is the one semantics every engine
    agrees on (the engine's int-division rule). One hash-aggregate;
    output bounded by |priority| × |bins|."""
    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    binned = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.floor(cents / F.lit(500000.0)).cast("bigint").alias("bin"),
    )
    return (
        binned.groupBy("priority", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .select(
            "priority", "bin",
            (F.col("bin") * 5000).cast("bigint").alias("bin_lo_dollars"),
            "n_orders",
        )
    )


ORACLE_HISTOGRAM = """
WITH binned AS (
  SELECT o_orderpriority AS priority,
         CAST(floor(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    / 500000.0) AS BIGINT) AS bin
  FROM orders
)
SELECT priority, bin, CAST(bin * 5000 AS BIGINT) AS bin_lo_dollars,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM binned GROUP BY 1, 2
"""


def q_copurchase_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth graph traversal: min hop distance (≤ 3) from a
    deterministic source part over the undirected co-purchase edge
    graph (edges = ``copurchase_pairs`` with support ≥ 2; source =
    lowest part id carrying an edge). Depth-3 BFS unrolls to three
    frontier⋈edges joins + one min-distance aggregate — no recursion
    primitive needed, and each join is frontier-sized, shuffled on
    the node key (the distributed-BFS building block the iterative
    PageRank/connected-components operators generalize).

    The DuckDB twin replays the same three expansions in plain SQL —
    the depth bound is what keeps the query engine-portable."""
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().hint("merge")
    a, bb = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("u", "v")
    )
    edges = pairs.unionAll(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # cache, not localCheckpoint: a lost checkpoint block cannot be
    # recomputed (lineage cut) — the 1000x minhash probe measured that
    # failure mode under memory pressure; cached blocks recompute.
    # Lifetime is battery-owned (selfcheck/bench clearCache per query)
    edges = edges.cache()  # three frontier expansions consume it
    src = edges.agg(F.min("u").alias("node"))
    n0 = src.select("node", F.lit(0).alias("dist"))
    n1 = edges.join(src.withColumnRenamed("node", "u"), "u").select(
        F.col("v").alias("node"), F.lit(1).alias("dist")
    ).distinct()
    n2 = edges.join(
        n1.select(F.col("node").alias("u")).distinct(), "u"
    ).select(F.col("v").alias("node"), F.lit(2).alias("dist")).distinct()
    n3 = edges.join(
        n2.select(F.col("node").alias("u")).distinct(), "u"
    ).select(F.col("v").alias("node"), F.lit(3).alias("dist")).distinct()
    return (
        n0.unionAll(n1).unionAll(n2).unionAll(n3)
        .groupBy("node")
        .agg(F.min("dist").cast("bigint").alias("hops"))
    )


ORACLE_COPURCHASE_REACH = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
src AS (SELECT MIN(u) AS node FROM edges),
n1 AS (SELECT DISTINCT e.v AS node FROM edges e JOIN src s ON e.u = s.node),
n2 AS (SELECT DISTINCT e.v AS node FROM edges e JOIN n1 ON e.u = n1.node),
n3 AS (SELECT DISTINCT e.v AS node FROM edges e JOIN n2 ON e.u = n2.node),
hops AS (
  SELECT node, 0 AS dist FROM src
  UNION ALL SELECT node, 1 FROM n1
  UNION ALL SELECT node, 2 FROM n2
  UNION ALL SELECT node, 3 FROM n3
)
SELECT node, CAST(MIN(dist) AS BIGINT) AS hops FROM hops GROUP BY node
"""


def q_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the query SCD2 history exists
    FOR: every purchase event enriched with the user's browsing state
    (last view/click/signup version) valid at the purchase instant.
    Composed as ``scd2_history`` over the state-change feed +
    ``asof_join`` on the version start: a version's validity interval
    [valid_from, valid_to) is exactly "latest valid_from at-or-before
    ts" because versions partition each user's timeline — so the
    lookup is one per-user window pass, never an inequality join.
    The version-opening ``event_id`` rides through the history as the
    as-of ``seq_col`` (backward: highest id wins), so two versions
    opening at the same instant resolve deterministically; the oracle
    mirrors by keeping only the max-event_id version per (user,
    valid_from). DuckDB verifies with a native ASOF join against the
    same history."""
    from ..operators.asof import asof_join
    from ..operators.scd import scd2_history

    ev = _t(spark, sf_dir, "events")
    state_feed = ev.filter(
        F.col("event_type").isin("view", "click", "signup")
    ).select("user_id", "event_type", "ts", "event_id")
    hist = scd2_history(
        state_feed,
        ["user_id"],
        ["event_type"],
        "ts",
        tiebreak=["event_id"],
        keep_cols=["event_id"],
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        "valid_from",
        "event_id",
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        purchases,
        hist,
        key="user_id",
        left_ts="ts",
        right_ts="valid_from",
        value_cols=["state", "valid_from"],
        seq_col="event_id",
        suffix="_at",
    ).select(
        "event_id", "user_id", "ts",
        F.col("state_at").alias("state"),
        F.col("valid_from_at").alias("state_since"),
    )


ORACLE_SCD2_ASOF = """
WITH feed AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id
  FROM events WHERE event_type IN ('view', 'click', 'signup')
), ordered AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM feed
), versions AS (
  SELECT user_id, event_type AS state, ts AS valid_from, event_id FROM ordered
  WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
), vdedup AS (
  SELECT user_id, state, valid_from FROM (
    SELECT user_id, state, valid_from,
           ROW_NUMBER() OVER (PARTITION BY user_id, valid_from
                              ORDER BY event_id DESC) AS vrn
    FROM versions)
  WHERE vrn = 1
), p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, v.state, v.valid_from AS state_since
FROM p ASOF LEFT JOIN vdedup v
  ON p.user_id = v.user_id AND v.valid_from <= p.ts
"""


def q_top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session opening paths: per 30-min-gap session, the first
    5 event types joined 'view>click>…', counted across all sessions
    (the product-analytics "common user journeys" query). Sessions
    come from the lag+cumsum form (same ``>`` boundary as
    ``sessionize_events``); within-session order is total
    (ts, event_id) and the path is built by ``sort_array`` over
    per-session structs — bounded at 5 elements, so the collect is
    O(1) per session however long the session. One shuffle to
    (user, session), one to the path counts, heap top-k."""
    ev = _t(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user))
    sessioned = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.sum(
            F.when(gap > 1800, 1).otherwise(0)
        ).over(w_user).alias("session_id"),
    )
    w_sess = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    first5 = sessioned.withColumn(
        "step", F.row_number().over(w_sess)
    ).filter(F.col("step") <= 5)
    paths = first5.groupBy("user_id", "session_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("step", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    agg = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    return global_topk(agg, [F.desc("n_sessions"), F.asc("path")], 10).select(
        "rank", "path", "n_sessions"
    )


ORACLE_TOP_PATHS = """
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch(CAST(ts AS TIMESTAMP))
                   - epoch(LAG(CAST(ts AS TIMESTAMP)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM g
), first5 AS (
  SELECT user_id, session_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                            ORDER BY ts, event_id) AS step
  FROM s QUALIFY step <= 5
), paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY step) AS path
  FROM first5 GROUP BY 1, 2
), agg AS (
  SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC) AS BIGINT)
         AS rank,
       path, n_sessions
FROM agg QUALIFY rank <= 10
"""


def q_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of variant (user_id % 2) ×
    event_type over the event counts — the categorical sibling of
    ``ab_test_zscores``. Observed/expected counts are exact integers/
    rationals; each cell's (O−E)²/E contribution is rounded to 9
    decimals and accumulated as DECIMAL (order-free — a raw double
    sum over shuffled cells would be partitioning-dependent), then
    the statistic rounds to 6. Cells are bounded (2 × |event types|),
    so every frame after the first aggregate is tiny."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("user_id") % 2).cast("bigint").alias("variant"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    row_tot = cells.groupBy("variant").agg(F.sum("o").alias("rt"))
    col_tot = cells.groupBy("event_type").agg(F.sum("o").alias("ct"))
    n_tot = cells.agg(F.sum("o").alias("n"))
    e = (
        F.col("rt").cast("double")
        * F.col("ct").cast("double")
        / F.col("n").cast("double")
    )
    d = F.col("o").cast("double") - e
    contrib = (
        cells.join(F.broadcast(row_tot), "variant")
        .join(F.broadcast(col_tot), "event_type")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "variant",
            "event_type",
            # d*d, never pow(d, 2): multiplication is IEEE-identical
            # everywhere, libm pow need not be.
            # decimal(27,9), not (18,9) (r6 capacity audit): a cell's
            # (O−E)²/E is Θ(N) under strong dependence, so the old
            # 10⁹ integer capacity sat level with a 1e9-event corpus;
            # 27 digits gives 10¹⁸ — six decades above the 100 TB
            # event count. Mirrored in the oracle.
            # floor-quantized nano-cell (round-7 sweep): d and e are
            # bit-identical doubles, so the 1e-9-unit integer floor is
            # engine-unambiguous; capacity unchanged (27 digits).
            # _floor_sat_safe, not a raw floor (round-8 review): the
            # cell is Θ(N·1e9) under strong dependence and Spark's
            # floor(DOUBLE) silently clamps to Long.MAX past 2^63 —
            # the DECIMAL(27,0) carrier was widened for exactly this
            # magnitude, but the raw floor would garbage it first.
            _floor_sat_safe(d * d / e * F.lit(1e9), "decimal(27,0)").alias(
                "cell_u"
            ),
        )
    )
    return contrib.agg(
        # raw final: exact integer sum scaled by one IEEE division
        (F.sum("cell_u").cast("double") / F.lit(1e9)).alias("chi2"),
        (
            (F.count_distinct("variant") - 1)
            * (F.count_distinct("event_type") - 1)
        ).cast("bigint").alias("dof"),
    )


ORACLE_CHI2 = """
WITH cells AS (
  SELECT CAST(user_id % 2 AS BIGINT) AS variant, event_type,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), rt AS (SELECT variant, SUM(o) AS rt FROM cells GROUP BY 1),
   ct AS (SELECT event_type, SUM(o) AS ct FROM cells GROUP BY 1),
   nt AS (SELECT SUM(o) AS n FROM cells),
contrib AS (
  SELECT variant, event_type,
         CAST(floor(
           (CAST(o AS DOUBLE)
              - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(nt.n AS DOUBLE))
           * (CAST(o AS DOUBLE)
              - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(nt.n AS DOUBLE))
           / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(nt.n AS DOUBLE))
           * 1e9) AS DECIMAL(27,0)) AS cell_u
  FROM cells JOIN rt USING (variant) JOIN ct USING (event_type), nt
)
SELECT CAST(SUM(cell_u) AS DOUBLE) / 1e9 AS chi2,
       CAST((COUNT(DISTINCT variant) - 1)
            * (COUNT(DISTINCT event_type) - 1) AS BIGINT) AS dof
FROM contrib
"""


def q_recursive_cte_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:1999 ``WITH RECURSIVE`` surface (new in Spark 4): the same
    3-hop min-distance BFS as ``copurchase_reach``, expressed with the
    recursion primitive instead of unrolled joins — and checked
    against the SAME oracle, so the two forms are proven equivalent.

    Scale note: recursive UNION ALL enumerates *paths* (bounded here
    by the depth-3 guard); the unrolled ``copurchase_reach`` with
    per-level DISTINCT frontiers is the 100 TB path — this query
    exists to cover the language surface and to pin the equivalence."""
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().hint("merge")
    a, bb = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("u", "v")
    )
    edges = pairs.unionAll(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # cache: each recursion step re-reads the edge view — without this
    # the whole distinct+self-join pipeline replays once per iteration.
    # cache, not localCheckpoint: a lost checkpoint block cannot be
    # recomputed (lineage cut, measured at the 1000x minhash probe);
    # lifetime is battery-owned (selfcheck/bench clearCache per query)
    edges.cache().createOrReplaceTempView("vr_edges")
    return spark.sql(
        """
        WITH RECURSIVE reach(node, dist) AS (
          SELECT MIN(u), 0 FROM vr_edges
          UNION ALL
          SELECT e.v, r.dist + 1
          FROM reach r JOIN vr_edges e ON e.u = r.node
          WHERE r.dist < 3
        )
        SELECT node, CAST(MIN(dist) AS BIGINT) AS hops
        FROM reach GROUP BY node
        """
    )


def q_multi_band_single_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS Q88 shape: eight time-band counts from ONE scan via
    conditional aggregation — the pattern that replaces eight
    self-joined subqueries (the spec's formulation) with a single
    pass. All-integer; output is one row however large the fact."""
    ev = _t(spark, sf_dir, "events")
    h = F.hour("ts")

    def band(lo: int, hi: int, name: str):
        return F.sum(
            F.when((h >= lo) & (h < hi) & (F.col("event_type") == "view"), 1)
            .otherwise(0)
        ).cast("bigint").alias(name)

    return ev.agg(
        *[
            band(lo, lo + 3, f"views_h{lo}_{lo + 3}")
            for lo in (0, 3, 6, 9, 12, 15, 18, 21)
        ]
    )


ORACLE_MULTI_BAND = """
SELECT
  CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 0 AND hour(CAST(ts AS TIMESTAMP)) < 3 AND event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views_h0_3,
  CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 3 AND hour(CAST(ts AS TIMESTAMP)) < 6 AND event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views_h3_6,
  CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 6 AND hour(CAST(ts AS TIMESTAMP)) < 9 AND event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views_h6_9,
  CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 9 AND hour(CAST(ts AS TIMESTAMP)) < 12 AND event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views_h9_12,
  CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 12 AND hour(CAST(ts AS TIMESTAMP)) < 15 AND event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views_h12_15,
  CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 15 AND hour(CAST(ts AS TIMESTAMP)) < 18 AND event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views_h15_18,
  CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 18 AND hour(CAST(ts AS TIMESTAMP)) < 21 AND event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views_h18_21,
  CAST(SUM(CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 21 AND hour(CAST(ts AS TIMESTAMP)) < 24 AND event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views_h21_24
FROM events
"""


def q_approx_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based heavy hitters via Spark 4's ``approx_top_k`` —
    the mergeable-summary twin of the exact ``token_frequencies``:
    per-partition sketches partial-aggregate map-side, the shuffle
    carries one sketch per partition instead of one row per distinct
    token (the 100 TB shape when the token vocabulary explodes).
    Rows-only by nature (sketch contents are partitioning-dependent in
    principle); ``tests/test_approx_topk.py`` pins exact agreement
    with true counts on this corpus's skew."""
    from ..operators.text import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(tokens("text")).alias("token"))
    out = tok.agg(F.expr("approx_top_k(token, 10)").alias("tk"))
    return out.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("token"), F.col("e.count").cast("bigint").alias("n")
    )


def q_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collation surface: case-insensitive grouping via
    ``COLLATE UTF8_LCASE`` on the comparison itself — no lower()
    normalization in the grouping expression. Input case is
    deterministically mixed first (upper for even part keys) so the
    collation actually has work to do. The emitted key is lowercased
    because the collated group's representative is
    partitioning-dependent (first row wins); DuckDB verifies with the
    lower() twin — same groups, same counts."""
    part = _t(spark, sf_dir, "part")
    mixed = F.when(
        F.col("p_partkey") % 2 == 0, F.upper("p_type")
    ).otherwise(F.lower("p_type"))
    return (
        part.select(mixed.alias("t"))
        .groupBy(F.collate("t", "UTF8_LCASE").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .select(F.lower("k").alias("part_type"), "n_parts")
    )


ORACLE_COLLATION = """
WITH mixed AS (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
              ELSE lower(p_type) END AS t
  FROM part
)
SELECT lower(t) AS part_type, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM mixed GROUP BY lower(t)
"""


def q_null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): the join
    kind where NULL keys MATCH each other instead of vanishing.
    Orders with the urgent priority nulled out join a 6-row key dim
    (5 priorities + NULL) — the NULL row picks up every nulled order,
    which a plain ``=`` join would silently drop. Null-safe equality
    still hash-partitions both sides (NULL hashes like a value), so
    the plan is an ordinary shuffle/broadcast hash join — not the
    cross-join degeneration a ``coalesce()``-wrapped key would risk
    reviewers assuming."""
    orders = _t(spark, sf_dir, "orders")
    fact = orders.select(
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("k"),
        "o_orderkey",
    )
    dim = (
        orders.select(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("k")
        )
        .distinct()
        .select("k", F.coalesce(F.col("k"), F.lit("(was urgent)")).alias("label"))
    )
    j = fact.join(F.broadcast(dim), fact["k"].eqNullSafe(dim["k"]), "inner")
    return j.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )


ORACLE_NULL_SAFE = """
WITH fact AS (
  SELECT NULLIF(o_orderpriority, '1-URGENT') AS k, o_orderkey FROM orders
), dim AS (
  SELECT k, COALESCE(k, '(was urgent)') AS label
  FROM (SELECT DISTINCT NULLIF(o_orderpriority, '1-URGENT') AS k FROM orders)
)
SELECT d.label, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM fact f JOIN dim d ON f.k IS NOT DISTINCT FROM d.k
GROUP BY d.label
"""


def q_second_highest_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``nth_value`` window surface: per month, the second-highest
    daily revenue (the runner-up day) attached to every day's row via
    an unbounded frame — with total order (revenue DESC, date) so the
    runner-up is unique. Windows partition by month (bounded ≤31
    rows after the daily pre-aggregation)."""
    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("stat_date")).agg(
        F.sum(cents).alias("rev_cents")
    )
    w = (
        Window.partitionBy(F.trunc("stat_date", "month"))
        .orderBy(F.desc("rev_cents"), F.asc("stat_date"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return daily.select(
        "stat_date",
        "rev_cents",
        F.nth_value("rev_cents", 2).over(w).alias("runner_up_cents"),
        F.nth_value("stat_date", 2).over(w).alias("runner_up_date"),
    )


ORACLE_NTH_VALUE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS stat_date,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY 1
)
SELECT stat_date, rev_cents,
       nth_value(rev_cents, 2) OVER w AS runner_up_cents,
       nth_value(stat_date, 2) OVER w AS runner_up_date
FROM daily
WINDOW w AS (PARTITION BY date_trunc('month', stat_date)
             ORDER BY rev_cents DESC, stat_date ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting over the co-purchase graph — the
    classic graph-benchmark op: edges canonicalized u < v, wedges by
    joining edges on the shared middle vertex, each wedge closed by an
    existence join against the edge set. Every triangle (u<v<w) is
    produced exactly once (u<v from e1, v<w from e2, closing edge
    (u,w) checked), so the count needs no /3 correction.

    Scale shape: two shuffled equi-joins on vertex keys over the
    support-filtered edge list; wedge fan-out is Σ deg(v)² — the
    standard bound, and exactly why triangle counting is run on the
    FILTERED (support ≥ 2) graph rather than raw pairs. Output: one
    row."""
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().hint("merge")
    a, bb = op.alias("a"), op.alias("b")
    edges = (
        a.join(
            bb,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("u", "v")
    )
    # cache, not localCheckpoint: lost checkpoint blocks cannot be
    # recomputed (lineage cut); lifetime is battery-owned (clearCache)
    edges = edges.cache()
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("wu"), F.col("e1.v").alias("wv"), F.col("e2.v").alias("ww")
    )
    tri = wedges.join(
        e3,
        (F.col("wu") == F.col("e3.u")) & (F.col("ww") == F.col("e3.v")),
        "left_semi",
    )
    return tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


ORACLE_TRIANGLES = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.v = e2.u
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
"""


def q_check_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness report (``operators/validation.py::
    check_unique`` as a 1-row query): lineitem's true PK
    (l_orderkey, l_linenumber) must be collision-free while
    l_orderkey alone collides by design — both audited in one result
    so the oracle checks the violating AND the clean case."""
    li = _t(spark, sf_dir, "lineitem")

    def report(keys: list[str], prefix: str):
        g = li.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
        return g.agg(
            F.count(F.lit(1)).cast("bigint").alias(f"{prefix}_distinct"),
            F.count(F.when(F.col("n") > 1, 1)).cast("bigint").alias(
                f"{prefix}_dup_keys"
            ),
        )

    pk = report(["l_orderkey", "l_linenumber"], "pk")
    ok = report(["l_orderkey"], "orderkey")
    return pk.crossJoin(ok)


ORACLE_CHECK_UNIQUE = """
WITH pk AS (
  SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber
), ok AS (
  SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
), pkr AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS pk_distinct,
         CAST(COUNT(CASE WHEN n > 1 THEN 1 END) AS BIGINT) AS pk_dup_keys
  FROM pk
), okr AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orderkey_distinct,
         CAST(COUNT(CASE WHEN n > 1 THEN 1 END) AS BIGINT) AS orderkey_dup_keys
  FROM ok
)
SELECT * FROM pkr, okr
"""


def q_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operators (INTERSECT ALL / EXCEPT ALL —
    SQL:1999, multiplicity-preserving): order priorities of even vs
    odd order keys compared as MULTISETS. ``INTERSECT ALL`` keeps
    min(m_a, m_b) copies per value and ``EXCEPT ALL`` max(0, m_a−m_b)
    — the row-level dedup the plain INTERSECT/EXCEPT pair can't
    express. Results aggregate to counts per priority so the output
    is order-free."""
    orders = _t(spark, sf_dir, "orders")
    for half, pred in (("even", "o_orderkey % 2 = 0"), ("odd", "o_orderkey % 2 = 1")):
        orders.filter(pred).select("o_orderpriority").createOrReplaceTempView(
            f"vb_{half}"
        )
    return spark.sql(
        """
        SELECT 'intersect_all' AS op, o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT * FROM vb_even INTERSECT ALL SELECT * FROM vb_odd)
        GROUP BY 2
        UNION ALL
        SELECT 'except_all', o_orderpriority, CAST(COUNT(*) AS BIGINT)
        FROM (SELECT * FROM vb_even EXCEPT ALL SELECT * FROM vb_odd)
        GROUP BY 2
        """
    )


ORACLE_BAG_SET_OPS = """
WITH even AS (SELECT o_orderpriority FROM orders WHERE o_orderkey % 2 = 0),
     odd  AS (SELECT o_orderpriority FROM orders WHERE o_orderkey % 2 = 1)
SELECT 'intersect_all' AS op, o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT * FROM even INTERSECT ALL SELECT * FROM odd)
GROUP BY 2
UNION ALL
SELECT 'except_all', o_orderpriority, CAST(COUNT(*) AS BIGINT)
FROM (SELECT * FROM even EXCEPT ALL SELECT * FROM odd)
GROUP BY 2
"""


def q_gaps_and_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: collapse each user's active DAYS into
    contiguous [streak_start, streak_end] runs (the classic
    ``day − row_number()`` grouping — consecutive days share one
    anchor). Per-user windows over the distinct-day frame (bounded by
    calendar days), one shuffle on user_id; the canonical streak /
    uptime / coverage-range operator."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = days.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    return anchored.groupBy("user_id", "anchor").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    ).select("user_id", "streak_start", "streak_end", "n_days")


ORACLE_GAPS_ISLANDS = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), anchored AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INT)
           AS anchor
  FROM days
)
SELECT user_id, MIN(day) AS streak_start, MAX(day) AS streak_end,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM anchored GROUP BY user_id, anchor
"""


def q_cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day WITHOUT a running
    countDistinct: each user contributes on their FIRST-SEEN day only
    (one per-user min), then a daily count + running sum over the
    daily frame. The running-distinct that naively needs
    O(users) window state becomes two dim-sized aggregates — the
    standard growth-curve trick. The final window orders the ≤|days|
    daily rows — bounded by calendar, not data."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day")
    )
    per_day = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


ORACLE_CUMULATIVE_USERS = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1
), per_day AS (
  SELECT first_day AS day, COUNT(*) AS new_users FROM first_seen GROUP BY 1
)
SELECT day, CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM per_day
"""


def q_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATIO_TO_REPORT parity (Oracle/Teradata's window idiom): each
    nation's revenue share of its region, as a window sum over the
    nation-grain aggregate — the share computes WITHOUT a second
    aggregate+join. Integer cents to the very last division; the
    window partitions by region over ≤25 nation rows."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    per_nation = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.sum(cents).alias("rev_cents"))
    )
    w = Window.partitionBy("n_regionkey")
    return per_nation.select(
        F.col("n_regionkey").cast("bigint").alias("region_key"),
        F.col("n_name").alias("nation"),
        "rev_cents",
        # raw final (round-7 sweep): one quotient of exact bigints
        (
            F.col("rev_cents").cast("double")
            / F.sum("rev_cents").over(w).cast("double")
        ).alias("share_of_region"),
    )


ORACLE_RATIO_TO_REPORT = """
WITH per_nation AS (
  SELECT n.n_regionkey, n.n_name,
         SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS rev_cents
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT CAST(n_regionkey AS BIGINT) AS region_key, n_name AS nation,
       CAST(rev_cents AS BIGINT) AS rev_cents,
       CAST(rev_cents AS DOUBLE)
             / CAST(SUM(rev_cents) OVER (PARTITION BY n_regionkey) AS DOUBLE)
             AS share_of_region
FROM per_nation
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the ML-ops drift gate: order-value
    distribution of 1998+ orders vs the 1995-97 baseline over ten
    $50k bins, PSI = Σ (p−q)·ln(p/q). Zero-count bins get the
    standard ε = 1e-6 floor so the log stays finite. Per-bin
    contributions round to 9 decimals and sum as DECIMAL (order-free);
    p and q are exact integer-count ratios. One scan builds both
    distributions (conditional counts), the rest is 10-row math.
    PSI > 0.2 is the conventional retrain trigger."""
    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    is_new = F.to_date("o_orderdate") >= F.lit("1998-01-01")
    binned = orders.select(
        F.least(F.lit(9), F.floor(cents / F.lit(5000000.0)).cast("int")).alias("bin"),
        is_new.alias("is_new"),
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.when(~F.col("is_new"), 1)).alias("n_base"),
        F.count(F.when(F.col("is_new"), 1)).alias("n_new"),
    )
    tot = cells.agg(
        F.sum("n_base").alias("t_base"), F.sum("n_new").alias("t_new")
    )
    eps = F.lit(1e-6)
    withp = cells.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_base",
        "n_new",
        # try_divide: a corpus entirely inside one era has t_base or
        # t_new == 0 — ANSI raises, while the oracle's NULL ratio is
        # absorbed by greatest (BOTH engines' greatest skip NULLs), so
        # the empty side floors to eps in both
        F.greatest(
            eps,
            F.try_divide(
                F.col("n_base").cast("double"), F.col("t_base").cast("double")
            ),
        ).alias("q"),
        F.greatest(
            eps,
            F.try_divide(
                F.col("n_new").cast("double"), F.col("t_new").cast("double")
            ),
        ).alias("p"),
    )
    # floor-quantized nano-cell (round-7 sweep): ln is libm, so the
    # 1e-9-unit integer floor is the engine-unambiguous quantizer;
    # finals are raw fixed-order expressions over the exact sum
    contrib = withp.select(
        "bin", "n_base", "n_new",
        F.floor(
            (F.col("p") - F.col("q"))
            * F.log(F.col("p") / F.col("q"))
            * F.lit(1e9)
        )
        .cast("decimal(19,0)")
        .alias("cell_u"),
    )
    return contrib.agg(
        (F.sum("cell_u").cast("double") / F.lit(1e9)).alias("psi"),
        ((F.sum("cell_u").cast("double") / F.lit(1e9)) > 0.2).alias(
            "drifted"
        ),
    )


ORACLE_PSI = """
WITH binned AS (
  SELECT least(9, CAST(floor(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                             / 5000000.0) AS INT)) AS bin,
         CAST(o_orderdate AS DATE) >= DATE '1998-01-01' AS is_new
  FROM orders
), cells AS (
  SELECT bin,
         COUNT(CASE WHEN NOT is_new THEN 1 END) AS n_base,
         COUNT(CASE WHEN is_new THEN 1 END) AS n_new
  FROM binned GROUP BY 1
), tot AS (SELECT SUM(n_base) AS t_base, SUM(n_new) AS t_new FROM cells),
withp AS (
  SELECT bin,
         greatest(1e-6, CAST(n_base AS DOUBLE) / CAST(t_base AS DOUBLE)) AS q,
         greatest(1e-6, CAST(n_new AS DOUBLE) / CAST(t_new AS DOUBLE)) AS p
  FROM cells, tot
), contrib AS (
  SELECT CAST(floor((p - q) * ln(p / q) * 1e9) AS DECIMAL(19,0)) AS cell_u
  FROM withp
)
SELECT CAST(SUM(cell_u) AS DOUBLE) / 1e9 AS psi,
       (CAST(SUM(cell_u) AS DOUBLE) / 1e9) > 0.2 AS drifted
FROM contrib
"""


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per return flag: prices clipped to
    the group's exact [p05, p95] (nearest-rank-lower percentiles by
    row_number under a total order — the engine's deterministic
    percentile rule), then integer-cent sums → the outlier-insensitive
    mean every reporting stack wants next to the raw one. Two window
    passes + the usual broadcast of the |flags|-row bounds frame.

    Scale note: the rank pass sorts the fact within |returnflag| = 3
    partitions — the same parallelism ceiling as exact
    ``revenue_percentiles``, accepted for the same reason (exact,
    oracle-checkable bounds). The 100 TB path swaps the ranked bounds
    for ``percentile_approx(cents, [0.05, 0.95])`` — one pass, no
    per-group sort — mirroring ``revenue_percentiles_approx``."""
    li = _t(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    base = li.select(
        "l_returnflag", cents.alias("cents"), "l_orderkey", "l_linenumber"
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    cw = Window.partitionBy("l_returnflag")
    ranked = base.select(
        "l_returnflag", "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cw).alias("cnt"),
    )
    lo_rank = F.greatest(F.lit(1), F.floor(F.col("cnt") * 0.05).cast("int"))
    hi_rank = F.greatest(F.lit(1), F.floor(F.col("cnt") * 0.95).cast("int"))
    bounds = (
        ranked.filter((F.col("rn") == lo_rank) | (F.col("rn") == hi_rank))
        .groupBy("l_returnflag")
        .agg(F.min("cents").alias("p05"), F.max("cents").alias("p95"))
    )
    clipped = base.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        F.least(F.col("p95"), F.greatest(F.col("p05"), F.col("cents"))).alias("c"),
    )
    return clipped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("c").cast("bigint").alias("winsorized_cents"),
        (
            F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("winsorized_mean_cents"),
    )


ORACLE_WINSORIZED = """
WITH base AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         l_orderkey, l_linenumber
  FROM lineitem
), ranked AS (
  SELECT l_returnflag, cents,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY cents, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
  FROM base
), bounds AS (
  SELECT l_returnflag, MIN(cents) AS p05, MAX(cents) AS p95
  FROM ranked
  WHERE rn = greatest(1, CAST(floor(cnt * 0.05) AS INT))
     OR rn = greatest(1, CAST(floor(cnt * 0.95) AS INT))
  GROUP BY 1
), clipped AS (
  SELECT b.l_returnflag, least(p95, greatest(p05, cents)) AS c
  FROM base b JOIN bounds USING (l_returnflag)
)
SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(c) AS BIGINT) AS winsorized_cents,
       CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS winsorized_mean_cents
FROM clipped GROUP BY 1
"""


def q_winsorized_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``winsorized_stats``: clip bounds from
    ``percentile_approx`` (GK sketch — one pass, partial-aggregated
    map-side, no per-group fact sort), everything after the bounds
    identical. Rows-only by nature (sketch merge order can shift a
    bound by its ε); ``tests/test_winsorized_approx.py`` pins the
    approx mean within tolerance of the exact one."""
    li = _t(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    base = li.select("l_returnflag", cents.alias("cents"))
    bounds = base.groupBy("l_returnflag").agg(
        F.percentile_approx("cents", 0.05, 10000).alias("p05"),
        F.percentile_approx("cents", 0.95, 10000).alias("p95"),
    )
    clipped = base.join(F.broadcast(bounds), "l_returnflag").select(
        "l_returnflag",
        F.least(F.col("p95"), F.greatest(F.col("p05"), F.col("cents"))).alias("c"),
    )
    return clipped.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.sum("c").cast("bigint").alias("winsorized_cents"),
        (
            F.sum("c").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("winsorized_mean_cents"),
    )


def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals — the classic fraud
    screen: observed first-significant-digit shares vs log10(1+1/d)
    expectations, with the absolute deviation per digit. Digit
    extraction is pure string ops on the decimal rendering (no float
    log on the data path); expected shares are 9 double constants.
    Synthetic TPC-H prices are uniform-ish, so the audit FLAGS them —
    which is the point: the query detects non-Benford data."""
    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").alias("t"))
    import math

    expected = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(round(math.log10(1 + 1 / d), 9)))
        ]
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            # raw quotient (round-7 sweep) — bit-identical both engines
            (F.col("n").cast("double") / F.col("t").cast("double")).alias(
                "observed_share"
            ),
            expected[F.col("digit")].alias("benford_share"),
        )
        .select(
            "digit", "n", "observed_share", "benford_share",
            F.abs(
                F.col("observed_share") - F.col("benford_share")
            ).alias("abs_deviation"),
        )
    )


def _oracle_benford() -> str:
    import math

    pairs = ", ".join(
        f"({d}, {round(math.log10(1 + 1 / d), 9)})" for d in range(1, 10)
    )
    return f"""
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS VARCHAR), 1, 1) AS INT) AS digit,
         COUNT(*) AS n
  FROM orders GROUP BY 1
), tot AS (SELECT SUM(n) AS t FROM counts),
expected(digit, benford_share) AS (VALUES {pairs})
SELECT c.digit, CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) / CAST(t AS DOUBLE) AS observed_share,
       e.benford_share,
       abs(CAST(c.n AS DOUBLE) / CAST(t AS DOUBLE)
           - e.benford_share) AS abs_deviation
FROM counts c JOIN expected e USING (digit), tot
"""


def q_ma_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average crossover signals (the golden-cross shape) on
    daily revenue, INTEGER-EXACT: short (7-day) vs long (28-day)
    trailing means compared as ``28·S_short·n_long > 7·S_long·n_short``
    — cross-multiplied integer sums, no float mean ever. A signal
    fires on days where the short side is above AND was not above the
    previous day (the crossing, not the state). Windows run over the
    daily-grain frame (bounded by calendar), counts pinned so partial
    windows at the series head never fire."""
    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(cents).alias("c")
    )
    w7 = Window.orderBy("d").rowsBetween(-6, 0)
    w28 = Window.orderBy("d").rowsBetween(-27, 0)
    st = daily.select(
        "d", "c",
        F.sum("c").over(w7).alias("s7"),
        F.count(F.lit(1)).over(w7).alias("n7"),
        F.sum("c").over(w28).alias("s28"),
        F.count(F.lit(1)).over(w28).alias("n28"),
    )
    # above ⇔ s7/n7 > s28/n28 ⇔ s7·n28 > s28·n7 (all positive ints).
    # decimal(25,0) carriers for the cross-multiply (r6 capacity
    # audit): the BIGINT product s28·n7 reaches ~1.8e17 at the 100 TB
    # grain — under two decades from the int64 ceiling; decimal gives
    # exact comparison to 10³⁸. DuckDB's windowed SUM(BIGINT) is
    # already HUGEINT, so the oracle needs no change and the boolean
    # is unchanged at every SF.
    above = (F.col("n28") == 28) & (
        F.col("s7").cast("decimal(25,0)") * F.col("n28")
        > F.col("s28").cast("decimal(25,0)") * F.col("n7")
    )
    w1 = Window.orderBy("d")
    flagged = st.select(
        "d", "c", above.alias("above"),
        F.lag(above.cast("int"), 1, 0).over(w1).alias("prev_above"),
    )
    return flagged.select(
        F.col("d").alias("stat_date"),
        F.col("c").alias("rev_cents"),
        "above",
        (F.col("above") & (F.col("prev_above") == 0)).alias("golden_cross"),
    )


ORACLE_MA_CROSSOVER = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS c
  FROM orders GROUP BY 1
), st AS (
  SELECT d, c,
         SUM(c) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS s7,
         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS n7,
         SUM(c) OVER (ORDER BY d ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS s28,
         COUNT(*) OVER (ORDER BY d ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS n28
  FROM daily
), flagged AS (
  SELECT d, c,
         (n28 = 28 AND s7 * n28 > s28 * n7) AS above,
         COALESCE(LAG(CAST(n28 = 28 AND s7 * n28 > s28 * n7 AS INT), 1)
                  OVER (ORDER BY d), 0) AS prev_above
  FROM st
)
SELECT d AS stat_date, CAST(c AS BIGINT) AS rev_cents, above,
       (above AND prev_above = 0) AS golden_cross
FROM flagged
"""


def q_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) revenue concentration: the revenue share held by
    the top 20% of customers — customers ranked by exact integer
    revenue under a total order (revenue DESC, custkey), the cut at
    ``floor(n/5)``, shares as one final division. The customer frame
    grows with scale factor, so the rank uses ``global_rank``
    (range-partition + broadcast offsets) — NEVER an unpartitioned
    window — and ``n`` comes from a 1-row aggregate, not a full-frame
    count window."""
    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("c"))
    ranked = global_rank(per_cust, [F.desc("c"), F.asc("o_custkey")])
    n_row = per_cust.agg(F.count(F.lit(1)).alias("n"))
    joined = ranked.crossJoin(F.broadcast(n_row))
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum(F.when(F.col("rank") <= F.floor(F.col("n") / 5), F.col("c"))).cast(
            "bigint"
        ).alias("top20_cents"),
        F.sum("c").cast("bigint").alias("total_cents"),
        # raw final (round-7 sweep): one quotient of exact bigints
        (
            F.sum(
                F.when(F.col("rank") <= F.floor(F.col("n") / 5), F.col("c")).otherwise(0)
            ).cast("double")
            / F.sum("c").cast("double")
        ).alias("top20_share"),
    )


ORACLE_PARETO = """
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS c
  FROM orders GROUP BY 1
), ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, o_custkey ASC) AS rn,
         COUNT(*) OVER () AS n
  FROM per_cust
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN rn <= floor(n / 5) THEN c END) AS BIGINT) AS top20_cents,
       CAST(SUM(c) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN rn <= floor(n / 5) THEN c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE) AS top20_share
FROM ranked
"""


def q_stickiness_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU + the DAU/MAU stickiness ratio per day, EXACT:
    the (day, user) distinct frame explodes a bounded 0..27 lag
    sequence (28x fan-out, same cardinality a range join would emit)
    and hash-equi-joins the day spine on the landed day — never a
    BroadcastNestedLoopJoin over range predicates, and never a running
    countDistinct whose window state is O(users). Distinct counts are
    per-day aggregates over the joined frame; the ratio is one final
    division. Partial head windows report what's in range (the
    standard dashboard semantics)."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    spine = du.select("day").distinct()
    fan = du.select(
        "user_id",
        F.col("day").alias("a_day"),
        F.explode(F.sequence(F.lit(0), F.lit(27))).alias("lag"),
    ).withColumn("day", F.date_add(F.col("a_day"), F.col("lag")))
    j = fan.join(spine, "day")
    per_day = j.groupBy("day").agg(
        F.count_distinct(F.when(F.col("lag") == 0, F.col("user_id")))
        .cast("bigint")
        .alias("dau"),
        F.count_distinct(F.when(F.col("lag") <= 6, F.col("user_id")))
        .cast("bigint")
        .alias("wau"),
        F.count_distinct("user_id").cast("bigint").alias("mau"),
    )
    return per_day.select(
        "day", "dau", "wau", "mau",
        # raw final (round-7 sweep): one quotient of exact bigints
        (F.col("dau").cast("double") / F.col("mau").cast("double")).alias(
            "stickiness"
        ),
    )


ORACLE_STICKINESS = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), spine AS (SELECT DISTINCT day FROM du),
j AS (
  SELECT s.day AS day, a.user_id,
         date_diff('day', a.day, s.day) AS lag
  FROM spine s JOIN du a
    ON date_diff('day', a.day, s.day) BETWEEN 0 AND 27
), per_day AS (
  SELECT day,
         CAST(COUNT(DISTINCT CASE WHEN lag = 0 THEN user_id END) AS BIGINT) AS dau,
         CAST(COUNT(DISTINCT CASE WHEN lag <= 6 THEN user_id END) AS BIGINT) AS wau,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM j GROUP BY 1
)
SELECT day, dau, wau, mau,
       CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness
FROM per_day
"""


def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into NEW (first-ever activity today)
    vs RETURNING — the acquisition-vs-retention read on every growth
    dashboard. One per-user min (first_seen), joined back onto the
    (day, user) distinct frame on the user key; all counts exact
    integers."""
    ev = _t(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    first_seen = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = du.join(first_seen, "user_id")
    return j.groupBy("day").agg(
        F.count(F.when(F.col("day") == F.col("first_day"), 1)).cast("bigint").alias(
            "new_users"
        ),
        F.count(F.when(F.col("day") != F.col("first_day"), 1)).cast("bigint").alias(
            "returning_users"
        ),
    )


ORACLE_NEW_VS_RETURNING = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
), first_seen AS (
  SELECT user_id, MIN(day) AS first_day FROM du GROUP BY 1
)
SELECT day,
       CAST(COUNT(CASE WHEN day = first_day THEN 1 END) AS BIGINT) AS new_users,
       CAST(COUNT(CASE WHEN day <> first_day THEN 1 END) AS BIGINT) AS returning_users
FROM du JOIN first_seen USING (user_id)
GROUP BY day
"""


def q_basket_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the co-purchase pairs: support,
    confidence, and lift for each frequent pair —

        lift(a,b) = (n_ab · N) / (n_a · n_b)

    as ONE division of exact integer products (never chained float
    probabilities). Pairs with lift > 1 co-occur more than chance —
    the cross-sell shortlist. Builds on the same distinct-first
    (order, part) self-join as ``copurchase_pairs``. The per-item
    counts frame is ITEM-grain — it grows with scale factor, so it is
    NOT hinted into a broadcast (the engine's fact-scaled-side rule);
    AQE demotes the shuffle join at runtime when it truly fits. Only
    the 1-row basket total broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct().hint("merge")
    # total-basket count as a 1-row aggregate crossJoined in — never a
    # driver-side .count() inside the plan build
    tot = op.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_tot")
    )
    item_counts = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a, bb = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    enriched = (
        pairs.join(
            item_counts.select(F.col("l_partkey").alias("part_a"),
                               F.col("n_item").alias("n_a")),
            "part_a",
        )
        .join(
            item_counts.select(F.col("l_partkey").alias("part_b"),
                               F.col("n_item").alias("n_b")),
            "part_b",
        )
    )
    return enriched.crossJoin(F.broadcast(tot)).select(
        "part_a", "part_b",
        F.col("n_ab").cast("bigint").alias("n_ab"),
        # raw finals (round-7 sweep): fixed-order quotients/products
        (F.col("n_ab").cast("double") / F.col("n_a").cast("double")).alias(
            "confidence_a_to_b"
        ),
        # cast to DOUBLE before multiplying (r6 capacity audit): the
        # BIGINT products n_ab·n_tot and n_a·n_b square an order count
        # (~(1.5e11)² ≈ 2e22 at 100 TB) and raise ANSI overflow; the
        # double product is exact below 2^53 per operand-pair (so
        # bit-identical to the old form at every testable SF) and a
        # single correctly-rounded IEEE multiply — identical in both
        # engines — beyond. Oracle mirrors the same cast order.
        (
            (F.col("n_ab").cast("double") * F.col("n_tot").cast("double"))
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("lift"),
    )


ORACLE_BASKET_LIFT = """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM op),
items AS (SELECT l_partkey, COUNT(*) AS n_item FROM op GROUP BY 1),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT p.part_a, p.part_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(p.n_ab AS DOUBLE) / CAST(ia.n_item AS DOUBLE)
         AS confidence_a_to_b,
       (CAST(p.n_ab AS DOUBLE) * CAST(tot.n AS DOUBLE))
             / (CAST(ia.n_item AS DOUBLE) * CAST(ib.n_item AS DOUBLE))
         AS lift
FROM pairs p
JOIN items ia ON p.part_a = ia.l_partkey
JOIN items ib ON p.part_b = ib.l_partkey, tot
"""


def q_funnel_time_to_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: per converting user, the time from earliest
    view to the first click after it, and from that click to the
    first purchase after it — summarized as the lower-median whole
    seconds per transition (row_number total order, the engine's
    deterministic median rule). Same one-shuffle stacked
    conditional-min windows as ``funnel_conversion``; the medians run
    over the converting-user frame.

    Scale note (fixed in r4 — VERDICT r3 item 3): the medians are
    computed on VALUE-grain counts (group the per-user deltas by
    second value, distributed prefix sum over the value order via
    ``global_prefix_sum``, select the first value whose cumulative
    count crosses floor((n+1)/2)) — never an unpartitioned
    ``row_number`` over the user-grain frame. The value frame is
    whole seconds, so its cardinality is bounded by the latency range,
    not the user count; the same decomposition that keeps
    ``weighted_median_price`` flat at 1000×. The selected VALUE is
    identical to the old (value, user_id) rank rule — tie-break order
    within one value never changes which value holds the median rank
    — so the oracle and the r2 driver hash are unchanged."""
    ev = _t(spark, sf_dir, "events")
    t_view = F.min(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(Window.partitionBy("user_id"))
    base = ev.select("user_id", "event_type", "ts", t_view.alias("t1"))
    t_click = (
        base.filter((F.col("event_type") == "click") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.first("t1").alias("t1"))
    )
    t_buy = (
        ev.select("user_id", "event_type", "ts")
        .join(t_click, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t2")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.first("t1").alias("t1"), F.first("t2").alias("t2"))
    )
    deltas = t_buy.select(
        "user_id",
        (F.unix_timestamp("t2") - F.unix_timestamp("t1")).alias("view_to_click_s"),
        (F.unix_timestamp("t3") - F.unix_timestamp("t2")).alias("click_to_buy_s"),
    )

    def lower_median(col: str):
        from ..operators.ranking import global_prefix_sum

        grain = deltas.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        pref = global_prefix_sum(grain, [F.asc("v")], "c", alias="cumx").withColumn(
            "cum", F.col("cumx") + F.col("c")
        )
        tot = grain.agg(F.sum("c").cast("bigint").alias("t"))
        crossing = pref.crossJoin(F.broadcast(tot)).where(
            F.col("cum") >= F.expr("(t + 1) DIV 2")
        )
        return crossing.agg(F.min("v").alias("v"))

    m1 = lower_median("view_to_click_s").select(F.col("v").alias("median_view_to_click_s"))
    m2 = lower_median("click_to_buy_s").select(F.col("v").alias("median_click_to_buy_s"))
    n = deltas.agg(F.count(F.lit(1)).cast("bigint").alias("n_converting_users"))
    return n.crossJoin(F.broadcast(m1)).crossJoin(F.broadcast(m2))


ORACLE_FUNNEL_LATENCY = """
WITH t1 AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t1
  FROM events WHERE event_type = 'view' GROUP BY 1
), t2 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t2, MIN(t1.t1) AS t1
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > t1.t1
  GROUP BY 1
), t3 AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS t3,
         MIN(t2.t1) AS t1, MIN(t2.t2) AS t2
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > t2.t2
  GROUP BY 1
), deltas AS (
  SELECT user_id,
         floor(epoch(t2)) - floor(epoch(t1)) AS d1,
         floor(epoch(t3)) - floor(epoch(t2)) AS d2
  FROM t3
), r1 AS (
  SELECT d1, ROW_NUMBER() OVER (ORDER BY d1, user_id) AS rn,
         COUNT(*) OVER () AS cnt
  FROM deltas
), r2 AS (
  SELECT d2, ROW_NUMBER() OVER (ORDER BY d2, user_id) AS rn,
         COUNT(*) OVER () AS cnt
  FROM deltas
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deltas) AS n_converting_users,
       (SELECT CAST(d1 AS BIGINT) FROM r1
        WHERE rn = CAST(floor((cnt + 1) / 2) AS INT)) AS median_view_to_click_s,
       (SELECT CAST(d2 AS BIGINT) FROM r2
        WHERE rn = CAST(floor((cnt + 1) / 2) AS INT)) AS median_click_to_buy_s
"""


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the canonical CRM slice: each
    customer scored 1-5 on Recency (days since last order — lower is
    better), Frequency (order count), and Monetary (integer-cent
    lifetime value), each via exact distributed NTILE(5)
    (``global_ntile`` — range-partitioned ranks, never an
    unpartitioned window over the customer frame), then rolled up to
    per-(R,F,M)-cell customer counts with the champion cell
    (5,5,5)-style label logic left to consumers. Every quintile uses a
    total order (metric, custkey) so cell membership is deterministic."""
    orders = _t(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(cents).alias("monetary_cents"),
    )
    # recency in days against the corpus max date (1-row broadcast)
    anchor = per_cust.agg(F.max("last_order").alias("anchor"))
    scored = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff(F.col("anchor"), F.col("last_order")).alias("recency_days"),
        "frequency",
        "monetary_cents",
    )

    def quintile(col_order, alias):
        t = global_ntile(scored, col_order, 5).select(
            "o_custkey", F.col("tile").alias(alias)
        )
        return t

    r = quintile([F.asc("recency_days"), F.asc("o_custkey")], "r_score")
    f = quintile([F.desc("frequency"), F.asc("o_custkey")], "f_score")
    m = quintile([F.desc("monetary_cents"), F.asc("o_custkey")], "m_score")
    rfm = r.join(f, "o_custkey").join(m, "o_custkey")
    return rfm.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


ORACLE_RFM = """
WITH per_cust AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_order,
         COUNT(*) AS frequency,
         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS monetary_cents
  FROM orders GROUP BY 1
), anchor AS (SELECT MAX(last_order) AS anchor FROM per_cust),
scored AS (
  SELECT o_custkey,
         date_diff('day', last_order, anchor) AS recency_days,
         frequency, monetary_cents
  FROM per_cust, anchor
), tiles AS (
  SELECT o_custkey,
         NTILE(5) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_score,
         NTILE(5) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_score,
         NTILE(5) OVER (ORDER BY monetary_cents DESC, o_custkey ASC) AS m_score
  FROM scored
)
SELECT CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
       CAST(m_score AS BIGINT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM tiles GROUP BY 1, 2, 3
"""


REGISTRY_ANALYTICS: dict = {
    "rfm_segmentation": (q_rfm_segmentation, ORACLE_RFM),
    "basket_affinity_lift": (q_basket_affinity_lift, ORACLE_BASKET_LIFT),
    "funnel_time_to_step": (q_funnel_time_to_step, ORACLE_FUNNEL_LATENCY),
    "stickiness_ratios": (q_stickiness_ratios, ORACLE_STICKINESS),
    "new_vs_returning": (q_new_vs_returning, ORACLE_NEW_VS_RETURNING),
    "ma_crossover": (q_ma_crossover, ORACLE_MA_CROSSOVER),
    "pareto_concentration": (q_pareto_concentration, ORACLE_PARETO),
    "psi_drift": (q_psi_drift, ORACLE_PSI),
    "winsorized_stats": (q_winsorized_stats, ORACLE_WINSORIZED),
    "winsorized_stats_approx": (q_winsorized_stats_approx, None),
    "benford_audit": (q_benford_audit, _oracle_benford()),
    "gaps_and_islands": (q_gaps_and_islands, ORACLE_GAPS_ISLANDS),
    "cumulative_unique_users": (
        q_cumulative_unique_users, ORACLE_CUMULATIVE_USERS,
    ),
    "ratio_to_report": (q_ratio_to_report, ORACLE_RATIO_TO_REPORT),
    "bag_set_ops": (q_bag_set_ops, ORACLE_BAG_SET_OPS),
    "triangle_count": (q_triangle_count, ORACLE_TRIANGLES),
    "check_unique": (q_check_unique, ORACLE_CHECK_UNIQUE),
    "collation_group": (q_collation_group, ORACLE_COLLATION),
    "null_safe_join_counts": (q_null_safe_join_counts, ORACLE_NULL_SAFE),
    "second_highest_daily": (q_second_highest_daily, ORACLE_NTH_VALUE),
    "recursive_cte_reach": (q_recursive_cte_reach, ORACLE_COPURCHASE_REACH),
    "multi_band_single_scan": (q_multi_band_single_scan, ORACLE_MULTI_BAND),
    "approx_topk_tokens": (q_approx_topk_tokens, None),
    "scd2_asof_lookup": (q_scd2_asof_lookup, ORACLE_SCD2_ASOF),
    "top_event_paths": (q_top_event_paths, ORACLE_TOP_PATHS),
    "chi_square_independence": (q_chi_square_independence, ORACLE_CHI2),
    "full_outer_reconciliation": (
        q_full_outer_reconciliation, ORACLE_FULL_OUTER,
    ),
    "histogram_bins": (q_histogram_bins, ORACLE_HISTOGRAM),
    "copurchase_reach": (q_copurchase_reach, ORACLE_COPURCHASE_REACH),
    "ewma_daily_revenue": (q_ewma_daily_revenue, ORACLE_EWMA),
    "peak_concurrency": (q_peak_concurrency, ORACLE_PEAK_CONCURRENCY),
    "robust_anomalies": (q_robust_anomalies, ORACLE_ROBUST_ANOMALIES),
    "ab_test_zscores": (q_ab_test_zscores, ORACLE_AB_TEST),
    "asof_join_forward": (q_asof_join_forward, ORACLE_ASOF_FWD),
    "sessionize_native": (q_sessionize_native, ORACLE_SESSIONIZE_NATIVE),
    "revenue_trend": (q_revenue_trend, ORACLE_REVENUE_TREND),
    "pagerank_copurchase": (q_pagerank_copurchase, _oracle_pagerank()),
    "entity_resolution": (q_entity_resolution, ORACLE_ENTITY_RESOLUTION),
    "daily_anomalies": (q_daily_anomalies, ORACLE_DAILY_ANOMALIES),
    "gapfill_daily": (q_gapfill_daily, ORACLE_GAPFILL),
    "hopping_windows": (q_hopping_windows, ORACLE_HOPPING),
    "hopping_windows_approx": (q_hopping_windows_approx, None),
    "cohort_retention": (q_cohort_retention, ORACLE_COHORT),
    "time_weighted_value": (q_time_weighted_value, ORACLE_TIME_WEIGHTED),
    "event_transitions": (q_event_transitions, ORACLE_TRANSITIONS),
    "copurchase_pairs": (q_copurchase_pairs, ORACLE_COPURCHASE),
    "continuous_aggregate": (q_continuous_aggregate, ORACLE_CONTINUOUS_AGG),
    "variant_props_stats": (q_variant_props_stats, ORACLE_VARIANT),
    "lateral_top_orders": (q_lateral_top_orders, ORACLE_LATERAL),
    "quantile_sketch_rollup": (q_quantile_sketch_rollup, ORACLE_QUANTILE_SKETCH),
    "cms_frequency": (q_cms_frequency, ORACLE_CMS),
    "funnel_conversion": (q_funnel_conversion, ORACLE_FUNNEL),
    "zorder_values": (q_zorder_values, _oracle_zorder()),
    "hll_rollup_customers": (q_hll_rollup_customers, None),
    "snapshot_diff": (q_snapshot_diff, ORACLE_SNAPSHOT_DIFF),
    "locf_fill": (q_locf_fill, ORACLE_LOCF),
    "profile_table": (q_profile_table, ORACLE_PROFILE),
    "scd2_user_state": (q_scd2_user_state, ORACLE_SCD2),
    "salted_skew_count": (q_salted_skew_count, ORACLE_SALTED_COUNT),
    "bucketed_join_revenue": (q_bucketed_join_revenue, ORACLE_BUCKETED_JOIN),
    "range_join_windows": (q_range_join_windows, ORACLE_RANGE_JOIN),
    "unpivot_metrics": (q_unpivot_metrics, ORACLE_UNPIVOT),
    "fuzzy_name_pairs": (q_fuzzy_name_pairs, ORACLE_FUZZY),
    "percent_rank_cume": (q_percent_rank_cume, ORACLE_PCT_RANK),
    "rolling_7day_revenue": (q_rolling_7day_revenue, ORACLE_ROLLING_7D),
    "daily_active_users": (q_daily_active_users, ORACLE_DAU),
    "event_interarrival": (q_event_interarrival, ORACLE_INTERARRIVAL),
    "customer_retention": (q_customer_retention, ORACLE_RETENTION),
    "revenue_percentiles": (q_revenue_percentiles, ORACLE_PERCENTILES),
    "revenue_percentiles_approx": (q_revenue_percentiles_approx, None),
    "revenue_deciles": (q_revenue_deciles, ORACLE_DECILES),
    "popularity_index": (q_popularity_index, ORACLE_POPULARITY),
    "engagement_top_track": (q_engagement_top_track, ORACLE_ENGAGEMENT_TOP),
    "tpch_q5_local_supplier": (q_tpch_q5_local_supplier, ORACLE_Q5),
    "grouping_sets": (q_grouping_sets, ORACLE_GROUPING_SETS),
    "quarantine_split": (q_quarantine_split, ORACLE_QUARANTINE),
    "asof_join_signup": (q_asof_join_signup, ORACLE_ASOF),
    "token_frequencies": (q_token_frequencies, ORACLE_TOKEN_FREQ),
    "median_by_group": (q_median_by_group, ORACLE_MEDIAN),
    "monthly_rollup": (q_monthly_rollup, ORACLE_MONTHLY),
    "partitioned_sink_prune": (q_partitioned_sink_prune, ORACLE_PART_PRUNE),
    "genre_kpis_sql": (q_genre_kpis_sql, None),  # oracle set below
    "cube_returnflag_status": (q_cube_returnflag_status, ORACLE_CUBE),
    "agg_count_distinct_approx": (q_agg_count_distinct_approx, None),
    "tpch_q3_shipping": (q_tpch_q3_shipping, ORACLE_Q3),
    "revenue_by_region": (q_revenue_by_region, ORACLE_REVENUE_REGION),
    "window_running_total": (q_window_running_total, ORACLE_RUNNING_TOTAL),
    "rollup_priority_status": (q_rollup_priority_status, ORACLE_ROLLUP),
    "pivot_status_by_priority": (q_pivot_status_by_priority, ORACLE_PIVOT),
    "sessionize_events": (q_sessionize_events, ORACLE_SESSIONIZE),
}


def _late_bind_oracles() -> None:
    # genre_kpis_sql shares the flagship's oracle (identical result)
    from .testdata_queries import ORACLE_GENRE_KPIS

    REGISTRY_ANALYTICS["genre_kpis_sql"] = (q_genre_kpis_sql, ORACLE_GENRE_KPIS)


_late_bind_oracles()
