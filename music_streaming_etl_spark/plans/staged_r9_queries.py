"""Round-9 STAGED registry surface — built, oracle-twinned, and
pytest-verified in round 8, but NOT wired into ``registry.py``.

The freeze discipline (VERDICT r6 item 7, kept every round since):
new surface is pre-staged one round ahead with its evidence banked —
cell-exact oracle parity (normal + hostile), degenerate trio,
independent brute-force twins, 1×→1000× scale curves — so the next
round's registration is a two-line ``registry.py`` change instead of
fresh unproven code in the driver window. This module extends the
X42/X49 statistical-inference family with ten more classical tests
plus one LLM-pipeline gate (``benchmark_decontamination``), each
re-expressed as a bounded-grain exact-arithmetic plan:

- ``ks_two_sample`` — two-sample Kolmogorov-Smirnov D between the
  URGENT and LOW order-value distributions. ENTIRELY IEEE-FREE (the
  round-8 anova playbook): D's sup-gap is an exact integer
  ``max_v |n_b·cumA(v) − n_a·cumB(v)|`` over the distinct-value
  grain, and the emitted statistic is exact integer micro-units via
  `_idiv` (HUGEINT ``//`` in the oracle). The ECDF sup runs over
  DISTINCT cents values — bounded by the price domain, never by fact
  cardinality.
- ``jonckheere_terpstra`` — the ordered-alternative k-group trend
  test (priorities are ordinal: 1-URGENT < … < 5-LOW, and the
  string order IS the ordinal order). J = Σ_{g<h} U_gh decomposes at
  the value grain: ONE unpartitioned window over distinct values
  (domain-bounded) computes per-group exclusive prefix counts, and
  the doubled statistic J2 = Σ_v Σ_{g<h} c_hv·(2·cumB_g(v) + c_gv)
  is an exact integer sum — no float aggregation anywhere. E[J2] is
  exact; z is ONE fixed-order double expression over exact integer
  tie/group cubics (the tie-corrected three-term variance).
- ``mood_median_test`` — Mood's k-group median test on lineitem
  return flags: classify every value against the GRAND true median
  (midpoint-interpolated on the doubled-cents grid, the
  brown_forsythe r8 convention), then the 2×k contingency chi² over
  the closed 3-flag pivot in one fixed-order double expression.
  Emits the doubled grand median as an EXACT integer.
- ``cramers_v`` — the chi-square EFFECT SIZE over a 3×k variant ×
  event-type contingency (reuses the proven floor-quantized
  DECIMAL(27,0) cell recipe of `chi_square_independence` verbatim).
- ``wilcoxon_signed_rank`` — the PAIRED two-sample test (each
  customer against itself, 1995 vs 1996 spend): exact integer cents
  differences, doubled pooled ranks of |d| from one exclusive prefix
  window, W2/E2 exact integers, z the only IEEE final.
- ``benchmark_decontamination`` — the one non-stats key: train/eval
  n-gram collision scrub over ``documents`` (the LLM-pipeline gate
  that keeps benchmark text out of a training corpus). All-integer
  counts + one raw quotient; linear span-key joins, never all-pairs.
- ``friedman_test`` — the repeated-measures rank test (complete
  month-blocks × the closed 5-priority domain): ONE fact-scaled
  month×priority aggregate, then all ranks as exact integer
  expressions over the pivoted k cell values — no window, no sort;
  χ² is the only IEEE final. The block domain is calendar-bounded,
  so the post-aggregate frame is ~84 rows at ANY corpus size.
- ``cochrans_q`` — the binary repeated-measures test (McNemar's
  k-treatment generalization) over fact-scaled user blocks × the
  funnel trio, with a self-normalizing dominance indicator (the
  saturated synthetic corpus makes plain ever-did-j degenerate).
  ENTIRELY IEEE-free: Q's ratio-of-exact-integers identity emits as
  `_idiv` micro-units — the anova playbook at birth.
- ``page_trend_test`` — Page's L, the ordered-alternative companion
  of ``friedman_test`` (as jonckheere is to kruskal), finishing from
  the SAME shared one-row block frame (`_friedman_tot`): the
  weighted rank sum commutes through the block sums, so the ordinal
  trend statistic costs no extra fact work at all.
- ``runs_test`` — the Wald–Wolfowitz randomness test on the daily-
  revenue sign sequence about its doubled-grid true median: ONE
  fact-scaled day aggregate, then median ranks / sign lag / run
  count all on the bounded ~2.4k-row day frame (the documented
  day-grain window class). n₁/n₂/R exact bigints, z the only IEEE
  final; days at the median are dropped (standard convention).
- ``durbin_watson`` — serial correlation of the daily-revenue OLS
  residuals, ENTIRELY IEEE-free in the hashed row: bit-identical
  fixed-order residuals floor-quantized to cents, exact DECIMAL
  quadratic sums (they exceed 2^53 at sf0.01 and NEVER convert to
  double — the anova-r8 lesson applied at birth), `_idiv`
  micro-unit statistic.

All group domains are CLOSED (5 priorities / 3 return flags), so the
k-term reductions pivot into fixed columns with the staged-r8 domain
guard: a value outside the pivot domain NULLs the derived statistics
identically in both engines instead of silently skewing them.

Reference parity: the reference pipeline (KPrince-coder/
music-streaming-etl, dags/music_streaming_etl_dags.py) has no
hypothesis-test primitive — pandas delegates to scipy on collected
data; these are the distributed-native equivalents a 100 TB corpus
needs (scipy.stats.ks_2samp / jonckheere via R's DescTools /
scipy.stats.median_test / chi2_contingency-with-Cramér's-V /
scipy.stats.wilcoxon are the single-node twins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .extension_queries import SQL_SHINGLES5
from .staged_r8_queries import (
    _PRIORITIES,
    _RETURNFLAGS,
    _dec,
    _fixed_order_sum,
)
from .stats_queries import _CENTS, _cents, _floor_sat_safe, _idiv
from .testdata_queries import _t


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov (URGENT vs LOW order totals)
# --------------------------------------------------------------------------


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are URGENT and LOW order-value DISTRIBUTIONS different (not
    just their means — KS sees shape)? D = sup_v |F_a(v) − F_b(v)|
    over the pooled distinct values.

    IEEE-FREE: with cumA/cumB the inclusive per-group cumulative
    counts at value v, the sup-gap numerator
    ``d_num = max_v |n_b·cumA − n_a·cumB|`` is an exact integer
    (D = d_num/(n_a·n_b)), emitted alongside exact integer micro-units
    ``d_micro = (d_num·10⁶) DIV (n_a·n_b)`` via `_idiv` — no double
    anywhere in or feeding the row (the anova r8 playbook).
    ``at_value`` is the smallest cents value attaining the sup (total
    order). Magnitude audit: n_g ≤ 3e10 at sf100k ⇒ n_b·cumA ≤ 9e20,
    d_num·10⁶ ≤ 9e26, n_a·n_b ≤ 9e20 — all inside DECIMAL(38,0).
    The window runs UNPARTITIONED over DISTINCT cents values: bounded
    by the price domain (≤ ~10.4M keys), never by fact cardinality —
    the documented bounded-window class."""
    orders = _t(spark, sf_dir, "orders")
    two = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        _cents().alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_a"),
    )
    gv = two.groupBy("v").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = gv.select(
        "v",
        F.sum("ca").over(wcum).cast("decimal(19,0)").alias("cuma"),
        F.sum("cb").over(wcum).cast("decimal(19,0)").alias("cumb"),
    )
    tot = gv.agg(
        F.sum("ca").cast("decimal(19,0)").alias("n_a"),
        F.sum("cb").cast("decimal(19,0)").alias("n_b"),
    )
    gap = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "n_a",
        "n_b",
        F.abs(
            F.col("n_b") * F.col("cuma") - F.col("n_a") * F.col("cumb")
        )
        .cast("decimal(38,0)")
        .alias("gap"),
    )
    m = gap.groupBy("n_a", "n_b").agg(
        F.max("gap").cast("decimal(38,0)").alias("d_num")
    )
    at = (
        gap.join(F.broadcast(m), ["n_a", "n_b"])
        .filter(F.col("gap") == F.col("d_num"))
        .groupBy("n_a", "n_b", "d_num")
        .agg(F.min("v").cast("bigint").alias("at_value"))
    )
    return at.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        # STRING on both engines (r9 materialized-dtype parity — the
        # anova class caught by selfcheck's new gate pre-registration:
        # DECIMAL(38,0) arrives in pandas as Decimal objects, the
        # oracle's HUGEINT as float64; equal values, different hash
        # bytes. Non-negative exact integer → plain-digit rendering
        # is identical in both engines.)
        F.col("d_num").cast("string").alias("d_num"),
        "at_value",
        _idiv(F.col("d_num") * F.lit(1000000), F.col("n_a") * F.col("n_b"))
        .cast("bigint")
        .alias("d_micro"),
    )


ORACLE_KS_TWO_SAMPLE = f"""
WITH s AS (
  SELECT {_CENTS} AS v, (o_orderpriority = '1-URGENT') AS is_a
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), gv AS (
  SELECT v,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM s GROUP BY 1
), cum AS (
  SELECT v,
         CAST(SUM(ca) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cuma,
         CAST(SUM(cb) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cumb
  FROM gv
), tot AS (
  SELECT CAST(SUM(ca) AS HUGEINT) AS n_a, CAST(SUM(cb) AS HUGEINT) AS n_b
  FROM gv
), gap AS (
  SELECT v, n_a, n_b, abs(n_b * cuma - n_a * cumb) AS gap
  FROM cum, tot
), m AS (
  SELECT n_a, n_b, MAX(gap) AS d_num FROM gap GROUP BY 1, 2
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(d_num AS VARCHAR) AS d_num,
       (SELECT MIN(v) FROM gap WHERE gap = (SELECT d_num FROM m))
         AS at_value,
       CAST((d_num * 1000000) // NULLIF(n_a * n_b, 0) AS BIGINT)
         AS d_micro
FROM m
"""


# --------------------------------------------------------------------------
# Jonckheere-Terpstra (ordered k-group trend)
# --------------------------------------------------------------------------


def _cubic(n: F.Column) -> F.Column:
    """n(n−1)(2n+5) as exact decimal — the tie/group term of the
    Jonckheere variance."""
    nd = _dec(n, 19)
    return (nd * (nd - 1) * (2 * nd + 5)).cast("decimal(38,0)")


def _perm2(n: F.Column) -> F.Column:
    nd = _dec(n, 19)
    return (nd * (nd - 1)).cast("decimal(38,0)")


def _perm3(n: F.Column) -> F.Column:
    nd = _dec(n, 19)
    return (nd * (nd - 1) * (nd - 2)).cast("decimal(38,0)")


def q_jonckheere_terpstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does order value TREND across the ordered priorities
    (1-URGENT < 2-HIGH < … < 5-LOW)? Jonckheere-Terpstra: J =
    Σ_{g<h} U_gh, the sum of pairwise Mann-Whitney counts in the
    ordinal direction — strictly more powerful than Kruskal-Wallis
    when the alternative is monotone.

    Value-grain decomposition: pivot the per-value counts into the
    five closed-domain columns c_0..c_4, take their EXCLUSIVE prefix
    sums b_0..b_4 with ONE unpartitioned window over distinct values
    (domain-bounded, the documented class), and the doubled statistic

        J2 = Σ_v Σ_{h} c_hv · Σ_{g<h} (2·b_gv + c_gv)

    is an EXACT integer sum (ties count half ⇒ doubling keeps it
    integral). E[J2] = (N² − Σn_g²) DIV 2 is exact (the numerator is
    always even). Only the final z is IEEE: the tie-corrected
    three-term variance (Hollander & Wolfe) assembled from exact
    integer cubics in one fixed operation order mirrored textually:

      72·V = A − Σ_g G3_g − Σ_v T3_v               (cubic terms)
      + 36·V₂ = … n-perm3·t-perm3 / N-perm3        (second term)
      + 8·V₃  = … n-perm2·t-perm2 / N-perm2        (third term)

    Domain guard: a priority outside the closed pivot would be
    counted in n_rows but missing from the term sum — both stats are
    NULLed when the live group count exceeds the pivoted one."""
    orders = _t(spark, sf_dir, "orders")
    gv = (
        orders.select(
            F.col("o_orderpriority").alias("g"), _cents().alias("v")
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("t"),
            *[
                F.sum(F.when(F.col("g") == p, 1).otherwise(0))
                .cast("bigint")
                .alias(f"c_{i}")
                for i, p in enumerate(_PRIORITIES)
            ],
        )
    )
    k = len(_PRIORITIES)
    wexc = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = gv.select(
        "v",
        "t",
        *[F.col(f"c_{i}") for i in range(k)],
        *[
            F.coalesce(F.sum(f"c_{i}").over(wexc), F.lit(0))
            .cast("decimal(19,0)")
            .alias(f"b_{i}")
            for i in range(k)
        ],
    )
    # per-value doubled pair term: Σ_h c_h · Σ_{g<h} (2·b_g + c_g)
    term = None
    for h in range(1, k):
        inner = None
        for g in range(h):
            piece = 2 * F.col(f"b_{g}") + F.col(f"c_{g}")
            inner = piece if inner is None else inner + piece
        t_h = _dec(F.col(f"c_{h}"), 19) * inner
        term = t_h if term is None else term + t_h
    # group-size guard: count groups OUTSIDE the closed pivot at the
    # value grain (any v whose per-group split doesn't add up)
    pivot_sum = None
    for i in range(k):
        c = F.col(f"c_{i}")
        pivot_sum = c if pivot_sum is None else pivot_sum + c
    tot = cum.agg(
        F.sum("t").cast("bigint").alias("n_rows"),
        F.sum(term.cast("decimal(38,0)")).cast("decimal(38,0)").alias("j2"),
        F.sum(
            F.when(F.col("t") != pivot_sum, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("bad_v"),
        *[
            F.sum(f"c_{i}").cast("decimal(19,0)").alias(f"n_{i}")
            for i in range(k)
        ],
        F.sum(_cubic(F.col("t"))).cast("decimal(38,0)").alias("t3"),
        F.sum(_perm2(F.col("t"))).cast("decimal(38,0)").alias("tp2"),
        F.sum(_perm3(F.col("t"))).cast("decimal(38,0)").alias("tp3"),
    )
    nsum2 = None
    g3 = None
    gp2 = None
    gp3 = None
    for i in range(k):
        n_i = F.col(f"n_{i}")
        sq = (n_i * n_i).cast("decimal(38,0)")
        nsum2 = sq if nsum2 is None else nsum2 + sq
        c3 = _cubic(n_i)
        g3 = c3 if g3 is None else g3 + c3
        p2 = _perm2(n_i)
        gp2 = p2 if gp2 is None else gp2 + p2
        p3 = _perm3(n_i)
        gp3 = p3 if gp3 is None else gp3 + p3
    nd = F.col("n_rows").cast("decimal(19,0)")
    e2 = _idiv((nd * nd).cast("decimal(38,0)") - nsum2, F.lit(2))
    wide = tot.select(
        "n_rows",
        F.col("j2"),
        e2.cast("decimal(38,0)").alias("e2"),
        g3.cast("decimal(38,0)").alias("g3"),
        gp2.cast("decimal(38,0)").alias("gp2"),
        gp3.cast("decimal(38,0)").alias("gp3"),
        "t3",
        "tp2",
        "tp3",
        "bad_v",
    )
    n = F.col("n_rows").cast("double")
    a_term = _cubic(F.col("n_rows")).cast("double")
    # fixed-order variance: term1 + term2 + term3, each a ratio of
    # exact-integer carriers cast to double (scale-0 decimal→double is
    # the correctly-rounded binary conversion in both engines)
    v1 = (
        a_term - F.col("g3").cast("double") - F.col("t3").cast("double")
    ) / F.lit(72.0)
    v2 = (
        F.col("gp3").cast("double") * F.col("tp3").cast("double")
    ) / (F.lit(36.0) * (n * (n - F.lit(1.0)) * (n - F.lit(2.0))))
    v3 = (
        F.col("gp2").cast("double") * F.col("tp2").cast("double")
    ) / (F.lit(8.0) * (n * (n - F.lit(1.0))))
    z = F.try_divide(
        F.col("j2").cast("double") - F.col("e2").cast("double"),
        F.lit(2.0) * F.sqrt(F.nullif(v1 + v2 + v3, F.lit(0.0))),
    )
    guard = F.col("bad_v") == 0
    return wide.select(
        "n_rows",
        # STRING on both engines (r9 materialized-dtype parity — the
        # anova class, caught by selfcheck's new gate before
        # registration); exact non-negative integers render as plain
        # digits identically on both sides, NULL stays NULL.
        F.when(guard, F.col("j2")).cast("string").alias("j2"),
        F.when(guard, F.col("e2")).cast("string").alias("e2"),
        F.when(guard, z).alias("z_stat"),
    )


def _jt_pivot_counts_sql() -> str:
    return ",\n         ".join(
        f"CAST(SUM(CASE WHEN g = '{p}' THEN 1 ELSE 0 END) AS BIGINT) AS c_{i}"
        for i, p in enumerate(_PRIORITIES)
    )


def _jt_prefix_sql() -> str:
    return ",\n         ".join(
        f"CAST(COALESCE(SUM(c_{i}) OVER (ORDER BY v ROWS BETWEEN "
        f"UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DECIMAL(19,0)) AS b_{i}"
        for i in range(len(_PRIORITIES))
    )


def _jt_term_sql() -> str:
    k = len(_PRIORITIES)
    parts = []
    for h in range(1, k):
        inner = " + ".join(f"(2 * b_{g} + c_{g})" for g in range(h))
        parts.append(f"CAST(c_{h} AS DECIMAL(19,0)) * ({inner})")
    return " + ".join(parts)


def _jt_groups_sql(expr: str) -> str:
    """Sum an expression template over the k pivoted group-size
    columns n_0..n_4 (fixed order)."""
    return " + ".join(
        expr.format(n=f"n_{i}") for i in range(len(_PRIORITIES))
    )


ORACLE_JONCKHEERE = f"""
WITH s AS (
  SELECT o_orderpriority AS g, {_CENTS} AS v FROM orders
), gv AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t,
         {_jt_pivot_counts_sql()}
  FROM s GROUP BY 1
), cum AS (
  SELECT v, t, c_0, c_1, c_2, c_3, c_4,
         {_jt_prefix_sql()}
  FROM gv
), tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n_rows,
         CAST(SUM(CAST({_jt_term_sql()} AS DECIMAL(38,0)))
           AS DECIMAL(38,0)) AS j2,
         CAST(SUM(CASE WHEN t != c_0 + c_1 + c_2 + c_3 + c_4
                        THEN 1 ELSE 0 END) AS BIGINT) AS bad_v,
         {", ".join(f"CAST(SUM(c_{i}) AS DECIMAL(19,0)) AS n_{i}" for i in range(len(_PRIORITIES)))},
         CAST(SUM(CAST(CAST(t AS DECIMAL(19,0)) * (CAST(t AS DECIMAL(19,0)) - 1)
                  * (2 * CAST(t AS DECIMAL(19,0)) + 5) AS DECIMAL(38,0)))
           AS DECIMAL(38,0)) AS t3,
         CAST(SUM(CAST(CAST(t AS DECIMAL(19,0)) * (CAST(t AS DECIMAL(19,0)) - 1)
                  AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tp2,
         CAST(SUM(CAST(CAST(t AS DECIMAL(19,0)) * (CAST(t AS DECIMAL(19,0)) - 1)
                  * (CAST(t AS DECIMAL(19,0)) - 2) AS DECIMAL(38,0)))
           AS DECIMAL(38,0)) AS tp3
  FROM cum
), wide AS (
  SELECT n_rows, j2, bad_v, t3, tp2, tp3,
         CAST(({_jt_groups_sql("{n} * {n}")}) AS DECIMAL(38,0)) AS nsum2,
         CAST(({_jt_groups_sql("{n} * ({n} - 1) * (2 * {n} + 5)")})
           AS DECIMAL(38,0)) AS g3,
         CAST(({_jt_groups_sql("{n} * ({n} - 1)")}) AS DECIMAL(38,0)) AS gp2,
         CAST(({_jt_groups_sql("{n} * ({n} - 1) * ({n} - 2)")})
           AS DECIMAL(38,0)) AS gp3
  FROM tot
), fin AS (
  SELECT n_rows, j2, bad_v, g3, gp2, gp3, t3, tp2, tp3,
         CAST(CAST(CAST(n_rows AS HUGEINT) * CAST(n_rows AS HUGEINT)
              - CAST(nsum2 AS HUGEINT) AS HUGEINT) // 2 AS DECIMAL(38,0)) AS e2
  FROM wide
)
SELECT n_rows,
       CAST(CASE WHEN bad_v = 0 THEN j2 END AS VARCHAR) AS j2,
       CAST(CASE WHEN bad_v = 0 THEN e2 END AS VARCHAR) AS e2,
       CASE WHEN bad_v = 0 THEN
         (CAST(j2 AS DOUBLE) - CAST(e2 AS DOUBLE))
         / (2.0 * sqrt(NULLIF(
             (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - 1)
              * (2 * CAST(n_rows AS DOUBLE) + 5)
              - CAST(g3 AS DOUBLE) - CAST(t3 AS DOUBLE)) / 72.0
             + (CAST(gp3 AS DOUBLE) * CAST(tp3 AS DOUBLE))
               / (36.0 * (CAST(n_rows AS DOUBLE)
                  * (CAST(n_rows AS DOUBLE) - 1.0)
                  * (CAST(n_rows AS DOUBLE) - 2.0)))
             + (CAST(gp2 AS DOUBLE) * CAST(tp2 AS DOUBLE))
               / (8.0 * (CAST(n_rows AS DOUBLE)
                  * (CAST(n_rows AS DOUBLE) - 1.0))), 0.0)))
       END AS z_stat
FROM fin
"""


# --------------------------------------------------------------------------
# Mood's median test (k-group, grand true median)
# --------------------------------------------------------------------------


def q_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the return-flag groups share a common median price? Mood's
    median test: classify every lineitem price against the GRAND true
    median (midpoint-interpolated on the doubled-cents grid — the
    brown_forsythe r8 convention, so the doubled median m2 is an
    exact integer), then chi² over the 2×k above/not-above
    contingency.

    The grand median comes from ONE unpartitioned cumulative window
    over DISTINCT cents values (domain-bounded). Cell counts are
    exact integers; the flags are a closed 3-value domain, so chi² =
    [Σ_g (a_g·N − n_g·A)²/n_g] / (A·(N−A)) · 1 — assembled as a
    fixed-order double expression over the pivoted exact counts
    (raw-or-q6 playbook: pure ratio of exact integers, emitted raw).
    Domain guard: an unpivoted flag NULLs chi² in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("g"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    tv = base.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    cw = tv.select(
        "v",
        "t",
        F.sum("t").over(wcum).cast("bigint").alias("cum"),
        F.sum("t").over(wall).cast("bigint").alias("n_all"),
    )
    r_lo = F.floor((F.col("n_all") + 1) / 2).cast("bigint")
    r_hi = (F.floor(F.col("n_all") / 2) + 1).cast("bigint")
    med = cw.agg(
        F.min(
            F.when(
                (F.col("cum") >= r_lo) & (F.col("cum") - F.col("t") < r_lo),
                F.col("v"),
            )
        ).alias("vlo"),
        F.min(
            F.when(
                (F.col("cum") >= r_hi) & (F.col("cum") - F.col("t") < r_hi),
                F.col("v"),
            )
        ).alias("vhi"),
    ).select((F.col("vlo") + F.col("vhi")).alias("m2"))
    k = len(_RETURNFLAGS)
    st = base.crossJoin(F.broadcast(med)).groupBy().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.countDistinct("g").alias("k_all"),
        F.max("m2").alias("m2"),
        *[
            c
            for i, flag in enumerate(_RETURNFLAGS)
            for c in (
                F.sum(F.when(F.col("g") == flag, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{i}"),
                F.sum(
                    F.when(
                        (F.col("g") == flag)
                        & (2 * F.col("v") > F.col("m2")),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias(f"a_{i}"),
            )
        ],
    )
    present = None
    a_tot = None
    for i in range(k):
        p = F.when(F.col(f"n_{i}") > 0, 1).otherwise(0)
        present = p if present is None else present + p
        a = F.col(f"a_{i}")
        a_tot = a if a_tot is None else a_tot + a
    nd = F.col("n_rows").cast("double")
    ad = a_tot.cast("double")
    chi_num = None
    for i in range(k):
        nid = F.col(f"n_{i}").cast("double")
        aid = F.col(f"a_{i}").cast("double")
        piece = F.try_divide(
            (aid * nd - nid * ad) * (aid * nd - nid * ad), nid
        )
        piece = F.coalesce(piece, F.lit(0.0))
        chi_num = piece if chi_num is None else chi_num + piece
    chi2 = F.try_divide(chi_num, ad * (nd - ad))
    guard = F.col("k_all") == present.cast("bigint")
    return st.select(
        "n_rows",
        F.col("k_all").alias("n_groups"),
        F.col("m2").alias("grand_median_x2"),
        F.when(guard, a_tot.cast("bigint")).alias("n_above"),
        F.when(guard, chi2).alias("chi2_stat"),
    )


def _mood_pivot_sql() -> str:
    return ",\n         ".join(
        f"CAST(SUM(CASE WHEN g = '{flag}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{i},\n         "
        f"CAST(SUM(CASE WHEN g = '{flag}' AND 2 * v > m2 THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS a_{i}"
        for i, flag in enumerate(_RETURNFLAGS)
    )


def _mood_chi_sql() -> str:
    k = len(_RETURNFLAGS)
    a_tot = " + ".join(f"a_{i}" for i in range(k))
    pieces = []
    for i in range(k):
        d = (
            f"(CAST(a_{i} AS DOUBLE) * CAST(n_rows AS DOUBLE)"
            f" - CAST(n_{i} AS DOUBLE) * CAST({a_tot} AS DOUBLE))"
        )
        pieces.append(
            f"COALESCE({d} * {d} / NULLIF(CAST(n_{i} AS DOUBLE), 0.0), 0.0)"
        )
    num = " + ".join(pieces)
    return (
        f"({num}) / NULLIF(CAST({a_tot} AS DOUBLE)"
        f" * (CAST(n_rows AS DOUBLE) - CAST({a_tot} AS DOUBLE)), 0.0)"
    )


ORACLE_MOOD_MEDIAN = f"""
WITH base AS (
  SELECT l_returnflag AS g,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
  FROM lineitem
), tv AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM base GROUP BY 1
), cw AS (
  SELECT v, t,
         CAST(SUM(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(SUM(t) OVER () AS BIGINT) AS n_all
  FROM tv
), med AS (
  SELECT MIN(CASE WHEN cum >= (n_all + 1) // 2
                   AND cum - t < (n_all + 1) // 2 THEN v END)
       + MIN(CASE WHEN cum >= n_all // 2 + 1
                   AND cum - t < n_all // 2 + 1 THEN v END) AS m2
  FROM cw
), st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(DISTINCT g) AS BIGINT) AS k_all,
         MAX(m2) AS m2,
         {_mood_pivot_sql()}
  FROM base, med
)
SELECT n_rows, k_all AS n_groups, m2 AS grand_median_x2,
       CASE WHEN k_all = {" + ".join(f"CASE WHEN n_{i} > 0 THEN 1 ELSE 0 END" for i in range(len(_RETURNFLAGS)))}
            THEN CAST({" + ".join(f"a_{i}" for i in range(len(_RETURNFLAGS)))} AS BIGINT) END AS n_above,
       CASE WHEN k_all = {" + ".join(f"CASE WHEN n_{i} > 0 THEN 1 ELSE 0 END" for i in range(len(_RETURNFLAGS)))}
            THEN {_mood_chi_sql()} END AS chi2_stat
FROM st
"""


# --------------------------------------------------------------------------
# Cramér's V (chi-square effect size over a 3×k contingency)
# --------------------------------------------------------------------------


def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOW STRONG is the variant × event-type association (a p-value
    says "exists"; Cramér's V says "matters")?
    V = sqrt((χ²/N) / (min(r,c) − 1)) over the (user_id % 3) ×
    event_type contingency — three variants so min(r,c) is a real
    argmin, not constant 1.

    Reuses the proven chi-square cell recipe verbatim
    (`chi_square_independence`): exact integer cell counts, each
    (O−E)²/E contribution floor-quantized to 1e-9 units of an exact
    DECIMAL(27,0) sum (order-free — a raw double SUM over shuffled
    cells would be partitioning-dependent), chi²/V as fixed-order
    doubles of exact carriers; min() of two exact counts; sqrt is
    correctly-rounded IEEE. Cells are bounded (3 × |event types|):
    every frame after the first aggregate is tiny."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        (F.col("user_id") % 3).cast("bigint").alias("variant"),
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
            # _floor_sat_safe, not a raw floor: a cell's (O−E)²/E·1e9
            # is Θ(N·1e9) under strong dependence and Spark's
            # floor(DOUBLE) silently clamps to Long.MAX past 2^63 —
            # inside the audited sf100k envelope (review r8 finding;
            # the helper's ≥2^53 identity branch is safe here for the
            # same reason as anova's old carrier: the quantized cell
            # stays below 2^53 at every ORACLE-CHECKED sf).
            _floor_sat_safe(d * d / e * F.lit(1e9), "decimal(27,0)").alias(
                "cell_u"
            ),
            "n",
        )
    )
    agg = contrib.groupBy("n").agg(
        F.sum("cell_u").cast("decimal(38,0)").alias("chi2_nano"),
    )
    # distinct r/c from the bounded cells frame (post-agg, tiny)
    dims = cells.agg(
        F.count_distinct("variant").cast("bigint").alias("r"),
        F.count_distinct("event_type").cast("bigint").alias("c"),
    )
    wide = agg.crossJoin(F.broadcast(dims))
    chi2 = F.col("chi2_nano").cast("double") / F.lit(1e9)
    nd = F.col("n").cast("double")
    mind = F.least(F.col("r"), F.col("c")).cast("double") - F.lit(1.0)
    return wide.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("r").alias("n_variants"),
        F.col("c").alias("n_types"),
        chi2.alias("chi2_stat"),
        F.sqrt(
            F.try_divide(F.try_divide(chi2, nd), F.nullif(mind, F.lit(0.0)))
        ).alias("v_stat"),
    )


ORACLE_CRAMERS_V = """
WITH cells AS (
  SELECT CAST(user_id % 3 AS BIGINT) AS variant, event_type,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
), rt AS (SELECT variant, SUM(o) AS rt FROM cells GROUP BY 1),
   ct AS (SELECT event_type, SUM(o) AS ct FROM cells GROUP BY 1),
   nt AS (SELECT SUM(o) AS n FROM cells),
contrib AS (
  SELECT CAST(floor(
           (CAST(o AS DOUBLE)
              - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(nt.n AS DOUBLE))
           * (CAST(o AS DOUBLE)
              - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(nt.n AS DOUBLE))
           / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE) / CAST(nt.n AS DOUBLE))
           * 1e9) AS DECIMAL(27,0)) AS cell_u,
         nt.n AS n
  FROM cells JOIN rt USING (variant) JOIN ct USING (event_type), nt
), agg AS (
  SELECT n, CAST(SUM(cell_u) AS DECIMAL(38,0)) AS chi2_nano FROM contrib
  GROUP BY n
), dims AS (
  SELECT CAST(COUNT(DISTINCT variant) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS c
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n_rows, r AS n_variants, c AS n_types,
       CAST(chi2_nano AS DOUBLE) / 1e9 AS chi2_stat,
       sqrt((CAST(chi2_nano AS DOUBLE) / 1e9 / CAST(n AS DOUBLE))
            / NULLIF(CAST(LEAST(r, c) AS DOUBLE) - 1.0, 0.0)) AS v_stat
FROM agg, dims
"""


# --------------------------------------------------------------------------
# Wilcoxon signed-rank (paired year-over-year customer spend)
# --------------------------------------------------------------------------


def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Did per-customer spend SHIFT from 1995 to 1996, pairing each
    customer with itself? Wilcoxon signed-rank on the paired
    differences d = spend₁₉₉₆ − spend₁₉₉₅ (customers active in BOTH
    years; zero differences dropped — the standard convention).

    Exact-arithmetic shape: cents differences are exact integers; the
    |d| value grain gets DOUBLED pooled average ranks from an
    exclusive prefix sum (one unpartitioned window over DISTINCT |d|
    values — in the worst case one value per pair, but the frame is
    pair-grain ≤ |customers|, itself dimension-like; the
    mann_whitney/kruskal machinery), so the doubled positive-rank sum
    W2 = Σ_v p_v·(2·cumb_v + t_v + 1) and E2 = n(n+1) DIV 2 are exact
    integers. Only z is IEEE: the tie-corrected variance
    Var = [n(n+1)(2n+1) − Σ(t³−t)/2] / 24 assembled from exact
    integer carriers in one fixed operation order.
    Magnitude audit: n ≤ 1.5e10 customers at sf100k ⇒ n(n+1)(2n+1)
    ≈ 6.75e30 < 1e38 ✓; W2 ≤ n·(2n+1) ≈ 4.5e20 ✓."""
    orders = _t(spark, sf_dir, "orders")
    yr = orders.select(
        F.col("o_custkey").alias("cust"),
        F.year("o_orderdate").alias("y"),
        _cents().alias("c"),
    ).filter(F.col("y").isin(1995, 1996))
    per = yr.groupBy("cust").agg(
        F.sum(F.when(F.col("y") == 1995, F.col("c"))).alias("s95"),
        F.sum(F.when(F.col("y") == 1996, F.col("c"))).alias("s96"),
    )
    d = per.filter(
        F.col("s95").isNotNull() & F.col("s96").isNotNull()
    ).select((F.col("s96") - F.col("s95")).alias("d")).filter(
        F.col("d") != 0
    )
    gv = d.groupBy(F.abs(F.col("d")).alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("p"),
    )
    wexc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = gv.select(
        "v",
        "t",
        "p",
        F.coalesce(F.sum("t").over(wexc), F.lit(0))
        .cast("decimal(19,0)")
        .alias("cumb"),
    )
    tot = cum.agg(
        F.sum("t").cast("bigint").alias("n_pairs"),
        F.sum(
            (
                _dec(F.col("p"), 19)
                * (2 * F.col("cumb") + F.col("t") + F.lit(1))
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("w2_pos"),
        F.sum(
            (
                _dec(F.col("t"), 19) * _dec(F.col("t"), 19) * _dec(F.col("t"), 19)
                - F.col("t")
            ).cast("decimal(38,0)")
        )
        .cast("decimal(38,0)")
        .alias("ties"),
    )
    nd19 = _dec(F.col("n_pairs"), 19)
    e2 = _idiv((nd19 * (nd19 + 1)).cast("decimal(38,0)"), F.lit(2))
    n = F.col("n_pairs").cast("double")
    var = (
        n * (n + F.lit(1.0)) * (F.lit(2.0) * n + F.lit(1.0))
        - F.col("ties").cast("double") / F.lit(2.0)
    ) / F.lit(24.0)
    z = F.try_divide(
        F.col("w2_pos").cast("double") - e2.cast("double"),
        F.lit(2.0) * F.sqrt(F.nullif(var, F.lit(0.0))),
    )
    return tot.select(
        "n_pairs",
        # STRING on both engines (r9 materialized-dtype parity — the
        # anova class, caught by selfcheck's new gate before
        # registration); exact non-negative integers, plain digits.
        F.col("w2_pos").cast("string").alias("w2_pos"),
        e2.cast("decimal(38,0)").cast("string").alias("e2"),
        z.alias("z_stat"),
    )


ORACLE_WILCOXON = f"""
WITH yr AS (
  SELECT o_custkey AS cust, EXTRACT(year FROM o_orderdate) AS y,
         {_CENTS} AS c
  FROM orders
  WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
), per AS (
  SELECT cust,
         SUM(CASE WHEN y = 1995 THEN c END) AS s95,
         SUM(CASE WHEN y = 1996 THEN c END) AS s96
  FROM yr GROUP BY 1
), d AS (
  SELECT s96 - s95 AS d FROM per
  WHERE s95 IS NOT NULL AND s96 IS NOT NULL AND s96 - s95 != 0
), gv AS (
  SELECT abs(d) AS v, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS p
  FROM d GROUP BY 1
), cum AS (
  SELECT v, t, p,
         CAST(COALESCE(SUM(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS DECIMAL(19,0)) AS cumb
  FROM gv
), tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n_pairs,
         CAST(SUM(CAST(CAST(p AS DECIMAL(19,0))
              * (2 * cumb + t + 1) AS DECIMAL(38,0)))
           AS DECIMAL(38,0)) AS w2_pos,
         CAST(SUM(CAST(CAST(t AS DECIMAL(19,0)) * CAST(t AS DECIMAL(19,0))
                  * CAST(t AS DECIMAL(19,0)) - t AS DECIMAL(38,0)))
           AS DECIMAL(38,0)) AS ties
  FROM cum
), fin AS (
  SELECT n_pairs, w2_pos, ties,
         CAST(CAST(CAST(n_pairs AS HUGEINT)
              * (CAST(n_pairs AS HUGEINT) + 1) AS HUGEINT) // 2
           AS DECIMAL(38,0)) AS e2
  FROM tot
)
SELECT n_pairs,
       CAST(w2_pos AS VARCHAR) AS w2_pos,
       CAST(e2 AS VARCHAR) AS e2,
       (CAST(w2_pos AS DOUBLE) - CAST(e2 AS DOUBLE))
       / (2.0 * sqrt(NULLIF(
           (CAST(n_pairs AS DOUBLE) * (CAST(n_pairs AS DOUBLE) + 1.0)
            * (2.0 * CAST(n_pairs AS DOUBLE) + 1.0)
            - CAST(ties AS DOUBLE) / 2.0) / 24.0, 0.0))) AS z_stat
FROM fin
"""


# --------------------------------------------------------------------------
# Benchmark decontamination (train/eval n-gram collision scrub)
# --------------------------------------------------------------------------


def q_benchmark_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train/eval n-gram decontamination over ``documents``: the
    deterministic 5% slice ``doc_id % 20 == 0`` stands in for the
    held-out benchmark suite, and every training document reports how
    many of its distinct 5-token spans occur anywhere in that slice —
    the pre-training scrub that keeps eval numbers meaningful (the
    GPT-3 13-gram collision check is the single-node twin). See
    ``operators/dedup.py::benchmark_decontamination`` for the plan
    shape (linear span-key joins, never all-pairs)."""
    from ..operators.dedup import benchmark_decontamination

    docs = _t(spark, sf_dir, "documents")
    return benchmark_decontamination(
        docs, "doc_id", "text", span_n=5, eval_mod=20
    )


ORACLE_BENCHMARK_DECONTAMINATION = f"""
WITH sh AS (
  SELECT doc_id, unnest({SQL_SHINGLES5}) AS sh FROM documents
), ev AS (
  SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0
)
SELECT sh.doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_spans,
  CAST(SUM(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_eval_hits,
  CAST(SUM(CASE WHEN ev.sh IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS contamination_fraction
FROM sh LEFT JOIN ev USING (sh)
WHERE sh.doc_id % 20 <> 0
GROUP BY sh.doc_id
"""


# --------------------------------------------------------------------------
# Friedman test (repeated-measures rank test over complete blocks)
# --------------------------------------------------------------------------


def _fold_sql(parts: list[str]) -> str:
    """The SQL mirror of :func:`_fixed_order_sum` — one textual
    left-fold ``((t0 + t1) + t2)`` shared by every oracle that must
    match a Spark fixed-order reduction (review finding, r8 second
    session: five hand-rolled copies of the determinism-critical
    idiom collapsed to one)."""
    acc = parts[0]
    for p in parts[1:]:
        acc = f"({acc} + {p})"
    return acc


def _cnt_cmp(op: str, j: int, k: int) -> F.Column:
    """Within-block comparison count for pivot column ``j``:
    Σ_i [v_i ≤ v_j] (``op='le'``) or Σ_i [v_i = v_j] (``op='eq'``)
    over the k pivoted cell values — exact integer expressions on
    DECIMAL cell sums, fixed left-fold order mirrored in the SQL."""
    terms = []
    for i in range(k):
        cmp = (
            F.col(f"v_{i}") <= F.col(f"v_{j}")
            if op == "le"
            else F.col(f"v_{i}") == F.col(f"v_{j}")
        )
        terms.append(F.when(cmp, 1).otherwise(0))
    return _fixed_order_sum(terms)


def _cnt_cmp_sql(op: str, j: int, k: int) -> str:
    sym = "<=" if op == "le" else "="
    return _fold_sql(
        [
            f"(CASE WHEN v_{i} {sym} v_{j} THEN 1 ELSE 0 END)"
            for i in range(k)
        ]
    )


def q_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman's repeated-measures rank test: does monthly revenue
    rank the five order priorities consistently, month after month?
    Blocks are calendar months (ym = year·100 + month), treatments
    the closed 5-priority domain, the cell value the block's exact
    cents total per priority. Friedman requires COMPLETE blocks —
    months missing a priority are dropped (the standard listwise
    convention, scipy.stats.friedmanchisquare's input contract).

    Scale shape: the only fact-scaled work is ONE month×priority
    aggregate (map-side partial, ≤ 12·years·k groups at any SF —
    the block domain is CALENDAR-bounded, not fact-bounded); ranks
    never touch a window or a sort. Within each block the k=5 cell
    values pivot to fixed columns and the DOUBLED average rank of
    column j is the exact integer 2·Σ[v_i ≤ v_j] − Σ[v_i = v_j] + 1
    (doubling keeps midpoint tie-ranks integral — the wilcoxon/
    kruskal convention, the ``r2_``/``2·`` naming making the
    carrier explicit). Per-block tie cubics come from
    Σ_j (cnt_eq_j² − 1) = Σ_groups (t³ − t). The emitted doubled
    rank sums / tie term are exact bigints; the only IEEE value is

        χ² = [12·(ΣR_j²)/(n·k·(k+1)) − 3·n·(k+1)]
             / (1 − Σ(t³−t)/(n·(k³−k)))

    assembled in one fixed operation order from exact integers
    (ΣR_j² = Σ(2R_j)²/4 — a power-of-two scaling, exact in IEEE),
    NULL when every block is fully tied (correction → 0, the NULLIF
    guard) or no complete block exists. A priority value outside the
    closed domain (or NULL) NULLs every derived statistic — the
    staged-r8 domain guard, counted here as ``n_bad`` over ALL
    months, incomplete ones included.

    Magnitude audit: per-cell cents sums ≈ 5e15 at sf100k (3.6e8
    orders/cell × ~1.5e7 cents) — accumulated in DECIMAL (not LONG,
    whose 9.2e18 ceiling would leave only ~1800× headroom and wrap
    silently with ANSI off), well inside DECIMAL(28,0) ✓; R2_j ≤
    2·n·k with n ≤ 12·calendar-years — the χ² operands never
    approach 2^53 ✓."""
    k = len(_PRIORITIES)
    tot = _friedman_tot(spark, sf_dir)
    nd = F.col("n_blocks").cast("double")
    sr2 = _fixed_order_sum(
        [
            F.col(f"rs2_{j}").cast("double")
            * F.col(f"rs2_{j}").cast("double")
            for j in range(k)
        ]
    )
    chi_un = F.try_divide(
        F.lit(12.0) * (sr2 / F.lit(4.0)),
        nd * F.lit(float(k * (k + 1))),
    ) - F.lit(3.0) * (nd * F.lit(float(k + 1)))
    corr = F.lit(1.0) - F.try_divide(
        F.col("tie_term").cast("double"), nd * F.lit(float(k**3 - k))
    )
    ok = (F.col("n_bad") == 0) & (F.col("n_blocks") > 0)
    names = ("urgent", "high", "medium", "notspec", "low")
    return tot.select(
        "n_blocks",
        *[
            F.when(ok, F.col(f"rs2_{j}")).alias(f"r2_{names[j]}")
            for j in range(k)
        ],
        F.when(ok, F.col("tie_term")).alias("tie_term"),
        F.when(
            ok, F.try_divide(chi_un, F.nullif(corr, F.lit(0.0)))
        ).alias("chi2_stat"),
    )


def _friedman_tot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared month×priority block machinery: the one-row frame
    (n_blocks, rs2_0..rs2_4, tie_term, n_bad) both `friedman_test`
    and `page_trend_test` finish from — see ``q_friedman_test`` for
    the plan-shape discussion."""
    k = len(_PRIORITIES)
    orders = _t(spark, sf_dir, "orders")
    rows = orders.select(
        (F.year("o_orderdate") * 100 + F.month("o_orderdate")).alias(
            "ym"
        ),
        F.col("o_orderpriority").alias("g"),
        _cents().alias("c"),
    )
    cells = rows.groupBy("ym").agg(
        *[
            # sum over _dec(c), not the raw bigint: a LONG
            # accumulator overflows at 9.2e18 while the audited
            # sf100k cell bound is ~1.5e19 — the decimal carrier
            # matches DuckDB's HUGEINT accumulation at every scale
            # (review finding, r8 second session)
            F.sum(F.when(F.col("g") == p, _dec(F.col("c"))))
            .cast("decimal(28,0)")
            .alias(f"v_{i}")
            for i, p in enumerate(_PRIORITIES)
        ],
        F.sum(
            F.when(F.col("g").isin(*_PRIORITIES), 0).otherwise(1)
        )
        .cast("bigint")
        .alias("bad"),
    )
    # completeness-guarded per-block expressions, so ONE aggregate
    # over the month-grain frame carries complete-block ranks AND the
    # all-months domain count — no second scan, no crossJoin (the
    # first draft recomputed the cells aggregate from a second
    # parquet scan for the bad-count branch; SUM-skips-NULLs folds
    # the incomplete blocks out identically in both engines)
    comp = F.col(f"v_{0}").isNotNull()
    for i in range(1, k):
        comp = comp & F.col(f"v_{i}").isNotNull()
    ranked = cells.select(
        "bad",
        comp.alias("is_complete"),
        *[
            F.when(
                comp,
                F.lit(2) * _cnt_cmp("le", j, k)
                - _cnt_cmp("eq", j, k)
                + F.lit(1),
            )
            .cast("bigint")
            .alias(f"r2_{j}")
            for j in range(k)
        ],
        F.when(
            comp,
            _fixed_order_sum(
                [
                    _cnt_cmp("eq", j, k) * _cnt_cmp("eq", j, k)
                    - F.lit(1)
                    for j in range(k)
                ]
            ),
        )
        .cast("bigint")
        .alias("tie_b"),
    )
    return ranked.agg(
        F.coalesce(
            F.sum(F.when(F.col("is_complete"), 1).otherwise(0)),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_blocks"),
        *[
            F.sum(f"r2_{j}").cast("bigint").alias(f"rs2_{j}")
            for j in range(k)
        ],
        F.sum("tie_b").cast("bigint").alias("tie_term"),
        F.coalesce(F.sum("bad"), F.lit(0)).cast("bigint").alias("n_bad"),
    )


def _friedman_cells_sql(k: int) -> str:
    vs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN o_orderpriority = '{p}' THEN {_CENTS} END)"
        f" AS DECIMAL(28,0)) AS v_{i}"
        for i, p in enumerate(_PRIORITIES)
    )
    doms = ", ".join(f"'{p}'" for p in _PRIORITIES)
    return f"""cells AS (
  SELECT (EXTRACT(year FROM o_orderdate) * 100
          + EXTRACT(month FROM o_orderdate)) AS ym,
         {vs},
         CAST(SUM(CASE WHEN o_orderpriority IN ({doms}) THEN 0
                       ELSE 1 END) AS BIGINT) AS bad
  FROM orders GROUP BY 1
)"""


def _friedman_ranked_sql(k: int) -> str:
    comp = " AND ".join(f"v_{i} IS NOT NULL" for i in range(k))
    r2s = ",\n         ".join(
        f"CAST(CASE WHEN ({comp}) THEN 2 * {_cnt_cmp_sql('le', j, k)}"
        f" - {_cnt_cmp_sql('eq', j, k)} + 1 END AS BIGINT) AS r2_{j}"
        for j in range(k)
    )
    tie = _fold_sql(
        [
            f"({_cnt_cmp_sql('eq', j, k)} * {_cnt_cmp_sql('eq', j, k)} - 1)"
            for j in range(k)
        ]
    )
    return f"""ranked AS (
  SELECT bad,
         ({comp}) AS is_complete,
         {r2s},
         CAST(CASE WHEN ({comp}) THEN {tie} END AS BIGINT) AS tie_b
  FROM cells
)"""


def _friedman_tot_sql() -> str:
    """The shared WITH-chain (cells → ranked → tot → fin) both the
    friedman and page oracles finish from."""
    k = len(_PRIORITIES)
    rs2 = ",\n         ".join(
        f"CAST(SUM(r2_{j}) AS BIGINT) AS rs2_{j}" for j in range(k)
    )
    return f"""WITH {_friedman_cells_sql(k)},
{_friedman_ranked_sql(k)},
tot AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN is_complete THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS n_blocks,
         {rs2},
         CAST(SUM(tie_b) AS BIGINT) AS tie_term,
         CAST(COALESCE(SUM(bad), 0) AS BIGINT) AS n_bad
  FROM ranked
), fin AS (
  SELECT *, (n_bad = 0 AND n_blocks > 0) AS ok,
         CAST(n_blocks AS DOUBLE) AS nd
  FROM tot
)"""


def _friedman_oracle_sql() -> str:
    k = len(_PRIORITIES)
    names = ("urgent", "high", "medium", "notspec", "low")
    sr2 = _fold_sql(
        [
            f"(CAST(rs2_{j} AS DOUBLE) * CAST(rs2_{j} AS DOUBLE))"
            for j in range(k)
        ]
    )
    emit_r2 = ",\n       ".join(
        f"CASE WHEN ok THEN rs2_{j} END AS r2_{names[j]}"
        for j in range(k)
    )
    kk1 = float(k * (k + 1))
    k3k = float(k**3 - k)
    return f"""
{_friedman_tot_sql()}
SELECT n_blocks,
       {emit_r2},
       CASE WHEN ok THEN tie_term END AS tie_term,
       CASE WHEN ok THEN
         ((12.0 * ({sr2} / 4.0)) / (nd * {kk1})
          - 3.0 * (nd * {float(k + 1)}))
         / NULLIF(1.0 - CAST(tie_term AS DOUBLE) / (nd * {k3k}), 0.0)
       END AS chi2_stat
FROM fin
"""


ORACLE_FRIEDMAN = _friedman_oracle_sql()


# --------------------------------------------------------------------------
# Page's trend test (ordered alternative over the friedman blocks)
# --------------------------------------------------------------------------


def q_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L trend test: do the five priorities rank monthly
    revenue in their ORDINAL order, month after month?  The
    ordered-alternative companion of ``friedman_test`` (exactly as
    ``jonckheere_terpstra`` is to ``kruskal_wallis``), sharing its
    complete-month-block machinery verbatim: L = Σ_j w_j·R_j with
    w_j = j the priority's ordinal position — and since the weighted
    sum commutes through the per-block rank sums, the whole statistic
    finishes from the SAME one-row tot frame (no extra fact work at
    all).

    Emitted: the DOUBLED weighted rank sum L2 = Σ_j j·R2_j as an
    exact bigint, and z as the only IEEE final from the classical
    no-ties moments (E[L2] = n·k(k+1)²/2, Var[L2] = n·k²(k+1)²(k−1)/36
    — the standard tabled form; average ranks handle ties in L
    itself, the variance keeps the no-ties convention, documented).
    NULL under the friedman domain guard, when no complete block
    exists, or when n·100 = Var[L2] is 0."""
    k = len(_PRIORITIES)
    tot = _friedman_tot(spark, sf_dir)
    l2 = _fixed_order_sum(
        [F.lit(j + 1) * F.col(f"rs2_{j}") for j in range(k)]
    ).cast("bigint")
    nd = F.col("n_blocks").cast("double")
    e2 = nd * F.lit(float(k * (k + 1) ** 2) / 2.0)
    var2 = nd * F.lit(float(k**2 * (k + 1) ** 2 * (k - 1)) / 36.0)
    ok = (F.col("n_bad") == 0) & (F.col("n_blocks") > 0)
    return tot.select(
        "n_blocks",
        F.when(ok, l2).alias("l2"),
        F.when(
            ok,
            F.try_divide(
                l2.cast("double") - e2,
                F.sqrt(F.nullif(var2, F.lit(0.0))),
            ),
        ).alias("z_stat"),
    )


def _page_oracle_sql() -> str:
    k = len(_PRIORITIES)
    l2 = _fold_sql([f"({j + 1} * rs2_{j})" for j in range(k)])
    e2c = float(k * (k + 1) ** 2) / 2.0
    v2c = float(k**2 * (k + 1) ** 2 * (k - 1)) / 36.0
    return f"""
{_friedman_tot_sql()}
SELECT n_blocks,
       CASE WHEN ok THEN CAST({l2} AS BIGINT) END AS l2,
       CASE WHEN ok THEN
         (CAST({l2} AS DOUBLE) - nd * {e2c})
         / sqrt(NULLIF(nd * {v2c}, 0.0))
       END AS z_stat
FROM fin
"""


ORACLE_PAGE_TREND = _page_oracle_sql()


# --------------------------------------------------------------------------
# Wald–Wolfowitz runs test (randomness of the daily-revenue sequence)
# --------------------------------------------------------------------------


def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the daily-revenue sequence RANDOM about its median, or does
    it trend/oscillate?  The Wald–Wolfowitz runs test: dichotomize
    each day's total against the grand TRUE median of daily totals
    (midpoint-interpolated on the doubled-cents grid — the
    brown_forsythe r8 convention; days exactly AT the median are
    dropped, the standard convention), count runs of consecutive
    same-sign days, and compare with the exact conditional moments

        E[R] = 1 + 2·n₁·n₂/n        (n = n₁+n₂)
        Var[R] = 2n₁n₂(2n₁n₂ − n) / (n²(n−1))

    Too FEW runs = trending/clustered days; too MANY = oscillation.

    Scale shape: the fact scan collapses to day grain first (ONE
    map-side partial aggregate); the median ranks, the sign lag and
    the run count all live on the bounded ~2.4k-row day frame (the
    documented day-grain window class — two unpartitioned windows
    over a calendar-bounded input, never over fact rows). n₁/n₂/R
    are exact bigints; z is the only IEEE final, one fixed operation
    order over those integers. NULL when fewer than two signed days
    or when every day sits at the median (Var → 0)."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(_cents()).cast("decimal(28,0)").alias("v")
    )
    wrk = Window.orderBy("v", "day")
    rk = d.select("v", F.row_number().over(wrk).alias("rk"))
    nf = rk.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    # doubled-grid midpoint median: v[⌊(n+1)/2⌋] + v[⌊n/2⌋+1]
    # (lo == hi for odd n, so the two CASE sums double the value)
    med = rk.crossJoin(F.broadcast(nf)).agg(
        (
            F.sum(
                F.when(
                    F.col("rk")
                    == F.floor((F.col("n_days") + 1) / 2).cast("int"),
                    F.col("v"),
                ).otherwise(F.lit(0))
            )
            + F.sum(
                F.when(
                    F.col("rk")
                    == (F.floor(F.col("n_days") / 2) + 1).cast("int"),
                    F.col("v"),
                ).otherwise(F.lit(0))
            )
        )
        .cast("decimal(29,0)")
        .alias("m2")
    )
    signed = (
        d.crossJoin(F.broadcast(med))
        .select(
            "day",
            F.when(F.lit(2) * F.col("v") > F.col("m2"), 1)
            .when(F.lit(2) * F.col("v") < F.col("m2"), 0)
            .alias("s"),
        )
        .filter(F.col("s").isNotNull())
    )
    wlag = Window.orderBy("day")
    runs = signed.select(
        "s", F.lag("s").over(wlag).alias("prev")
    )
    tot = runs.agg(
        F.coalesce(
            F.sum(F.when(F.col("s") == 1, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_above"),
        F.coalesce(
            F.sum(F.when(F.col("s") == 0, 1).otherwise(0)), F.lit(0)
        )
        .cast("bigint")
        .alias("n_below"),
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("s") != F.col("prev")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("r_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    nn = n1 + n2
    two12 = F.lit(2.0) * (n1 * n2)
    e_r = F.lit(1.0) + F.try_divide(two12, nn)
    var_r = F.try_divide(
        two12 * (two12 - nn), (nn * nn) * (nn - F.lit(1.0))
    )
    return tot.select(
        "n_above",
        "n_below",
        "r_runs",
        F.try_divide(
            F.col("r_runs").cast("double") - e_r,
            F.sqrt(
                F.when(var_r > F.lit(0.0), var_r)
            ),
        ).alias("z_stat"),
    )


ORACLE_RUNS_TEST = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           AS BIGINT)) AS DECIMAL(28,0)) AS v
  FROM orders GROUP BY 1
), rk AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v, day) AS rk FROM d
), nf AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM rk
), med AS (
  SELECT CAST(SUM(CASE WHEN rk = CAST(floor((n_days + 1) / 2) AS INT)
                       THEN v ELSE 0 END)
            + SUM(CASE WHEN rk = CAST(floor(n_days / 2) + 1 AS INT)
                       THEN v ELSE 0 END) AS DECIMAL(29,0)) AS m2
  FROM rk, nf
), signed AS (
  SELECT day,
         CASE WHEN 2 * v > m2 THEN 1
              WHEN 2 * v < m2 THEN 0 END AS s
  FROM d, med
  WHERE 2 * v <> m2
), runs AS (
  SELECT s, LAG(s) OVER (ORDER BY day) AS prev FROM signed
), tot AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS n_above,
         CAST(COALESCE(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS n_below,
         CAST(SUM(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END)
           AS BIGINT) AS r_runs
  FROM runs
), fin AS (
  SELECT *,
         CAST(n_above AS DOUBLE) AS n1,
         CAST(n_below AS DOUBLE) AS n2
  FROM tot
)
SELECT n_above, n_below, r_runs,
       (CAST(r_runs AS DOUBLE)
        - (1.0 + (2.0 * (n1 * n2)) / (n1 + n2)))
       / sqrt(CASE WHEN (2.0 * (n1 * n2)) * (2.0 * (n1 * n2) - (n1 + n2))
                        / (((n1 + n2) * (n1 + n2)) * ((n1 + n2) - 1.0))
                   > 0.0
                   THEN (2.0 * (n1 * n2)) * (2.0 * (n1 * n2) - (n1 + n2))
                        / (((n1 + n2) * (n1 + n2)) * ((n1 + n2) - 1.0))
              END) AS z_stat
FROM fin
"""


# --------------------------------------------------------------------------
# Cochran's Q (binary repeated-measures over users × the funnel trio)
# --------------------------------------------------------------------------

#: the funnel trio — a closed treatment domain BY CONSTRUCTION (the
#: plan filters to exactly these three types, so no domain guard is
#: needed: an unexpected event_type is simply not a treatment).
_FUNNEL_TYPES = ("view", "click", "purchase")


def q_cochrans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q: is each funnel stage the DOMINANT one for the
    same fraction of users?  The k-treatment generalization of
    McNemar (``mcnemar_test`` is the k=2 special case): blocks are
    users, treatment j's binary response "stage j is strictly above
    the user's own mean funnel count" (k·n_ij > Σ_j n_ij — a
    self-normalizing indicator: the synthetic corpus gives every
    active user ALL three stage types, so the plain ever-did-j
    response would be identically 1 and the statistic degenerate at
    every SF; dominance-vs-own-mean discriminates at any density and
    needs no tuned threshold), and Q tests marginal homogeneity of
    the k dominance rates.

    ENTIRELY IEEE-FREE (the anova/ks playbook at birth): with column
    sums C_j, N = ΣR_i and ΣR_i² all exact integers from ONE
    user-grain aggregate + ONE global aggregate,

        Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²)

    (the textbook k(k−1)Σ(C_j − N/k)²/(kΣR−ΣR²) with the mean folded
    in exactly — Cauchy-Schwarz keeps the numerator ≥ 0, so `_idiv`'s
    non-negative contract holds) and the emitted statistic is exact
    integer micro-units via `_idiv` (HUGEINT ``//`` in the oracle).
    NULL when no user discords (every R_i ∈ {0, k} ⇒ the denominator
    ΣR_i(k−R_i) = 0 — with this indicator, every user's stage counts
    exactly balanced).

    Scale shape: blocks are FACT-SCALED (millions of users) — the
    user-grain aggregate partial-aggregates map-side and shuffles one
    row per user; the treatments pivot into k=3 fixed columns, so no
    window, no join, no sort anywhere. Magnitude audit: C_j ≤ 1.5e10
    users at sf100k ⇒ k·ΣC_j² ≤ 2e21, numerator·10⁶ ≤ 4e27 <
    DECIMAL(38,0) ✓; quotient ≤ k·10⁶·b ≈ 4.5e16 < 2^63 ✓
    (emitted BIGINT)."""
    k = len(_FUNNEL_TYPES)
    events = _t(spark, sf_dir, "events")
    counts = (
        events.filter(F.col("event_type").isin(*_FUNNEL_TYPES))
        .groupBy("user_id")
        .agg(
            *[
                F.sum(
                    F.when(F.col("event_type") == t, 1).otherwise(0)
                ).alias(f"n_{i}")
                for i, t in enumerate(_FUNNEL_TYPES)
            ]
        )
    )
    ntot = _fixed_order_sum([F.col(f"n_{i}") for i in range(k)])
    pu = counts.select(
        *[
            F.when(F.lit(k) * F.col(f"n_{i}") > ntot, 1)
            .otherwise(0)
            .alias(f"x_{i}")
            for i in range(k)
        ]
    )
    r = _fixed_order_sum([F.col(f"x_{i}") for i in range(k)])
    tot = pu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        *[
            F.sum(f"x_{i}").cast("bigint").alias(f"c_{i}")
            for i in range(k)
        ],
        F.sum(r).cast("bigint").alias("sr"),
        F.sum(r * r).cast("bigint").alias("sr2"),
    )
    csq = _fixed_order_sum(
        [_dec(F.col(f"c_{i}")) * _dec(F.col(f"c_{i}")) for i in range(k)]
    ).cast("decimal(38,0)")
    num = (
        F.lit(k - 1)
        * (F.lit(k) * csq - _dec(F.col("sr")) * _dec(F.col("sr")))
    ).cast("decimal(38,0)")
    den = (F.lit(k) * _dec(F.col("sr")) - _dec(F.col("sr2"))).cast(
        "decimal(38,0)"
    )
    return tot.select(
        "n_blocks",
        F.col("c_0").alias("dom_view"),
        F.col("c_1").alias("dom_click"),
        F.col("c_2").alias("dom_purchase"),
        _idiv(num * F.lit(1000000), den).cast("bigint").alias("q_micro"),
    )


ORACLE_COCHRANS_Q = f"""
WITH counts AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_0,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_1,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_2
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY 1
), pu AS (
  SELECT CASE WHEN 3 * n_0 > ((n_0 + n_1) + n_2) THEN 1 ELSE 0 END AS x_0,
         CASE WHEN 3 * n_1 > ((n_0 + n_1) + n_2) THEN 1 ELSE 0 END AS x_1,
         CASE WHEN 3 * n_2 > ((n_0 + n_1) + n_2) THEN 1 ELSE 0 END AS x_2
  FROM counts
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
         CAST(SUM(x_0) AS BIGINT) AS c_0,
         CAST(SUM(x_1) AS BIGINT) AS c_1,
         CAST(SUM(x_2) AS BIGINT) AS c_2,
         CAST(SUM((x_0 + x_1) + x_2) AS BIGINT) AS sr,
         CAST(SUM(((x_0 + x_1) + x_2) * ((x_0 + x_1) + x_2)) AS BIGINT)
           AS sr2
  FROM pu
)
SELECT n_blocks,
       c_0 AS dom_view, c_1 AS dom_click, c_2 AS dom_purchase,
       CAST(CAST(2 * (3 * ((CAST(c_0 AS HUGEINT) * c_0
                  + CAST(c_1 AS HUGEINT) * c_1)
                  + CAST(c_2 AS HUGEINT) * c_2)
               - CAST(sr AS HUGEINT) * sr) AS HUGEINT) * 1000000
            // NULLIF(3 * CAST(sr AS HUGEINT) - sr2, 0) AS BIGINT)
         AS q_micro
FROM tot
"""


# --------------------------------------------------------------------------
# Durbin-Watson (serial correlation of the daily-revenue trend fit)
# --------------------------------------------------------------------------


def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are the residuals of the daily-revenue-vs-time OLS fit
    serially correlated?  The Durbin-Watson statistic
    DW = Σ(e_t − e_{t−1})² / Σe_t² — the regression companion of
    ``daily_autocorrelation`` (DW ≈ 2(1−ρ₁)): DW ≪ 2 means the
    linear trend under-fits a persistent signal, DW ≫ 2 oscillation.

    Determinism (the anova-r8 lesson applied at birth — DECIMAL
    carriers past 2^53 must never convert to DOUBLE in a hashed
    row): the OLS slope/intercept are fixed-order doubles over exact
    integer sums (bit-identical across engines), each day's residual
    is the same fixed-order expression and is floor-quantized to
    CENTS integers (`_floor_sat_safe`; residuals ≤ ~1e13 cents keep
    every square < 1e26 and the ~2.4k-day sums < 1e30, inside
    DECIMAL(38,0)); both quadratic sums are then EXACT integers and
    the emitted statistic is exact micro-units via `_idiv` (HUGEINT
    ``//`` in the oracle) — no double anywhere in the row. The cents
    grid IS the documented definition of this key's DW (the residue
    vs the unquantized statistic is O(1/|e|), immaterial at cents
    scale — pinned loosely by the brute-force twin).

    Scale shape: ONE map-side day aggregate is the only fact-scaled
    work; the index/residual/lag machinery lives on the bounded
    ~2.4k-row day frame (the documented day-grain window class).
    NULL when the fit is exact (Σe² = 0) or under two days."""
    orders = _t(spark, sf_dir, "orders")
    d = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(_cents()).cast("decimal(28,0)").alias("y")
    )
    wday = Window.orderBy("day")
    idx = d.select(
        "day",
        "y",
        (F.row_number().over(wday) - 1).cast("bigint").alias("t"),
    )
    s = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("t").cast("decimal(19,0)").alias("st"),
        F.sum(F.col("t") * F.col("t")).cast("decimal(28,0)").alias("st2"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(_dec(F.col("t")) * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sty"),
    )
    nd = F.col("n_days").cast("double")
    std = F.col("st").cast("double")
    st2d = F.col("st2").cast("double")
    syd = F.col("sy").cast("double")
    styd = F.col("sty").cast("double")
    slope = F.try_divide(
        nd * styd - std * syd, F.nullif(nd * st2d - std * std, F.lit(0.0))
    )
    res = idx.crossJoin(F.broadcast(s)).select(
        "day",
        _floor_sat_safe(
            F.col("y").cast("double")
            - (
                F.try_divide(syd - slope * std, nd)
                + slope * F.col("t").cast("double")
            ),
            "decimal(19,0)",
        ).alias("e"),
    )
    lagged = res.select(
        "e", F.lag("e").over(Window.orderBy("day")).alias("prev")
    )
    tot = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(_dec(F.col("e")) * F.col("e"))
        .cast("decimal(38,0)")
        .alias("ss_resid_c2"),
        F.sum(
            F.when(
                F.col("prev").isNotNull(),
                (_dec(F.col("e")) - F.col("prev"))
                * (_dec(F.col("e")) - F.col("prev")),
            )
        )
        .cast("decimal(38,0)")
        .alias("ss_diff_c2"),
    )
    return tot.select(
        "n_days",
        # STRING on both engines (r9 materialized-dtype parity — the
        # anova class, caught by selfcheck's new gate before
        # registration); exact non-negative integers, plain digits.
        F.col("ss_diff_c2").cast("string").alias("ss_diff_c2"),
        F.col("ss_resid_c2").cast("string").alias("ss_resid_c2"),
        _idiv(
            F.col("ss_diff_c2") * F.lit(1000000), F.col("ss_resid_c2")
        )
        .cast("bigint")
        .alias("dw_micro"),
    )


ORACLE_DURBIN_WATSON = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
           AS BIGINT)) AS DECIMAL(28,0)) AS y
  FROM orders GROUP BY 1
), idx AS (
  SELECT day, y,
         CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT) AS t
  FROM d
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(t) AS DECIMAL(19,0)) AS st,
         CAST(SUM(t * t) AS DECIMAL(28,0)) AS st2,
         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(t AS DECIMAL(19,0)) * y) AS DECIMAL(38,0)) AS sty
  FROM idx
), sl AS (
  SELECT *,
         (CAST(n_days AS DOUBLE) * CAST(sty AS DOUBLE)
          - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
         / NULLIF(CAST(n_days AS DOUBLE) * CAST(st2 AS DOUBLE)
          - CAST(st AS DOUBLE) * CAST(st AS DOUBLE), 0.0) AS slope
  FROM s
), res AS (
  SELECT day,
         CAST(floor(CAST(y AS DOUBLE)
           - ((CAST(sy AS DOUBLE) - slope * CAST(st AS DOUBLE))
              / CAST(n_days AS DOUBLE)
              + slope * CAST(t AS DOUBLE))) AS DECIMAL(19,0)) AS e
  FROM idx, sl
), lagged AS (
  SELECT e, LAG(e) OVER (ORDER BY day) AS prev FROM res
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(e * e) AS DECIMAL(38,0)) AS ss_resid_c2,
         CAST(SUM(CASE WHEN prev IS NOT NULL
                       THEN (e - prev) * (e - prev) END)
           AS DECIMAL(38,0)) AS ss_diff_c2
  FROM lagged
)
SELECT n_days,
       CAST(ss_diff_c2 AS VARCHAR) AS ss_diff_c2,
       CAST(ss_resid_c2 AS VARCHAR) AS ss_resid_c2,
       CAST(CAST(ss_diff_c2 AS HUGEINT) * 1000000
            // NULLIF(CAST(ss_resid_c2 AS HUGEINT), 0) AS BIGINT)
         AS dw_micro
FROM tot
"""


# Round-9 registration payload — NOT imported by registry.py this
# round (the freeze). Registration is:
#   from .staged_r9_queries import REGISTRY_STAGED_R9
#   REGISTRY.update(REGISTRY_STAGED_R9)
# plus fronting the eleven keys in _PRIORITY (new-code-first rule).
REGISTRY_STAGED_R9: dict = {
    "ks_two_sample": (q_ks_two_sample, ORACLE_KS_TWO_SAMPLE),
    "jonckheere_terpstra": (q_jonckheere_terpstra, ORACLE_JONCKHEERE),
    "mood_median_test": (q_mood_median_test, ORACLE_MOOD_MEDIAN),
    "cramers_v": (q_cramers_v, ORACLE_CRAMERS_V),
    "wilcoxon_signed_rank": (q_wilcoxon_signed_rank, ORACLE_WILCOXON),
    "benchmark_decontamination": (
        q_benchmark_decontamination,
        ORACLE_BENCHMARK_DECONTAMINATION,
    ),
    "friedman_test": (q_friedman_test, ORACLE_FRIEDMAN),
    "cochrans_q": (q_cochrans_q, ORACLE_COCHRANS_Q),
    "page_trend_test": (q_page_trend_test, ORACLE_PAGE_TREND),
    "runs_test": (q_runs_test, ORACLE_RUNS_TEST),
    "durbin_watson": (q_durbin_watson, ORACLE_DURBIN_WATSON),
}
