"""Round-3 statistical-inference surface: distributed exact
hypothesis tests and distribution diagnostics the reference's pandas
pipeline would delegate to scipy on collected data — re-expressed as
shuffle-grain aggregations (value-grain rank decompositions, decimal
power sums, calendar-bounded pair frames) so they run on 100 TB
without a global sort or a driver collect.

Shared determinism rules (the engine playbook): exact integer/
decimal accumulation everywhere an engine could reorder float adds;
doubles only in final scalar formulas written in ONE fixed operation
order mirrored textually between the Spark plan and the DuckDB
oracle; ``round(_, 6)`` before emitting any libm-derived value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.stats import rank_sum_stats

REGISTRY_STATS: dict = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .testdata_queries import _t as base_t

    return base_t(spark, sf_dir, name)


_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _cents() -> F.Column:
    return (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )


# --------------------------------------------------------------------------
# Mann-Whitney U (two-sample rank-sum test)
# --------------------------------------------------------------------------


def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do URGENT orders have stochastically larger totals than LOW
    ones?  Mann-Whitney U on order value between the two priority
    groups — the distribution-free A/B test (no normality assumption,
    unlike ``ab_test_zscores``).  Value-grain rank-sum decomposition
    (operators/stats.py): no global sort, no collect; the pooled-rank
    formulation is re-expressed as an exact distributed prefix sum
    over distinct values."""
    orders = _t(spark, sf_dir, "orders")
    two = orders.filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    ).select(
        _cents().alias("v"),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_pos"),
    )
    return rank_sum_stats(two, "v", "is_pos")


ORACLE_MANN_WHITNEY = f"""
WITH s AS (
  SELECT {_CENTS} AS v, (o_orderpriority = '1-URGENT') AS is_pos
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
), g AS (
  SELECT v,
         CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM s GROUP BY 1
), p AS (
  SELECT v, c1, c2,
         COALESCE(SUM(c2) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum2
  FROM g
), a AS (
  SELECT CAST(SUM(c1) AS DECIMAL(38,0)) AS n1,
         CAST(SUM(c2) AS DECIMAL(38,0)) AS n2,
         CAST(SUM(CAST(c1 AS DECIMAL(19,0))
              * (2 * CAST(cum2 AS DECIMAL(14,0)) + c2)) AS DECIMAL(38,0)) AS u2,
         CAST(SUM(CAST(c1 + c2 AS DECIMAL(12,0))
                  * CAST(c1 + c2 AS DECIMAL(12,0))
                  * CAST(c1 + c2 AS DECIMAL(12,0))
              - (c1 + c2)) AS DECIMAL(38,0)) AS ties
  FROM p
)
SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n2 AS BIGINT) AS n_neg,
       CAST(u2 AS DOUBLE) / 2.0 AS u_pos,
       ROUND((CAST(u2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             / (2.0 * sqrt(NULLIF(
                 (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                 * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                    - CAST(ties AS DOUBLE)
                      / (CAST(n1 + n2 AS DOUBLE)
                         * (CAST(n1 + n2 AS DOUBLE) - 1.0))), 0.0))), 6) AS z,
       ROUND(CAST(u2 AS DOUBLE)
             / (2.0 * NULLIF(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0.0)),
             6) AS auc
FROM a
"""


# --------------------------------------------------------------------------
# ROC AUC (same statistic, score-vs-label reading)
# --------------------------------------------------------------------------


def q_auc_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How well does raw document length separate English from
    non-English docs?  ROC AUC of ``n_chars`` as a score for
    ``lang = 'en'`` — the Mann-Whitney statistic read as
    P(score_pos > score_neg) with ties counting half. Same
    value-grain distributed plan as ``mann_whitney_u``; a model-eval
    primitive every training pipeline needs at corpus scale."""
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        F.col("n_chars").alias("v"),
        (F.col("lang") == "en").alias("is_pos"),
    )
    return rank_sum_stats(scored, "v", "is_pos")


ORACLE_AUC_DOC_LENGTH = """
WITH s AS (
  SELECT n_chars AS v, (lang = 'en') AS is_pos FROM documents
), g AS (
  SELECT v,
         CAST(SUM(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN is_pos THEN 0 ELSE 1 END) AS BIGINT) AS c2
  FROM s GROUP BY 1
), p AS (
  SELECT v, c1, c2,
         COALESCE(SUM(c2) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum2
  FROM g
), a AS (
  SELECT CAST(SUM(c1) AS DECIMAL(38,0)) AS n1,
         CAST(SUM(c2) AS DECIMAL(38,0)) AS n2,
         CAST(SUM(CAST(c1 AS DECIMAL(19,0))
              * (2 * CAST(cum2 AS DECIMAL(14,0)) + c2)) AS DECIMAL(38,0)) AS u2,
         CAST(SUM(CAST(c1 + c2 AS DECIMAL(12,0))
                  * CAST(c1 + c2 AS DECIMAL(12,0))
                  * CAST(c1 + c2 AS DECIMAL(12,0))
              - (c1 + c2)) AS DECIMAL(38,0)) AS ties
  FROM p
)
SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n2 AS BIGINT) AS n_neg,
       CAST(u2 AS DOUBLE) / 2.0 AS u_pos,
       ROUND((CAST(u2 AS DOUBLE) - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))
             / (2.0 * sqrt(NULLIF(
                 (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                 * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                    - CAST(ties AS DOUBLE)
                      / (CAST(n1 + n2 AS DOUBLE)
                         * (CAST(n1 + n2 AS DOUBLE) - 1.0))), 0.0))), 6) AS z,
       ROUND(CAST(u2 AS DOUBLE)
             / (2.0 * NULLIF(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE), 0.0)),
             6) AS auc
FROM a
"""


# --------------------------------------------------------------------------
# Distribution moments (exact skewness / kurtosis from power sums)
# --------------------------------------------------------------------------


def q_distribution_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of order value per
    priority — NOT Spark's ``skewness()``/``kurtosis()`` builtins,
    whose double accumulation is partition-order-dependent: the
    central moments are expanded into raw power sums Σx..Σx⁴ held
    EXACTLY in decimal (price as DECIMAL(8,2): x⁴ is DECIMAL(35,8),
    inside the 38-digit exactness bound at any realistic SF), so the
    one map-side-combined shuffle is bit-reproducible and the float
    math is five scalar ops per group at the end."""
    orders = _t(spark, sf_dir, "orders")
    p = F.col("o_totalprice").cast("decimal(8,2)")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(p).cast("decimal(38,2)").alias("s1"),
        F.sum(p * p).cast("decimal(38,4)").alias("s2"),
        F.sum(p * p * p).cast("decimal(38,6)").alias("s3"),
        F.sum(p * p * p * p).cast("decimal(38,8)").alias("s4"),
    )
    # fixed-order double formulas, mirrored textually in the oracle
    mom = agg.selectExpr(
        "o_orderpriority",
        "n",
        "CAST(s1 AS DOUBLE) / n AS mu",
        "CAST(s2 AS DOUBLE) / n"
        " - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2",
        "CAST(s3 AS DOUBLE) / n"
        " - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)"
        " + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)"
        " * (CAST(s1 AS DOUBLE) / n) AS m3",
        "CAST(s4 AS DOUBLE) / n"
        " - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)"
        " + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)"
        " * (CAST(s2 AS DOUBLE) / n)"
        " - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)"
        " * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4",
    )
    return mom.select(
        "o_orderpriority",
        "n",
        F.round("mu", 6).alias("mean_price"),
        F.round(F.expr("m3 / (m2 * sqrt(m2))"), 6).alias("skewness"),
        F.round(F.expr("m4 / (m2 * m2) - 3.0"), 6).alias("excess_kurtosis"),
    ).orderBy("o_orderpriority")


ORACLE_MOMENTS = """
WITH pw AS (
  -- staged widening casts: each step is exact (values fit), only the
  -- declared width grows, keeping DuckDB's intermediate-width cap happy
  SELECT o_orderpriority, p,
         CAST(p * p AS DECIMAL(19,4)) AS p2,
         CAST(CAST(p * p AS DECIMAL(19,4)) * p AS DECIMAL(29,6)) AS p3,
         CAST(CAST(CAST(p * p AS DECIMAL(19,4)) * p AS DECIMAL(29,6)) * p
              AS DECIMAL(38,8)) AS p4
  FROM (SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(8,2)) AS p
        FROM orders)
), a AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(p) AS DECIMAL(38,2)) AS s1,
         CAST(SUM(p2) AS DECIMAL(38,4)) AS s2,
         CAST(SUM(p3) AS DECIMAL(38,6)) AS s3,
         CAST(SUM(p4) AS DECIMAL(38,8)) AS s4
  FROM pw
  GROUP BY 1
), m AS (
  SELECT o_orderpriority, n,
    CAST(s1 AS DOUBLE) / n AS mu,
    CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
    CAST(s3 AS DOUBLE) / n
      - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
      + 2.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m3,
    CAST(s4 AS DOUBLE) / n
      - 4.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
      + 6.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
      - 3.0 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m4
  FROM a
)
SELECT o_orderpriority, n,
       ROUND(mu, 6) AS mean_price,
       ROUND(m3 / (m2 * sqrt(m2)), 6) AS skewness,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
FROM m ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Per-group OLS regression (trend slope of daily revenue)
# --------------------------------------------------------------------------


def q_regression_slope_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of daily revenue (cents) against the day index per
    order priority: slope (cents/day), intercept, and r² — NOT
    Spark's ``regr_slope`` builtin (double accumulation,
    partition-order-dependent): the normal equations use exact
    decimal sums of bounded integers (x = days since 1992-01-01, a
    calendar-bounded index; y = exact cents), one map-side-combined
    shuffle, doubles only in the three final divisions."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        "o_orderpriority",
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(_cents()).alias("y"))
    d = daily.select(
        "o_orderpriority",
        F.datediff(F.col("day"), F.lit("1992-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        "y",
    )
    dx = F.col("x").cast("decimal(19,0)")
    dy = F.col("y").cast("decimal(19,0)")
    s = d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(dx).cast("decimal(38,0)").alias("sx"),
        F.sum(dy).cast("decimal(38,0)").alias("sy"),
        F.sum(dx * dy).cast("decimal(38,0)").alias("sxy"),
        F.sum(dx * dx).cast("decimal(38,0)").alias("sxx"),
        F.sum(dy * dy).cast("decimal(38,0)").alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    deny = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    slope = num / den
    return s.select(
        "o_orderpriority",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(slope, 6).alias("slope_cents_per_day"),
        F.round(
            (
                F.col("sy").cast("double")
                - slope * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
            6,
        ).alias("intercept_cents"),
        F.round(num * num / (den * deny), 6).alias("r2"),
    ).orderBy("o_orderpriority")


ORACLE_REGRESSION = f"""
WITH daily AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
         SUM({_CENTS}) AS y
  FROM orders GROUP BY 1, 2
), d AS (
  SELECT o_orderpriority,
         CAST(datediff('day', DATE '1992-01-01', day) AS BIGINT) AS x, y
  FROM daily
), s AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         SUM(CAST(x AS DECIMAL(19,0))) AS sx,
         SUM(CAST(y AS DECIMAL(19,0))) AS sy,
         SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
         SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
         SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy
  FROM d GROUP BY 1
)
SELECT o_orderpriority, CAST(n AS BIGINT) AS n_days,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_cents_per_day,
       ROUND((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS intercept_cents,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
FROM s ORDER BY o_orderpriority
"""


REGISTRY_STATS.update(
    {
        "mann_whitney_u": (q_mann_whitney_u, ORACLE_MANN_WHITNEY),
        "auc_doc_length": (q_auc_doc_length, ORACLE_AUC_DOC_LENGTH),
        "distribution_moments": (q_distribution_moments, ORACLE_MOMENTS),
        "regression_slope_daily": (
            q_regression_slope_daily,
            ORACLE_REGRESSION,
        ),
    }
)
