"""Engine-unambiguous float quantization for emitted finals.

Why this module exists: ``ROUND(DOUBLE, d)`` with ``d > 0`` is
engine-AMBIGUOUS — Spark rounds via exact ``BigDecimal`` HALF_UP
while DuckDB scales by ``10^d`` in floating point, and the two can
differ by 1 output ulp on the same input double across engine
versions (it bit this repo once: ``anova_oneway`` hash-failed in the
round-6 driver environment while passing bit-exact locally,
VERDICT r6). ``floor`` has no such ambiguity: both engines floor the
identical double toward −infinity, so ``floor(x * 1e6) / 1e6`` is a
pure function of ``x`` with the SAME text and the SAME result in
both engines.

When to use what (the emitted-final playbook, round 7):

- value derived from exact integer/decimal sums via ``+ - * /
  sqrt`` in one fixed operation order → emit the RAW double. All
  five ops are correctly rounded by IEEE 754, so the value is
  bit-identical across engines; quantization adds nothing.
- value touched by libm (``log`` ``exp`` ``pow`` ``sin`` …) or by a
  float-accumulated aggregate (``AVG(double)``, ``SUM(double)``)
  → quantize with :func:`q6` / ``q6_sql`` below. libm functions are
  only ~1-ulp-accurate and float sums are order-dependent, so the
  raw double may differ across engines; flooring at a 1e-6 quantum
  absorbs that noise everywhere except the measure-zero boundary
  strip (the same cliff width ROUND had at half-way points, minus
  ROUND's implementation ambiguity).

The ``2^53`` gate: Spark's ``floor(DOUBLE)`` returns BIGINT and
silently saturates at ``Long.MAX`` past ``2^63`` (pyspark-traps
memory; ``_floor_sat_safe`` in ``plans/stats_queries.py``), and
above ``2^53`` micro-units the 1e-6 quantum is unrepresentable
anyway — while the ``* 1e6 / 1e6`` round-trip would CHANGE a large
value (two float roundings). So past the gate both sides emit the
value untouched; below it both floor. The gate compares
``abs(x * 1e6)``, the exact product both engines already computed,
so the branch taken is engine-identical too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 2^53 — smallest double magnitude at which the spacing between
# adjacent doubles reaches 1.0 (all larger doubles are integral)
_GATE = 9007199254740992.0


def q6(x: Column) -> Column:
    """Quantize a double to the 1e-6 grid by flooring — the
    engine-unambiguous replacement for ``F.round(x, 6)`` finals.
    Textual SQL mirror: ``q6_sql``."""
    xi = x.cast("double") * F.lit(1e6)
    return (
        F.when(F.abs(xi) < F.lit(_GATE), F.floor(xi).cast("double") / F.lit(1e6))
        .otherwise(x.cast("double"))
    )


def q6_sql(expr: str) -> str:
    """DuckDB-side textual mirror of :func:`q6`. ``expr`` is spliced
    three times, so pass a short column reference (name the value in
    a CTE first if it is a long formula)."""
    return (
        f"CASE WHEN abs(CAST(({expr}) AS DOUBLE) * 1e6) < 9007199254740992.0 "
        f"THEN floor(CAST(({expr}) AS DOUBLE) * 1e6) / 1e6 "
        f"ELSE CAST(({expr}) AS DOUBLE) END"
    )


def q9(x: Column) -> Column:
    """1e-9-grid twin of :func:`q6` for finals that were rounded at
    9 digits."""
    xi = x.cast("double") * F.lit(1e9)
    return (
        F.when(F.abs(xi) < F.lit(_GATE), F.floor(xi).cast("double") / F.lit(1e9))
        .otherwise(x.cast("double"))
    )


def q9_sql(expr: str) -> str:
    """DuckDB-side textual mirror of :func:`q9`."""
    return (
        f"CASE WHEN abs(CAST(({expr}) AS DOUBLE) * 1e9) < 9007199254740992.0 "
        f"THEN floor(CAST(({expr}) AS DOUBLE) * 1e9) / 1e9 "
        f"ELSE CAST(({expr}) AS DOUBLE) END"
    )
