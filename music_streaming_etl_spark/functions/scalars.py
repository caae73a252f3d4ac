"""Scalar functions (SURVEY.md §2.6, §2.2).

The reference's entire scalar surface: timestamp→date (``:182``),
timestamp→hour (``:199``), string→timestamp parse (``:118,176``),
division (``:205``), int/float casts (``:300-311``), and the
CSV-boundary stringification of the ``top_artists`` list (``:211`` —
pandas ``to_csv`` renders a Python list as ``"['a', 'b']"``).
All are native Column expressions — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def derive_date(ts: Column | str) -> Column:
    """P2 — timestamp → date (``listen_time.dt.date``, ref :182)."""
    return F.to_date(ts)


def derive_hour(ts: Column | str) -> Column:
    """P3 — timestamp → hour-of-day 0–23 (``dt.hour``, ref :199).
    Note: hour-of-day across all dates, NOT per (date, hour)."""
    return F.hour(ts)


def parse_timestamp(s: Column | str, fmt: str | None = None) -> Column:
    """P4 — string → timestamp (``pd.read_csv(parse_dates=…)``,
    ref :118,176). Without a format Spark parses ISO-8601, matching
    pandas' default on the reference's ``YYYY-MM-DD HH:MM:SS`` data."""
    return F.to_timestamp(s, fmt) if fmt else F.to_timestamp(s)


def cast_bigint(c: Column | str) -> Column:
    """P5 — nullable-int cast (pandas ``astype("Int64")``, ref :300-307).
    Spark longs are nullable by default, so Int64 semantics are free."""
    return F.col(c).cast("bigint") if isinstance(c, str) else c.cast("bigint")


def cast_double(c: Column | str) -> Column:
    """P5 — float cast (pandas ``astype("float64")``, ref :308-311)."""
    return F.col(c).cast("double") if isinstance(c, str) else c.cast("double")


def python_list_literal(arr: Column | str) -> Column:
    """Render ``array<string>`` exactly as pandas ``to_csv`` renders a
    Python list: ``['a', 'b']`` with ", " separators and Python
    ``repr`` quote rules per element (ref :211 — how ``top_artists``
    lands in Redshift as TEXT):

    - contains ``'`` but no ``"`` → double-quoted: ``"Guns N' Roses"``
    - contains both quotes → single-quoted, ``'`` backslash-escaped
    - otherwise → single-quoted; backslashes always double

    Parity is exact for printable strings (repr additionally hex-escapes
    control characters — out of scope for artist names).
    Empty array → ``[]``; null array → null.
    """
    col = F.col(arr) if isinstance(arr, str) else arr

    def render(x: Column) -> Column:
        esc = F.replace(x, F.lit("\\"), F.lit("\\\\"))
        has_sq = x.contains("'")
        has_dq = x.contains('"')
        return (
            F.when(has_sq & ~has_dq, F.concat(F.lit('"'), esc, F.lit('"')))
            .when(
                has_sq & has_dq,
                F.concat(
                    F.lit("'"),
                    F.replace(esc, F.lit("'"), F.lit("\\'")),
                    F.lit("'"),
                ),
            )
            .otherwise(F.concat(F.lit("'"), esc, F.lit("'")))
        )

    return F.concat(F.lit("["), F.concat_ws(", ", F.transform(col, render)), F.lit("]"))
