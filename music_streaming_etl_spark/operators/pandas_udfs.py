"""Arrow-vectorized escape hatches (SURVEY.md §2.8).

The engine's hot paths are all native expressions, but the reference's
three aggregation lambdas (mode / top-k / diversity) COULD be written
as Pandas UDFs — these are the idiomatic forms of that escape hatch,
kept for operators whose logic genuinely can't be expressed natively
(custom numerics, model scoring). Each has a parity test against the
native implementation so the two paths can't drift.

When to reach for which (the engine's rule):
1. native ``pyspark.sql.functions`` — always first; codegen, no serde;
2. ``pandas_udf`` scalar/grouped-agg — Arrow batches, ~10-100× faster
   than row-at-a-time Python UDFs;
3. ``applyInPandas`` — whole-group pandas logic (quantile fits,
   per-group model inference);
4. row-at-a-time ``F.udf`` — never in the hot path.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mode_grouped_agg():
    # built lazily: the pandas_udf decorator resolves its return type
    # against the ACTIVE session, so it can't run at module import
    @F.pandas_udf("string")
    def mode_grouped_agg(values: pd.Series) -> str:
        modes = values.dropna().mode()
        return modes.iloc[0] if len(modes) else None

    return mode_grouped_agg


def agg_mode_pandas(
    df: DataFrame, keys: list[str], value_col: str, alias: str
) -> DataFrame:
    """Grouped-agg Pandas UDF twin of ``agg_mode``: pandas
    ``mode()[0]`` per group — literally the reference's lambda
    (dags/music_streaming_etl_dags.py:190-193), Arrow-batched.
    Semantics identical to the native window/min-struct forms
    (tested); cost higher (one Arrow round-trip per group batch).
    Exists as the template for aggregations with no native
    expression."""
    udf = _mode_grouped_agg()
    return df.groupBy(*keys).agg(udf(F.col(value_col)).alias(alias))


def zscore_per_group(
    df: DataFrame, keys: list[str], value_col: str, alias: str
) -> DataFrame:
    """applyInPandas grouped-map example: per-group z-score (the
    shape used for per-group normalization / model scoring). ddof=0
    so single-row groups get 0.0, not NaN."""
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = f"{out_fields}, {alias} double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        std = v.std(ddof=0)
        z = (v - v.mean()) / std if std and std > 0 else v * 0.0
        return pdf.assign(**{alias: z})

    return df.groupBy(*keys).applyInPandas(norm, schema)


def make_token_spans_udtf():
    """Python UDTF (Spark 4 table function) — the third leg of the
    §2.8 escape-hatch triad (scalar pandas_udf / grouped-agg UDAF /
    UDTF): whitespace tokens WITH character offsets, one output row
    per token. Span offsets are the piece native SQL can't express
    cleanly (``split``+``posexplode`` loses positions); annotation
    pipelines need them for span labeling.

    Built lazily inside a factory (same session-resolution rule as the
    pandas_udf builders above) and registered for LATERAL use:

        spark.udtf.register("token_spans", make_token_spans_udtf())
        spark.sql("SELECT d.doc_id, t.* FROM docs d, "
                  "LATERAL token_spans(d.text) t")

    Row-at-a-time Python — escape-hatch path only, never the hot path
    (the native ``tokens()`` column covers counting/shingling).
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, start int, end int")
    class TokenSpans:
        def eval(self, text: str):
            if text is None:
                return
            i = 0
            n = len(text)
            while i < n:
                while i < n and text[i].isspace():
                    i += 1
                if i >= n:
                    break
                j = i
                while j < n and not text[j].isspace():
                    j += 1
                yield (text[i:j], i, j)
                i = j

    return TokenSpans


def arrow_python_udf_fingerprint():
    """Spark 4 Arrow-optimized Python UDF (``useArrow=True``): the
    row-at-a-time programming model with Arrow-batched transport —
    the middle rung the ladder above gained in Spark 4 between (2)
    and (4). Same serde win as a pandas_udf without rewriting row
    logic into Series ops. Still NOT for the hot path: the per-row
    Python call remains; only the (de)serialization is vectorized.

    Returns a deterministic 64-bit doc fingerprint (FNV-1a over the
    UTF-8 bytes) — row logic that would be awkward as Series ops but
    is trivial per-row."""

    @F.udf("bigint", useArrow=True)
    def fnv1a64(text: str) -> int | None:
        if text is None:
            return None
        h = 0xCBF29CE484222325
        for b in text.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h - 0x8000000000000000  # shift into signed-64 range

    return fnv1a64
