"""Deterministic sampling / splitting for training-data pipelines.

``df.sample()`` is seed-dependent AND partitioning-dependent — rerun
the job with different parallelism and you get a different sample,
which poisons reproducibility and incremental processing. These ops
derive the sampling decision from the ROW's identity (md5 of the key),
so membership is a pure function of the data:

- stable across cluster size, retries, and engines (oracle-checkable);
- consistent between runs: yesterday's train/val assignment never
  flips when the corpus grows (the property held sacred in LLM data
  work — eval contamination is forever);
- stratified fractions apply per group with the same mechanism.

Hash → bucket: first 8 hex chars of md5(key) as an integer mod 10_000
(basis-point granularity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.quantize import q6

BUCKETS = 10_000


def hash_bucket(key: Column | str) -> Column:
    """Stable bucket in [0, 10000) from the row key — the salt-free
    md5 construction any engine can reproduce."""
    c = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
        % BUCKETS
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float
) -> DataFrame:
    """Keep rows whose hash bucket falls below ``fraction`` — an exact,
    rerun-stable ~fraction sample."""
    return df.filter(hash_bucket(key) < int(fraction * BUCKETS))


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. lang-balanced corpus
    downsampling). Strata absent from ``fractions`` are dropped."""
    bucket = hash_bucket(key)
    cond = None
    for stratum, frac in fractions.items():
        c = (F.col(strata_col) == stratum) & (bucket < int(frac * BUCKETS))
        cond = c if cond is None else (cond | c)
    return df.filter(cond)


def domain_mixture(
    df: DataFrame,
    key: str,
    domain_col: str,
    weights_bp: dict[str, int],
) -> DataFrame:
    """Deterministic corpus re-weighting to a target domain mixture —
    the data-mixing step of a pre-training pipeline (e.g. 60% web /
    30% books / 10% code): downsample every domain so the kept corpus
    approaches the target proportions while using as much data as the
    scarcest domain allows.

    ``weights_bp`` maps domain → target weight in integer basis points
    (ints, NOT floats — the whole threshold computation stays in
    BIGINT arithmetic, so every engine and every partitioning derives
    bit-identical keep decisions; domains absent from the map are
    dropped). With W = Σ weights:

    1. one aggregation → per-domain counts n_d (|domains| rows);
    2. the largest total N honoring the mixture is
       ``min_d(n_d * W // w_d)`` — the scarcest domain binds;
    3. per-domain keep target = ``N * w_d // W``, applied as a
       hash-bucket threshold ``target * BUCKETS // n_d`` on the same
       md5 bucket as every other sampler, so membership is a pure
       function of the row key (rerun-, retry-, and rescale-stable).

    Scale shape: two tiny aggregates over the fact (partial-agg'd),
    then one broadcast join of a |domains|-row threshold table back
    onto the fact — no window, no collect of fact-scaled data. The
    hash threshold keeps ~target rows per domain (±BUCKETS
    granularity), which is the right trade at corpus scale: exact-N
    selection would need a per-domain total sort for zero practical
    gain."""
    W = sum(weights_bp.values())
    spark = df.sparkSession
    w = spark.createDataFrame(
        [(d, int(wbp)) for d, wbp in weights_bp.items()],
        f"{domain_col} string, __w bigint",
    )
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .join(F.broadcast(w), domain_col)
    )
    # DIV (exact BIGINT floor-division) everywhere — `/` on bigints is
    # double division in Spark, and floor(double) can misround vs the
    # oracle's exact integer `//` once n_d * W nears 2^53.
    counts = counts.select(
        domain_col,
        "__n",
        "__w",
        F.expr(f"__n * {W} DIV __w").alias("__cap"),
    )
    n_total = counts.groupBy().agg(F.min("__cap").alias("__N"))
    thresholds = (
        counts.alias("c")
        .crossJoin(F.broadcast(n_total.alias("t")))
        .select(
            F.col(f"c.{domain_col}").alias(domain_col),
            F.expr(f"(t.__N * c.__w DIV {W}) * {BUCKETS} DIV c.__n").alias(
                "__thr"
            ),
        )
    )
    return (
        df.join(F.broadcast(thresholds), domain_col)
        .filter(hash_bucket(key) < F.col("__thr"))
        .drop("__thr")
    )


def train_val_split(
    df: DataFrame, key: str, val_fraction: float = 0.1, split_col: str = "split"
) -> DataFrame:
    """Tag every row train/val by hash bucket. A doc keeps its split
    forever — append-only corpora never leak val docs into train."""
    return df.withColumn(
        split_col,
        F.when(hash_bucket(key) < int(val_fraction * BUCKETS), "val").otherwise(
            "train"
        ),
    )


def seeded_shuffle(df: DataFrame, key: str, seed: str) -> DataFrame:
    """Deterministic global corpus shuffle — the training-order
    permutation every pretraining run needs to be REPRODUCIBLE: sort
    by ``md5(seed || ':' || key)`` (tie-break on the key itself) and
    assign 1..N positions. Changing the seed gives an independent
    permutation; re-running the pipeline gives the identical one.

    The rank comes from ``global_rank`` (range-partition + broadcast
    offsets), so no single-partition window anywhere — this shuffles
    100 TB the same way it shuffles 100 rows. Returns the input
    columns plus ``shuffle_pos`` (bigint, 1-based)."""
    from .ranking import global_rank

    sort_key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(key).cast("string")))
    ranked = global_rank(
        df.withColumn("__sk", sort_key),
        [F.col("__sk").asc(), F.col(key).asc()],
    )
    return ranked.withColumnRenamed("rank", "shuffle_pos").drop("__sk")


def weighted_sample_topk(
    df: DataFrame, key: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items — the
    Efraimidis-Spirakis one-pass construction (each row draws key
    u^(1/w); the k largest keys form an exact weighted sample), with
    the engine's deterministic md5 coin instead of an RNG: the same
    corpus yields the same sample on any partitioning, rerun, or
    engine, which makes sampled eval sets reproducible artifacts
    rather than run accidents.

    Rank on ln(u)·(max_w/w) (monotone in u^(1/w): dividing every
    weight by the same positive constant max_w raises every key
    u^(1/w) to the max_w'th power — a shared monotone transform that
    cannot reorder them — and avoids pow underflow for huge weights),
    rounded to 6 decimals with the row key as tie-break — the playbook
    rule that keeps ulp-level libm ``ln`` differences from ever
    flipping a rank the oracle sees. The max_w normalization keeps the
    key spread O(|ln u|) ≈ O(1) at ANY weight magnitude, so the 6dp
    quantization never collapses large-weight rows into shared buckets
    (the raw ln(u)/w key rounds to 0.000000 for all w ≳ 4e7, silently
    ignoring relative weights — ADVICE r3). max_w is a 1-row broadcast
    (exact agg, no float accumulation ambiguity). Top-k via
    ``global_topk`` → TakeOrderedAndProject (per-partition heaps),
    never a single-partition window.

    Weights must be > 0; rows with NULL/non-positive weight are
    dropped (standard E-S domain).

    Bounded-weight-ratio assumption (ADVICE r4): the 6dp quantization
    guarantee holds while max_w/w stays below ~1e9. Past that the key
    magnitude (≳1e10) has a double ulp larger than the 1e-6 rounding
    quantum, so round() is a no-op there and a 1-ulp libm ``ln``
    difference scaled by max_w/w can in principle flip a rank across
    engines. Such rows carry ~1e-9 of the max row's selection
    probability — they only surface in a top-k when k approaches the
    corpus size. If your corpus genuinely spans >9 orders of magnitude
    of weight AND you need bit-portable ranks in that tail, pre-clamp
    the ratio (e.g. floor weights at max_w/1e8) or bucket the weights
    before sampling."""
    from .ranking import global_topk

    c = F.col(key)
    u = (
        F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967296.0)
    filtered = df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
    mx = filtered.agg(
        F.max(F.col(weight_col).cast("double")).alias("__es_mx")
    )
    # q6-floored (round-7 sweep): ln is libm, so the micro-unit floor
    # is the engine-unambiguous quantizer for the ordering key
    score = q6(
        F.log(u) * (F.col("__es_mx") / F.col(weight_col).cast("double"))
    )
    scored = (
        filtered.crossJoin(F.broadcast(mx))
        .withColumn("__es_key", score)
        .drop("__es_mx")
    )
    return global_topk(scored, [F.desc("__es_key"), c.asc()], k).drop("__es_key")
