"""Text-analysis operators for LLM training-data pipelines
(SURVEY.md §2.9 X4 + build-charter extensions).

All pure Column expressions — tokenization, n-gram shingling,
fingerprinting, quality scoring run JVM-side inside whole-stage
codegen. No Python UDFs anywhere, which is what keeps a 100 TB text
sweep from being 10-100× slower than the scan itself.

Determinism: every function here is a pure function of the row, so
results are partitioning-independent. Hashes use md5 (same algorithm
in every engine) rather than Spark-internal xxhash/murmur so oracles
can reproduce them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.quantize import q6

# Word-boundary tokenizer shared by all ops: lowercase, split on runs
# of whitespace. (BPE-ish token counting uses TOKEN_REGEX instead.)


def tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


# BPE-ish lexical pattern: letter runs, digit runs, punctuation runs,
# each optionally preceded by one space (RE2- and Java-compatible — no
# lookarounds, so the same pattern runs in Spark and DuckDB oracles).
TOKEN_REGEX = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

PUNCT_CLASS = r"[.,!?;:'\"()\[\]{}\-]"


def n_tokens(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def n_tokens_bpe(text: Column | str) -> Column:
    """BPE-ish token count via regex lexing (proxy for tokenizer cost
    estimation over a corpus)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0))


def punct_ratio(text: Column | str) -> Column:
    """Punctuation chars ÷ total chars."""
    c = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return n_punct.cast("double") / F.length(c).cast("double")


def stopword_ratio(text: Column | str) -> Column:
    """Stopword tokens ÷ total tokens (counts occurrences, not
    distinct — array_intersect would dedup, filter() doesn't)."""
    toks = tokens(text)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return n_stop.cast("double") / F.size(toks).cast("double")


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: length sweet-spot,
    moderate stopword rate, low punctuation density — the standard
    cheap pre-filter before expensive model-based scoring."""
    c = F.col(text) if isinstance(text, str) else text
    len_score = F.least(F.length(c).cast("double") / F.lit(200.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 2, F.lit(1.0))
    punct_penalty = F.least(punct_ratio(c) * 4, F.lit(1.0))
    # raw (round-7 sweep): fixed-order quotients of integer counts
    # and literals — bit-identical across engines, no rounding needed
    return (
        len_score * 0.5 + stop_score * 0.3 + (1 - punct_penalty) * 0.2
    )


# PII scrubbing — the compliance pass every training-data pipeline
# runs before anything ships to a trainer. Patterns are RE2- AND
# Java-compatible (no lookarounds) so the DuckDB oracle runs the SAME
# regexes; a production deployment swaps in its legal team's pattern
# set, the operator shape (count + ordered redact) stays.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d[\d\-\s()]{7,}\d",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts on the ORIGINAL text (independent of
    redaction order)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        kind: F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("bigint")
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column | str, replacement: str = "[PII]") -> Column:
    """Redact all PII kinds, applied in dict order (email → phone →
    ipv4) — order matters when patterns could overlap, so it is fixed
    and the oracle replicates it. Pure regexp_replace chain: codegen,
    no Python."""
    c = F.col(text) if isinstance(text, str) else text
    for pat in PII_PATTERNS.values():
        c = F.regexp_replace(c, pat, replacement)
    return c


# Language-ID marker words (per-language high-frequency function
# words). A real system ships character-n-gram profiles; the heuristic
# shape — score per language, argmax with deterministic tie-break —
# is identical.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "de", "que", "es"),
    "fr": ("le", "la", "et", "est", "les"),
}


def lang_scores(text: Column | str) -> dict[str, Column]:
    toks = tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(text: Column | str) -> Column:
    """Predicted language = argmax marker-hit count; ties and
    zero-evidence → 'und' (undetermined). Deterministic: languages are
    compared in a fixed order with strict-greater, so equal scores
    resolve to the earlier key."""
    scores = lang_scores(text)
    items = list(scores.items())
    best_lang = F.lit(items[0][0])
    best_score = items[0][1]
    for lang, s in items[1:]:
        best_lang = F.when(s > best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(s, best_score)
    return F.when(best_score > 0, best_lang).otherwise(F.lit("und"))


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace runs, trim."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def doc_fingerprint(text: Column | str) -> Column:
    """Content fingerprint = md5 of the normalized text (md5 so any
    engine can recompute it; reassignable to xxhash64 when
    cross-engine parity doesn't matter and speed does)."""
    return F.md5(normalize_text(text))


def winnow_fingerprints(
    df,
    id_col: str,
    text_col: str,
    k: int = 5,
    window: int = 4,
):
    """Rolling-hash document fingerprinting (winnowing): hash every
    character k-gram of the normalized text, slide a window of ``w``
    consecutive positions, keep each window's minimum hash — the
    classic MOSS-style selection guaranteeing any shared substring of
    length ≥ k+w−1 contributes a shared fingerprint, at ~1/w storage.

    Returns exploded (id, fp) distinct rows — joinable for overlap
    detection exactly like shingle sets, but position-robust. Docs
    shorter than k yield no fingerprints.

    Scale shape (r7, probe-driven — four measured generations, each
    a real lesson):
    1. transform(sequence, i -> substring) built the gram array via
       an interpreted higher-order lambda: constant ~1.6k docs/s
       (304s at 500k docs) — the known interpretation tax.
    2. explode positions → md5(substring) per gram → window min
       barely helped (264s). Root cause found on the third attempt:
       ``substr(str, pos, …)`` on a UTF-8 string is O(pos) — the
       byte offset of a character index needs a scan from the
       start — so ANY per-position substring plan is O(len²) per
       document, and md5 was never the bottleneck.
    3. The r4 char-window form was O(len) and fast to 100×, but its
       per-CHARACTER posexplode materializes ~|chars| ROWS through a
       per-doc window sort — ~5B intermediate rows at 5M docs, which
       GC-stormed the JVM to death at the 1000× probe (SCALE.md).
       The grain, not the arithmetic, was the scale cap.
    4. This form keeps the row grain at DOCUMENTS: one Arrow-batched
       ``mapInPandas`` computes each doc's rolling gram hashes and
       window minima as vectorized int64 numpy (codepoints via a
       UTF-32 view — no per-char Python loop; strided adds for the
       Σ codepoint·131^i polynomial; sliding-window minima +
       suffix-minima for the truncated tail windows), emitting the
       per-doc DISTINCT fingerprints. Integer arithmetic end to end
       (max ≈ 2^52 — exact in int64 and in the oracle's BIGINT), so
       the output is bit-identical to generation 3 and to the DuckDB
       oracle. The only shuffle left is the map-side-combined global
       (id, fp) distinct; there is no fact-scaled window sort and no
       per-char row ever exists. Winnowing's guarantee (any shared
       substring of length ≥ k+w−1 contributes a shared fingerprint)
       is grain-independent, so the rewrite is semantics-preserving.
    """
    # int64-overflow guard (ADVICE r4): the gram hash's worst case is
    # Σ_{i<k} max_codepoint·131^i with max_codepoint = 0x10FFFF, so
    # for k ≥ 8 a non-ASCII text overflows int64 (numpy wraps
    # silently, ANSI Spark raised — both wrong). Fail at construction
    # with the bound spelled out instead.
    worst = sum(0x10FFFF * 131**i for i in range(k))
    if worst >= 2**63:
        raise ValueError(
            f"winnow_fingerprints: k={k} can overflow the int64 gram "
            f"hash on non-ASCII text (worst case {worst} ≥ 2^63); "
            "max supported k is 7"
        )

    norm = df.select(
        F.col(id_col).alias("id"), normalize_text(text_col).alias("__norm")
    ).filter(F.length("__norm") >= k)
    id_dt = norm.schema["id"].dataType.simpleString()
    out_schema = f"id {id_dt}, fp bigint"
    coeffs = [131**t for t in range(k)]

    def winnow_batches(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_ids, out_fps = [], []
            for doc_id, s in zip(pdf["id"], pdf["__norm"]):
                # codepoints without a per-char Python loop: UTF-32-LE
                # bytes viewed as uint32 — one array op per doc
                codes = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n_grams = codes.size - k + 1
                if n_grams <= 0:
                    continue
                gh = np.zeros(n_grams, dtype=np.int64)
                for t, c in enumerate(coeffs):
                    gh += codes[t : t + n_grams] * c
                if n_grams >= window:
                    full = np.lib.stride_tricks.sliding_window_view(
                        gh, window
                    ).min(axis=1)
                else:
                    full = gh[:0]
                # truncated tail windows (starts past n_grams - w):
                # suffix minima over the last min(w-1, n_grams) grams
                tail_n = min(window - 1, n_grams)
                tail = np.minimum.accumulate(gh[-tail_n:][::-1])[::-1]
                fps = np.unique(np.concatenate([full, tail]))
                out_ids.append(
                    np.full(fps.size, doc_id, dtype=object)
                )
                out_fps.append(fps)
            if out_ids:
                yield pd.DataFrame(
                    {
                        "id": np.concatenate(out_ids),
                        "fp": np.concatenate(out_fps),
                    }
                )

    return norm.mapInPandas(winnow_batches, out_schema).distinct()


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingle set (the MinHash input). n=1
    degenerates to the distinct token set."""
    toks = tokens(text)
    if n == 1:
        return F.array_distinct(toks)
    # guard: sequence(1, stop) DESCENDS when stop < 1 — short docs
    # (< n tokens) must yield an empty shingle set, not garbage slices
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(F.size(toks) >= n, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )).otherwise(F.array().cast("array<string>"))


def chunk_documents(
    df,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    stride: int = 48,
):
    """Token-window chunking — the training-data prep step that turns
    variable-length documents into fixed-size overlapping context
    windows (stride < chunk_tokens ⇒ chunk_tokens − stride tokens of
    overlap). The reference has no equivalent; this is build-charter
    LLM-pipeline surface.

    Purely per-row (tokenize → window starts → posexplode): no
    shuffle, stays in whole-stage codegen, and the output inherits the
    input's partitioning — at 100 TB this is scan-bound. The trailing
    window is allowed to be short (< chunk_tokens) rather than
    dropped, so every token lands in ≥ 1 chunk."""
    toks = tokens(text_col)
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.size(toks) - s + 1)
            .cast("bigint")
            .alias("n_chunk_tokens"),
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c")
    ).select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def repetition_stats(df, id_col: str, text_col: str, n: int = 3):
    """Boilerplate / template detector: share of repeated word
    ``n``-grams per document (1 − distinct/total). Spam, scraped
    navigation chrome, and log dumps score high; natural prose scores
    near 0.

    Scale shape: the distinct-shingle count runs on the exploded
    codegen path (``_shingle_rows``: posexplode + lead windows → one
    shuffle on doc id → two chained hash aggregates, both satisfied
    by the id partitioning so no second exchange). The previous
    per-row ``F.size(shingles(...))`` column looked shuffle-free but
    evaluated an interpreted higher-order ``transform`` lambda per
    document — the r4 probe measured it at a CONSTANT ~900 docs/s
    (558s at 500k docs), the repo's known ~10× interpretation tax.
    Docs shorter than ``n`` tokens produce no shingle rows, so the
    left join restores them with 0/0/0.0 (the oracle emits every
    doc). The join is MERGE-pinned: both sides are corpus-scaled by
    construction."""
    from .dedup import _shingle_rows

    toks = tokens(text_col)
    total = F.greatest(F.size(toks) - (n - 1), F.lit(0)).cast("bigint")
    base = df.select(
        F.col(id_col).alias(id_col), total.alias("n_ngrams")
    )
    dis = (
        _shingle_rows(df, id_col, text_col, n)
        .groupBy("id")
        .agg(F.countDistinct("sh").alias("n_distinct_ngrams"))
        .withColumnRenamed("id", id_col)
    )
    joined = base.hint("merge").join(dis, id_col, "left")
    distinct = F.coalesce(
        F.col("n_distinct_ngrams"), F.lit(0)
    ).cast("bigint")
    ratio = F.when(
        F.col("n_ngrams") > 0,
        # raw (round-7 sweep): one quotient of exact bigints
        F.lit(1.0)
        - distinct.cast("double") / F.col("n_ngrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return joined.select(
        id_col,
        F.col("n_ngrams"),
        distinct.alias("n_distinct_ngrams"),
        ratio.alias("repeated_ngram_ratio"),
    )


def unigram_commonness(df, id_col: str, text_col: str):
    """Unigram-LM document scoring, kept integer-exact: build the
    corpus term-frequency table (one shuffle on token), join it back
    to every token occurrence (second shuffle; AQE demotes to
    broadcast when the vocabulary is small), and score each document
    by the mean corpus frequency of its tokens. Monotone proxy for
    unigram log-likelihood — rare-token-heavy (junk/OCR) docs score
    low, common-prose docs high — but uses only BIGINT sums so the
    result is bit-identical across engines and partitionings (no
    floating log accumulation)."""
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("t")
    )
    freq = tok.groupBy("t").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tok.join(freq, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            (
                F.sum("tf").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("mean_token_freq"),
        )
    )


def tfidf_top_terms(df, id_col: str, text_col: str, k: int = 5):
    """TF-IDF salient terms: the k most corpus-distinctive terms per
    document — the classic relevance/keyword signal (and a cheap
    topical fingerprint for corpus diagnostics).

    Shape: per-(doc, term) counts (one shuffle), per-term document
    frequencies derived FROM that aggregate (second, much smaller
    shuffle — df never re-scans the fact), the corpus doc count as a
    1-row broadcast, then ``tfidf = tf * ln(N / df)`` per row. The
    top-k window partitions by doc — bounded by a document's distinct
    terms, never by corpus size.

    Determinism: both engines rank on the ROUNDED score (round 6) with
    the term as tie-break, so ulp-level libm differences in ``ln``
    can't flip an ordering the oracle sees differently.
    """
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).alias("n_docs")
    )
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            # q6 (round-7 sweep): ln is libm, so the score is floored
            # on the 1e-6 grid (engine-unambiguous) before ranking
            q6(
                F.col("tf").cast("double")
                * F.log(
                    F.col("n_docs").cast("double") / F.col("df").cast("double")
                )
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "tfidf")
    )


def pack_sequences(
    chunks,
    order_cols: tuple[str, ...],
    tokens_col: str,
    budget: int,
):
    """Sequence packing — assign ordered training chunks to
    fixed-token-budget bins, the step between chunking and batch
    assembly in an LLM data pipeline. Semantics are the concatenated
    token stream cut every ``budget`` tokens: a chunk lives in the bin
    where its first token lands (``bin_id = exclusive_prefix DIV
    budget``), and ``bin_offset`` is that first token's position
    within the bin. Deterministic for any partitioning because the
    order is total and the prefix sum is exact BIGINT.

    Scale shape: one range-partition shuffle on the pack order + a
    #partitions-row broadcast offset table (``global_prefix_sum``) —
    never a single-partition window over the corpus."""
    from .ranking import global_prefix_sum

    order = [F.col(c).asc() for c in order_cols]
    pref = global_prefix_sum(
        chunks, order, tokens_col, alias="__prefix"
    )
    return pref.select(
        *order_cols,
        F.col(tokens_col),
        F.expr(f"__prefix DIV {budget}").alias("bin_id"),
        (F.col("__prefix") % budget).alias("bin_offset"),
    )


def bm25_topk(
    docs,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Okapi BM25 retrieval over the corpus for a fixed bag of query
    terms — the search-index scoring a training pipeline uses for
    query-based decontamination and eval-set leakage checks.

        score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
        idf(t)   = ln((N − df + 0.5)/(df + 0.5) + 1)    (Robertson/Sparck-Jones)

    Determinism: per-term contributions are rounded to 9 decimals and
    accumulated as DECIMAL (exact, order-free — a raw double sum over
    the terms would depend on shuffle order), then the total rounds to
    6; ranking happens on the rounded score with an id tie-break, the
    same rule as tfidf_top_terms. ln/÷ are single IEEE ops on exact
    integer counts, reproducible by any engine at 9-decimal grain.

    Scale shape: term frequencies for the QUERY TERMS only (the filter
    lands before the groupBy, so the tf aggregate is |terms|-bounded),
    doc lengths from one corpus-wide count, the |terms|-row df/idf
    table and the 1-row (N, avgdl) aggregate broadcast — the only
    fact-scaled shuffles are the two hash-aggregates on doc_id.
    Top-k resolves via ``global_topk`` (per-partition heaps).
    """
    from .ranking import global_topk

    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        tok.filter(F.col("term").isin(list(query_terms)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.crossJoin(F.broadcast(stats)).select(
        "term",
        "n_docs",
        "avgdl",
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ).alias("idf"),
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            # floor-quantized nano-contrib (round-7 sweep): idf is
            # libm, so the 1e-9-unit integer floor is the engine-
            # unambiguous quantizer; the total is a raw quotient
            F.floor(
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
                )
                * F.lit(1e9)
            )
            .cast("decimal(19,0)")
            .alias("contrib_u"),
        )
    )
    total = scored.groupBy("doc_id").agg(
        (F.sum("contrib_u").cast("double") / F.lit(1e9)).alias("bm25")
    )
    return global_topk(total, [F.desc("bm25"), F.asc("doc_id")], k).select(
        "rank", "doc_id", "bm25"
    )


def sparse_cosine_pairs(
    docs,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_df: int | None = None,
):
    """All-pairs document cosine similarity over TF-IDF vectors via an
    inverted-index join — the sparse-vector sibling of the MinHash
    family (near-dup by TOPICAL similarity rather than shingle
    overlap), and the classic "similar documents" batch job.

    Shape: per-(doc, term) tf (one shuffle) → per-term df → postings
    self-join ON TERM with id_a < id_b (only docs sharing a term ever
    meet — never a cross join) → decimal-exact dot products → one
    normalization pass. ``max_df`` drops terms whose posting lists
    exceed the cap BEFORE the pair join: stop-terms contribute little
    cosine mass but quadratic join fan-out (Σ df² candidate pairs), so
    the cap is the scale knob — the same df-bounding every production
    similarity index applies (document it as part of the op's
    semantics: cosine is computed in the capped term space, norms
    included).

    Determinism: idf is rounded to 6 decimals and every weight/product
    is DECIMAL-exact, so partial sums commute identically in any
    engine or partitioning; the single final division+round is IEEE.
    Decimal sizing is load-bearing: tf is DECIMAL(5,0) (term count per
    doc < 100k) and idf DECIMAL(12,6), so w = tf·idf is DECIMAL(18,6)
    with NO rounding (scale-0 × scale-6 product), and w·w / wa·wb are
    DECIMAL(37,12) — still inside precision 38. Wider operands would
    push the squares past 38 digits, where Spark silently ROUNDS the
    scale down (precision-loss mode) while DuckDB keeps exactness —
    an engine-divergence this sizing makes impossible.
    """
    from pyspark.sql import functions as F

    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= max_df)
    n_docs = docs.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    weights = (
        tf.join(dfreq, "term")  # inner join applies the df cap to postings
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            # floor-to-6dp-grid as EXACT DECIMAL (round-7 sweep): ln is
            # libm; floor micro-units * 0.000001 is exact both engines
            (
                F.col("tf").cast("decimal(5,0)")
                * F.expr(
                    "CAST(CAST(floor(ln(CAST(n_docs AS DOUBLE)"
                    " / CAST(df AS DOUBLE)) * 1e6) AS DECIMAL(19,0))"
                    " * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(12,6))"
                )
            ).alias("w"),
        )
    )
    # postings feed both the norms and the pair join. cache, not the
    # r3-advice localCheckpoint suggestion: the 1000x minhash probe
    # measured lazy-checkpoint blocks being LOST under memory pressure
    # ("Block rdd_N does not exist" — a lineage-cut block cannot be
    # recomputed, a cached one can). The cache-entry lifetime the
    # advice flagged is owned by the batteries instead: selfcheck and
    # bench clear the session cache between queries
    weights = weights.cache()
    norms = weights.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("norm")
    )
    a = weights.select(
        F.col("term"), F.col("doc_id").alias("id_a"), F.col("w").alias("wa")
    )
    b = weights.select(
        F.col("term"), F.col("doc_id").alias("id_b"), F.col("w").alias("wb")
    )
    num = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("double").alias("dot"))
    )
    return (
        num.join(norms.select(F.col("doc_id").alias("id_a"), F.col("norm").alias("na")), "id_a")
        .join(norms.select(F.col("doc_id").alias("id_b"), F.col("norm").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            # try_divide: a token in EVERY doc has idf ln(1) == 0; a
            # doc of only such tokens has norm 0 and the cosine is 0/0
            # — ANSI raises where the oracle yields NULL (which the
            # threshold filter then drops in both engines)
            # raw final: exact-decimal dot/norms, fixed-order / sqrt
            F.try_divide(F.col("dot"), F.col("na") * F.col("nb")).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )
