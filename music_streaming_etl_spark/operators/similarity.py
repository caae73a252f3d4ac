"""Vector similarity search (SURVEY.md §2.9 X3).

Brute-force cosine top-k as the exact baseline, and an IVF-style
bucketed variant as the scale path. Dot products are ``zip_with`` +
``aggregate`` folds over ``array<double>`` — sequential, so the float
result is deterministic for a given row (no shuffle-order dependence)
and reproducible by an oracle doing the same left-to-right fold.

Scale notes: brute force is a broadcast of one query vector and a
single scan — perfectly parallel, no shuffle; top-k resolves via
``global_topk`` (TakeOrderedAndProject: per-partition heaps merged
once, never a single-partition window). The IVF variant prunes the
scan to the closest coarse buckets: at 1B vectors × 1k buckets you
scan ~0.1% of rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quantize import q6

from .ranking import global_topk


def _dlit(x: float) -> str:
    """SQL double literal with exact bit round-trip: ``repr(float)``
    is the shortest decimal string that uniquely identifies the
    double, and the JVM's ``Double.parseDouble`` (round-to-nearest,
    like every IEEE-754 parser) maps it back to the identical bits.
    Codebook values are finite by construction (decimal means of
    finite inputs), so inf/nan never reach this."""
    return repr(float(x)) + "D"


def _const_matrix(mat: list[list[float]]) -> F.Column:
    """array<array<double>> literal in ONE py4j call (r10).

    ``F.lit(nested_list)`` unrolls into per-element ``lit()``/
    ``array()`` calls — profiled at ~22k py4j round trips (~5 s of
    driver time) for one 64x16 codebook at the PQ identity
    configuration, the residue of the r9 literal rewrite. A single
    ``F.expr`` ships the whole matrix as one SQL string the JVM
    parses in microseconds, producing the same CreateArray-of-
    Literals tree (identical after constant folding), so results are
    bit-equal (value parity test-pinned in tests/test_similarity_multimodal.py)."""
    return F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(_dlit(x) for x in row) + ")" for row in mat
        )
        + ")"
    )


def _const_dvec(vals: list[float]) -> F.Column:
    """array<double> literal in one py4j call (see _const_matrix)."""
    return F.expr("array(" + ",".join(_dlit(x) for x in vals) + ")")


def _const_ivec(vals: list[int]) -> F.Column:
    """array<int> literal in one py4j call (see _const_matrix)."""
    return F.expr("array(" + ",".join(str(int(x)) for x in vals) + ")")


def dot(a, b) -> F.Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> F.Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def as_double_vec(col) -> F.Column:
    """float32 arrays compute differently engine-to-engine — always
    widen to double before arithmetic."""
    return F.transform(col, lambda x: x.cast("double"))


def similarity_topk(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine against a single query vector (a 1-row
    DataFrame with the same vec layout, broadcast — no shuffle of the
    vector table). Ties break on id ASC. Returns (rank, id, score)."""
    v = vectors.select(
        F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v")
    )
    q = query.select(as_double_vec(F.col(vec_col)).alias("qv"))
    scored = v.crossJoin(F.broadcast(q)).select(
        # q6 (round-7 sweep): the array fold's accumulation order is
        # engine-internal, so the micro-unit floor is the
        # engine-unambiguous quantizer (ROUND(DOUBLE, 6) is not)
        "id", q6(cosine(F.col("v"), F.col("qv"))).alias("score")
    )
    return global_topk(scored, [F.desc("score"), F.asc("id")], k).select(
        "rank", "id", "score"
    )


def centroids(
    vectors: DataFrame, bucket_col: str, vec_col: str, dim: int
) -> DataFrame:
    """Per-bucket mean vector (the IVF coarse quantizer's codebook),
    computed as dim per-position averages — one aggregation, no
    Python. Used to pick which buckets a query must scan.

    Each element is decimal-accumulated (exact, order-free) then
    divided by the count as doubles — so the codebook is bit-identical
    under any partitioning and reproducible by an external oracle
    (same rule as every float aggregate in this engine)."""
    v = vectors.select(
        F.col(bucket_col).alias("bucket"), as_double_vec(F.col(vec_col)).alias("v")
    )
    aggs = [
        (
            F.sum(F.element_at("v", i + 1).cast("decimal(28,9)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias(f"c{i}")
        for i in range(dim)
    ]
    per_pos = v.groupBy("bucket").agg(*aggs)
    return per_pos.select(
        "bucket", F.array(*[F.col(f"c{i}") for i in range(dim)]).alias("centroid")
    )


def _nearest_bucket_expr(
    codebook: list[tuple[int, list[float]]], vec="v"
) -> F.Column:
    """argmin over squared-L2 distances to literal centroids —
    embedded as constant arrays so assignment is pure per-row
    computation: no join, no shuffle. Ties break on bucket id ASC via
    the struct order. ``vec`` is a column name or a Column (r10: the
    fused PQ trainer and ``pq_encode`` pass slice expressions).

    r9 optimization (construction cost, not plan shape): the k
    centroids ride in as ONE nested array literal consumed by a
    zip_with lambda, instead of k unrolled per-centroid expression
    trees of k·dim individual ``F.lit`` calls — each ``F.lit``/Column
    op is a py4j round trip, and at the PQ identity configuration
    (k=64 × dim=16 × M=4 subspaces) the unrolled form spent tens of
    seconds of pure driver time BUILDING expressions (measured 19 s
    codebooks + 12 s encode at sf0.01 vs 0.2 s executing them). The
    per-element arithmetic, fold order, rounding, and struct
    tie-break are identical, so results are bit-equal."""
    vcol = F.col(vec) if isinstance(vec, str) else vec
    mat = [[float(x) for x in c] for _, c in codebook]
    cids = [int(cid) for cid, _ in codebook]
    pairs = F.zip_with(
        _const_matrix(mat),
        _const_ivec(cids),
        lambda c, cid: F.struct(
            F.round(
                F.aggregate(
                    F.zip_with(vcol, c, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                9,
            ).alias("d"),
            cid.alias("cid"),
        ),
    )
    return F.array_min(pairs).getField("cid")


def kmeans_codebook(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_clusters: int = 8,
    iterations: int = 5,
    train_sample: int | None = 65536,
) -> list[tuple[int, list[float]]]:
    """Learned IVF coarse quantizer: a few rounds of Lloyd's k-means
    expressed as DataFrame ops — the iterative-algorithm escape the
    build charter allows when one declarative plan can't express it.

    Per round: (1) assignment is a per-row argmin against the k
    centroids EMBEDDED AS LITERALS (k·dim scalars — the classic Lloyd
    broadcast step; MLlib ships the same thing), so it's pure codegen
    with zero shuffle; (2) the update is one decimal-exact per-bucket
    mean aggregation (`centroids`) — the only shuffle, k·dim scalars
    back to the driver. Rounds are a fixed count: deterministic
    everywhere (seeds = the ``n_clusters`` smallest ids, means are
    order-free decimal sums, argmin ties break on bucket id).
    Empty clusters keep their previous centroid.

    ``train_sample`` (r4, probe-driven): codebook quality needs
    thousands of rows per code, not the corpus — FAISS trains its
    quantizers on a subsample for the same reason — so training runs
    on the ``train_sample`` md5-smallest ids (partitioning-invariant,
    so deterministic in any session), cached across the rounds and
    re-spread over the shuffle partitions (the top-N lands in one
    partition otherwise, serializing the rounds). The full corpus
    still gets the zero-shuffle argmin ASSIGNMENT — only training is
    sampled. Before this, each Lloyd round scanned the whole corpus:
    the 500k-vector probe point spent 132.7s in training scans.
    ``None`` trains on everything (the pre-r4 behavior)."""
    v = vectors.select(
        F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v")
    )
    if train_sample is not None:
        v = (
            v.orderBy(F.md5(F.col("id").cast("string")), "id")
            .limit(train_sample)
            .repartition(F.col("id"))
        )
    v = v.cache()
    try:
        seeds = v.orderBy("id").limit(n_clusters).collect()
        if not seeds:
            # empty training corpus: return one zero-vector sentinel
            # centroid so downstream expression trees stay typed
            # (array_min over a LITERAL array — an empty book builds
            # array() of VOID and the plan won't analyze). Training is
            # empty only when the corpus is, so the assignment frame
            # is empty too and the sentinel never labels a row.
            return [(0, [0.0] * dim)]
        book = [(i, list(r["v"])) for i, r in enumerate(seeds)]
        for _ in range(iterations):
            assigned = v.withColumn("bucket", _nearest_bucket_expr(book))
            new = centroids(assigned, "bucket", "v", dim).collect()
            newmap = {r["bucket"]: list(r["centroid"]) for r in new}
            book = [(cid, newmap.get(cid, c)) for cid, c in book]
    finally:
        v.unpersist()
    return book


def similarity_topk_ivf_learned(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_clusters: int = 8,
    n_probe: int = 3,
    iterations: int = 5,
) -> DataFrame:
    """IVF with a LEARNED codebook instead of a pre-existing label
    column: k-means buckets, then the same centroid-rank → n_probe
    prune → exact top-k flow as ``similarity_topk_ivf``. This is the
    FAISS IVF shape end-to-end; at 1B vectors you'd train the codebook
    on a sample and assignment stays the same zero-shuffle argmin."""
    book = kmeans_codebook(
        vectors, id_col, vec_col, dim, n_clusters, iterations
    )
    tagged = vectors.withColumn(
        "__v_tmp", as_double_vec(F.col(vec_col))
    ).withColumn(
        "__bucket", _nearest_bucket_expr(book, vec="__v_tmp")
    ).drop("__v_tmp")
    return similarity_topk_ivf(
        tagged, query, id_col, vec_col, "__bucket", dim, k=k, n_probe=n_probe
    )


def similarity_topk_ivf(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    dim: int,
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """IVF-bucketed approximate top-k: rank buckets by centroid
    cosine, scan only the best ``n_probe`` buckets, then exact top-k
    within them. The pruning is the 100 TB play; recall depends on
    n_probe / bucket quality exactly as in FAISS-style IVF."""
    cents = centroids(vectors, bucket_col, vec_col, dim)
    q = query.select(as_double_vec(F.col(vec_col)).alias("qv"))
    bucket_scores = cents.crossJoin(F.broadcast(q)).select(
        "bucket",
        # q6-floored before ranking: near-tie bucket scores then
        # resolve on the bucket id, deterministically in any engine
        q6(cosine(F.col("centroid"), F.col("qv"))).alias("bscore"),
    )
    bucket_rank = global_topk(
        bucket_scores, [F.desc("bscore"), F.asc("bucket")], n_probe
    ).select("bucket")
    pruned = vectors.join(
        F.broadcast(bucket_rank),
        vectors[bucket_col] == bucket_rank["bucket"],
        "left_semi",
    )
    return similarity_topk(pruned, query, id_col, vec_col, k)


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-class mean embedding in flat (label, dim, centroid) form —
    the building block for nearest-centroid classification, IVF coarse
    quantizers, and class-balance diagnostics over an embedding
    column.

    Determinism across partitionings: float addition is not
    associative, so a naive SUM(double) varies with merge order.
    Elements are quantized to 1e-6 (DECIMAL(38,6)) and accumulated in
    decimal — integer arithmetic underneath, so the sum is
    order-independent and engines agree (scale 6 keeps the decimal
    rounding boundary ~1e6 double-ulps away from the stored values,
    so Spark's exact-BigDecimal cast and DuckDB's multiply-then-round
    cast pick the same quantum; at finer scales they can differ by
    1 ulp). One shuffle
    on (label, dim) with partial aggregation below; output is
    |labels|×|dims| rows regardless of input size."""
    e = emb.select(
        F.col(label_col).cast("bigint").alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    return (
        e.groupBy("label", F.col("dim").cast("bigint").alias("dim"))
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(38,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double")
            ).alias("centroid"),
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    cluster_col: str,
    threshold: float,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): drop embeddings whose cosine
    similarity to a LOWER-id member of the same cluster exceeds
    ``threshold``; return the retained rows (id, cluster).

    The clustering is the scalability lever: pairwise comparison runs
    only WITHIN a cluster (equi-join on ``cluster_col``), so total
    work is Σ|cluster|² — at 100 TB you raise k (e.g. 100k k-means
    clusters over 1B embeddings ≈ 10k rows/cluster) and the join
    stays shuffle-partitioned by cluster with AQE splitting any skewed
    cluster. Pair with ``kmeans_codebook``/``_nearest_bucket_expr``
    to learn the clusters when no label exists. Keep-lowest-id is the
    paper's arbitrary-representative choice made deterministic (total
    order on id); a row is dropped iff it duplicates ANY lower-id row
    in its cluster — one pass, no iteration, the standard streaming
    relaxation of the paper's per-cluster greedy sweep.
    """
    a = emb.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__ida"),
        as_double_vec(F.col(vec_col)).alias("__va"),
    )
    b = emb.select(
        F.col(cluster_col).alias("__c"),
        F.col(id_col).alias("__idb"),
        as_double_vec(F.col(vec_col)).alias("__vb"),
    )
    dropped = (
        a.join(b, "__c")
        .filter(F.col("__idb") < F.col("__ida"))
        .withColumn("__cos", q6(cosine(F.col("__va"), F.col("__vb"))))
        .filter(F.col("__cos") > threshold)
        .select(F.col("__ida").alias("__drop"))
        .distinct()
    )
    return (
        emb.join(dropped, emb[id_col] == dropped["__drop"], "left_anti")
        .select(F.col(id_col), F.col(cluster_col))
    )


def pq_codebooks(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m_subspaces: int,
    k_codes: int = 16,
    iterations: int = 3,
    train_sample: int | None = 65536,
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    dim-D space into ``m_subspaces`` contiguous subvectors and train an
    independent k-means codebook in each — M small quantizers whose
    cross product spans K^M cells, the trick that gives PQ its
    capacity at 8 bits/subspace of storage.

    Runs the same deterministic Lloyd recurrence as
    ``kmeans_codebook`` in every subspace, FUSED across subspaces
    (r10, VERDICT r9 item 1): at 100 TB you train on a deterministic
    sample (codebook quality needs thousands of rows per code, not
    the full corpus) while ENCODING always stays full-corpus,
    zero-shuffle codegen.

    r9 drew the deterministic training sample ONCE (keyed on md5(id)
    alone, so the id set is identical per subspace) and shared it
    across M sequential ``kmeans_codebook`` calls. r10 fuses the M
    trainings themselves into one job sequence (guide §2 — fewer
    jobs/shuffles): the M seed collects collapse to ONE (slicing
    preserves ids, so every subspace seeds from the same k_codes
    smallest-id rows — their full-dim vectors are collected once and
    sliced driver-side), and each Lloyd round runs ONE job — a single
    select computes all M argmin assignments against the literal
    codebooks, explodes to (m, bucket, subvector) rows, and one
    grouped aggregation updates every codebook. The per-(m, bucket)
    groups contain exactly the rows the per-subspace update saw, and
    the per-position means accumulate in DECIMAL (order-free), so
    every codebook is bit-identical to the sequential form
    (assert-pinned in tests/test_similarity_multimodal.py); what changes is
    M×(1 seed collect + iterations update jobs) becoming
    1 + iterations."""
    sub_dim = dim // m_subspaces
    assert sub_dim * m_subspaces == dim, "dim must divide evenly"
    v = vectors.select(
        F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v")
    )
    sampled = v
    if train_sample is not None:
        sampled = (
            v.orderBy(F.md5(F.col("id").cast("string")), "id")
            .limit(train_sample)
            .repartition(F.col("id"))
        )
    sampled = sampled.cache()
    try:
        seeds = sampled.orderBy("id").limit(k_codes).collect()
        if not seeds:
            # empty training corpus: one zero-vector sentinel per
            # subspace (same rationale as kmeans_codebook — keeps the
            # literal argmin expressions typed; never labels a row
            # because the assignment frame is empty too).
            return [[(0, [0.0] * sub_dim)] for _ in range(m_subspaces)]
        full = [[float(x) for x in r["v"]] for r in seeds]
        books = [
            [
                (i, sv[m * sub_dim : (m + 1) * sub_dim])
                for i, sv in enumerate(full)
            ]
            for m in range(m_subspaces)
        ]
        for _ in range(iterations):
            # one job per round: M assignments + M updates fused.
            # Each array entry is (m, argmin bucket for subspace m,
            # subvector m); explode + groupBy(m, bucket) computes all
            # M codebook updates in a single aggregation.
            entries = F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        _nearest_bucket_expr(
                            books[m],
                            vec=F.slice("v", m * sub_dim + 1, sub_dim),
                        ).alias("bucket"),
                        F.slice("v", m * sub_dim + 1, sub_dim).alias("sv"),
                    )
                    for m in range(m_subspaces)
                ]
            )
            ex = sampled.select(F.explode(entries).alias("e")).select(
                "e.m", "e.bucket", "e.sv"
            )
            # identical per-position decimal-mean arithmetic to
            # `centroids` (exact, order-free accumulation)
            aggs = [
                (
                    F.sum(
                        F.element_at("sv", i + 1).cast("decimal(28,9)")
                    ).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias(f"c{i}")
                for i in range(sub_dim)
            ]
            new = ex.groupBy("m", "bucket").agg(*aggs).collect()
            newmap = {
                (r["m"], r["bucket"]): [r[f"c{i}"] for i in range(sub_dim)]
                for r in new
            }
            # empty clusters keep their previous centroid, exactly as
            # kmeans_codebook does
            books = [
                [(cid, newmap.get((m, cid), c)) for cid, c in bm]
                for m, bm in enumerate(books)
            ]
    finally:
        sampled.unpersist()
    return books


def pq_encode(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    books: list[list[tuple[int, list[float]]]],
    dim: int,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Encode every vector as M code ids (argmin centroid per
    subspace): per-row codegen against literal centroids — no join, no
    shuffle, exactly like the IVF assignment. The (id, codes) frame is
    what a 100 TB deployment persists: M bytes/vector instead of
    4·dim, a 32× compression at M=8, dim=64. ``keep_cols`` pass
    through untouched (e.g. the IVF bucket id)."""
    sub_dim = dim // len(books)
    v = vectors.select(
        F.col(id_col).alias("id"),
        as_double_vec(F.col(vec_col)).alias("v"),
        *[F.col(c) for c in keep_cols],
    )
    # r9: one nested-literal + zip_with argmin per subspace instead of
    # K unrolled per-centroid trees (same rationale and bit-equal
    # semantics as _nearest_bucket_expr — r10 dedupes the inline copy
    # into that helper, which now accepts a slice expression).
    code_cols = [
        _nearest_bucket_expr(
            book, vec=F.slice("v", m * sub_dim + 1, sub_dim)
        )
        for m, book in enumerate(books)
    ]
    return v.select("id", F.array(*code_cols).alias("codes"), *keep_cols)


def similarity_topk_pq(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    m_subspaces: int = 8,
    k_codes: int = 16,
    iterations: int = 3,
) -> DataFrame:
    """Asymmetric-distance PQ top-k: the query stays EXACT, the corpus
    is its PQ codes — score(v) ≈ Σ_m  ⟨q_m, centroid_m[code_m]⟩, read
    from an M×K lookup table of subspace dot products.

    The table is M·K scalars computed driver-side from the 1-row query
    (the same legitimate scalar collect as every broadcast-scalar
    query in this engine) and embedded as literals, so scoring an
    encoded vector is M array lookups + a sum — per-row codegen over
    the (id, codes) frame, no join, no shuffle, then
    ``global_topk``. Vectors are L2-normalized before training and
    encoding, so the inner product approximates cosine.

    Returns (rank, id, score) with score the PQ-approximate cosine —
    rows-only correctness (iterative quantizer; no SQL twin); recall
    against exact brute force is pytest-asserted."""
    v = (
        vectors.select(
            F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v0")
        )
        .withColumn("__n", norm(F.col("v0")))
        .select(
            "id",
            F.transform("v0", lambda x: x / F.col("__n")).alias("v"),
        )
        # consumed by M subspace trainings + the encode pass — cache
        # the normalized frame once instead of renormalizing per job
        # (cache, not localCheckpoint: evicted cached blocks recompute;
        # lineage-cut checkpoint blocks are lost — measured at 1000x)
        .cache()
    )
    books = pq_codebooks(v, "id", "v", dim, m_subspaces, k_codes, iterations)
    encoded = pq_encode(v, "id", "v", books, dim)

    sub_dim = dim // m_subspaces
    qrows = query.select(as_double_vec(F.col(vec_col)).alias("qv")).collect()
    if not qrows:
        # no query vector -> no neighbors: typed empty result (rank is
        # bigint to match global_topk), instead of IndexError
        return vectors.select(
            F.lit(0).cast("bigint").alias("rank"),
            F.col(id_col).alias("id"),
            F.lit(0.0).alias("score"),
        ).limit(0)
    qraw = qrows[0]["qv"]
    qn = sum(x * x for x in qraw) ** 0.5
    qrow = [x / qn for x in qraw]
    # tables[m][cid] = <q_m, centroid_{m,cid}> — M·K literal doubles
    tables = []
    for m, book in enumerate(books):
        qsub = qrow[m * sub_dim : (m + 1) * sub_dim]
        row = [0.0] * len(book)
        for cid, c in book:
            row[cid] = sum(a * b for a, b in zip(qsub, c))
        tables.append(row)
    # r10: one SQL-string nested literal (truly 1 py4j call — F.lit
    # on a nested list still unrolled per element, see _const_matrix)
    lut = _const_matrix([[float(x) for x in row] for row in tables])
    score = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m_subspaces - 1)),
            lambda c, m: F.element_at(F.element_at(lut, m + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # rows-only PQ key (no SQL oracle) — single-engine rounding is
    # a plain tie-break quantizer, not a cross-engine hazard
    scored = encoded.select("id", F.round(score, 6).alias("score"))
    return global_topk(scored, [F.desc("score"), F.asc("id")], k).select(
        "rank", "id", "score"
    )


def similarity_topk_ivfpq(
    vectors: DataFrame,
    query: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    n_coarse: int = 8,
    n_probe: int = 3,
    m_subspaces: int = 4,
    k_codes: int = 16,
    iterations: int = 3,
) -> DataFrame:
    """IVF-PQ — the production ANN index shape (FAISS IVFPQ; Jégou et
    al. 2011 §IV): a coarse quantizer prunes the scan to ``n_probe``
    buckets, and within them vectors are scored from PQ codes of their
    RESIDUAL (v − coarse_centroid), which quantizes far better than
    raw vectors because residuals are small and centered.

    ADC decomposition keeps scoring per-row codegen: score(v) =
    ⟨q, c_b⟩ + Σ_m ⟨q_m, r̂_m[code_m]⟩ — the first term is one literal
    per bucket, the second an M×K lookup table shared by ALL buckets
    (global residual codebooks), so the probed rows do M array lookups
    and a sum: no join, no shuffle beyond the semi-join prune.

    At 100 TB: coarse/PQ training runs on a deterministic sample,
    encoding is zero-shuffle codegen, the persisted index is
    (id, bucket, M bytes), and a query scans n_probe/n_coarse of it.
    Deterministic end-to-end (fixed seeds, fixed rounds, literal
    arithmetic); recall asserted in pytest against exact brute force."""
    v = (
        vectors.select(
            F.col(id_col).alias("id"), as_double_vec(F.col(vec_col)).alias("v0")
        )
        .withColumn("__n", norm(F.col("v0")))
        .select("id", F.transform("v0", lambda x: x / F.col("__n")).alias("v"))
        # cache, not localCheckpoint: evicted cached blocks recompute
        .cache()
    )
    coarse = kmeans_codebook(v, "id", "v", dim, n_coarse, iterations)
    cmap = {cid: c for cid, c in coarse}
    tagged = v.withColumn("bucket", _nearest_bucket_expr(coarse, vec="v"))
    # residual = v − centroid[bucket], via a literal array-of-centroids
    # (r10: one SQL-string nested literal, see _const_matrix)
    cent_lut = _const_matrix([[float(x) for x in cmap[cid]] for cid in sorted(cmap)])
    resid = tagged.withColumn(
        "r",
        F.zip_with(
            F.col("v"),
            F.element_at(cent_lut, F.col("bucket") + 1),
            lambda a, b: a - b,
        ),
    )
    books = pq_codebooks(resid, "id", "r", dim, m_subspaces, k_codes, iterations)
    encoded = pq_encode(resid, "id", "r", books, dim, keep_cols=["bucket"])

    sub_dim = dim // m_subspaces
    qrows = query.select(as_double_vec(F.col(vec_col)).alias("qv")).collect()
    if not qrows:
        # no query vector -> no neighbors: typed empty result (rank is
        # bigint to match global_topk), instead of IndexError
        return vectors.select(
            F.lit(0).cast("bigint").alias("rank"),
            F.col(id_col).alias("id"),
            F.lit(0.0).alias("score"),
        ).limit(0)
    qraw = qrows[0]["qv"]
    qn = sum(x * x for x in qraw) ** 0.5
    qrow = [x / qn for x in qraw]
    # rank buckets by query·centroid, keep the best n_probe
    bscore = sorted(
        (
            (sum(a * b for a, b in zip(qrow, c)), cid)
            for cid, c in coarse
        ),
        key=lambda t: (-round(t[0], 9), t[1]),
    )
    probed = {cid: s for s, cid in bscore[:n_probe]}
    # bucket constant ⟨q, c_b⟩ per probed bucket + shared residual table
    bconst = F.element_at(
        F.map_from_arrays(
            _const_ivec([int(b) for b in probed]),
            _const_dvec([float(s) for s in probed.values()]),
        ),
        F.col("bucket"),
    )
    tables = []
    for m, book in enumerate(books):
        qsub = qrow[m * sub_dim : (m + 1) * sub_dim]
        row = [0.0] * len(book)
        for cid, c in book:
            row[cid] = sum(a * b for a, b in zip(qsub, c))
        tables.append(row)
    # r10: one SQL-string nested literal (see _const_matrix)
    lut = _const_matrix([[float(x) for x in row] for row in tables])
    tsum = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m_subspaces - 1)),
            lambda c, m: F.element_at(F.element_at(lut, m + 1), c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        encoded.filter(F.col("bucket").isin(*probed))
        .select("id", F.round(bconst + tsum, 6).alias("score"))
    )
    return global_topk(scored, [F.desc("score"), F.asc("id")], k).select(
        "rank", "id", "score"
    )


def build_ivf_index(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    bucket_col: str,
    dim: int,
    index_dir: str,
) -> None:
    """Persist an IVF index as an on-disk artifact — the
    build-once/search-many lifecycle ``minhash_index`` gives dedup,
    for ANN:

    - ``vectors.parquet`` **partitioned BY bucket**: a probe that
      filters on bucket prunes whole partition DIRECTORIES at plan
      time, so search I/O is bounded by the probed buckets however
      large the corpus (`searched.inputFiles()` proves it in the
      test);
    - ``centroids.parquet``: the |buckets|-row codebook (decimal-
      deterministic per ``centroids``).

    Rebuild cost is one shuffle (the partitioned write); incremental
    growth appends into existing bucket partitions.
    """
    import os

    v = vectors.select(
        F.col(id_col).alias("id"),
        as_double_vec(F.col(vec_col)).alias("vec"),
        F.col(bucket_col).alias("bucket"),
    )
    v.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(index_dir, "vectors.parquet")
    )
    centroids(vectors, bucket_col, vec_col, dim).write.mode("overwrite").parquet(
        os.path.join(index_dir, "centroids.parquet")
    )


def search_ivf_index(
    spark,
    index_dir: str,
    query: DataFrame,
    vec_col: str,
    k: int = 10,
    n_probe: int = 3,
) -> DataFrame:
    """Search a persisted IVF index: rank the stored centroids against
    the query (tiny frame, broadcast), then scan ONLY the probed
    bucket partitions — the bucket filter is a partition-pruning
    predicate on the partitioned layout, so unprobed buckets never
    produce a scan task. Returns (rank, id, score) like
    ``similarity_topk``."""
    import os

    from .ranking import global_topk

    cents = spark.read.parquet(os.path.join(index_dir, "centroids.parquet"))
    q = query.select(as_double_vec(F.col(vec_col)).alias("qv"))
    bucket_rank = global_topk(
        cents.crossJoin(F.broadcast(q)).select(
            "bucket",
            q6(cosine(F.col("centroid"), F.col("qv"))).alias("bscore"),
        ),
        [F.desc("bscore"), F.asc("bucket")],
        n_probe,
    ).select("bucket")
    # n_probe scalar bucket ids to the driver — literal isin() is what
    # makes the bucket filter a PLAN-TIME partition-pruning predicate
    # (same class of scalar collect as the validation report ops)
    probed = [r["bucket"] for r in bucket_rank.collect()]
    stored = spark.read.parquet(os.path.join(index_dir, "vectors.parquet"))
    pruned = stored.filter(F.col("bucket").isin(probed))
    return similarity_topk(
        pruned, query.select(F.col(vec_col).alias("vec")), "id", "vec", k
    )
