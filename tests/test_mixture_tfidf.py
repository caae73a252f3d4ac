"""Unit tests for domain-mixture sampling and TF-IDF top terms —
edge cases the synthetic-corpus oracle can't pin (scarcest-domain
binding, unlisted-domain drop, partitioning independence, tie-break
order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from music_streaming_etl_spark.operators.sampling import domain_mixture
from music_streaming_etl_spark.operators.text import tfidf_top_terms


def _corpus(spark, sizes: dict[str, int]):
    rows = []
    i = 0
    for dom, n in sizes.items():
        for _ in range(n):
            rows.append((i, dom))
            i += 1
    return spark.createDataFrame(rows, ["doc_id", "domain"])


def test_domain_mixture_scarcest_domain_binds(spark):
    # target 50/50 but 'rare' has only 20 docs -> N = 40, web keeps ~20
    df = _corpus(spark, {"web": 1000, "rare": 20})
    out = domain_mixture(
        df, "doc_id", "domain", {"web": 5000, "rare": 5000}
    )
    by_dom = {
        r.domain: r.n
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert by_dom["rare"] == 20  # threshold 10000 keeps all
    # web: hash-threshold targets 20 of 1000 (rate 2%) — allow hash noise
    assert 5 <= by_dom.get("web", 0) <= 40


def test_domain_mixture_drops_unlisted_domains(spark):
    df = _corpus(spark, {"a": 50, "b": 50, "junk": 50})
    out = domain_mixture(df, "doc_id", "domain", {"a": 5000, "b": 5000})
    assert out.filter(F.col("domain") == "junk").count() == 0


def test_domain_mixture_partitioning_independent(spark):
    df = _corpus(spark, {"a": 200, "b": 100, "c": 50})
    w = {"a": 6000, "b": 3000, "c": 1000}
    ids1 = sorted(
        r.doc_id for r in domain_mixture(df.repartition(1), "doc_id", "domain", w).collect()
    )
    ids2 = sorted(
        r.doc_id
        for r in domain_mixture(
            df.repartition(17, "doc_id"), "doc_id", "domain", w
        ).collect()
    )
    assert ids1 == ids2 and len(ids1) > 0


def test_tfidf_surfaces_distinctive_term(spark):
    rows = [(i, "shared words everywhere") for i in range(9)] + [
        (99, "shared words zebra")
    ]
    out = tfidf_top_terms(
        spark.createDataFrame(rows, ["doc_id", "text"]), "doc_id", "text", k=1
    ).collect()
    top99 = [r for r in out if r.doc_id == 99][0]
    assert top99.term == "zebra" and top99.df == 1
    assert top99.tfidf > 0


def test_tfidf_tiebreak_is_term_ascending(spark):
    # both terms unique to the doc with equal tf -> equal tfidf, term asc
    rows = [(1, "alpha beta"), (2, "filler filler"), (3, "filler stuff")]
    out = tfidf_top_terms(
        spark.createDataFrame(rows, ["doc_id", "text"]), "doc_id", "text", k=2
    )
    d1 = sorted(
        [(r.rank, r.term) for r in out.collect() if r.doc_id == 1]
    )
    assert d1 == [(1, "alpha"), (2, "beta")]
