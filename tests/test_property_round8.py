"""Brute-force property twins for the round-5/6 driver-window keys
(backlog positions 51-114): each query's semantics re-derived
independently in pure Python / pandas / numpy from the same parquet,
compared cell-exact (floats within 2e-6 of the 6dp round). The DuckDB
oracle can mirror a shared mistake; these cannot — the derivations
share no code with either engine's SQL."""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    # mirrors tokens(): split(lower(trim(text)), '\s+') — Spark's
    # split on an empty string yields [''], as does re.split
    return re.split(r"\s+", text.strip().lower())


def _close(a, b, tol=2e-6) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return abs(a - b) <= tol


def test_repetition_stats_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.extension_queries import (
        q_repetition_stats,
    )

    rows = {r["doc_id"]: r for r in q_repetition_stats(spark, SF).collect()}
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    assert set(rows) == set(docs["doc_id"])
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _toks(text)
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
        r = rows[doc_id]
        assert r["n_ngrams"] == len(grams)
        assert r["n_distinct_ngrams"] == len(set(grams))
        want = (
            round(1.0 - len(set(grams)) / len(grams), 6) if grams else 0.0
        )
        assert _close(r["repeated_ngram_ratio"], want), doc_id


def test_contamination_check_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.extension_queries import (
        q_contamination_check,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    sh = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _toks(text)
        sh[doc_id] = {
            " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
        }
    bench = {d for d in sh if d % 20 == 0}
    corpus = {d for d in sh if d % 20 != 0}
    df_bench = Counter(s for d in bench for s in sh[d])
    keep = {s for s, c in df_bench.items() if c <= 2}
    want = {}
    for c in corpus:
        for b in bench:
            shared = len(sh[c] & sh[b] & keep)
            if shared >= 3:
                want[(c, b)] = shared
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in q_contamination_check(spark, SF).collect()
    }
    assert got == want


def test_unigram_commonness_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.extension_queries import (
        q_unigram_commonness,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    occ = {d: _toks(t) for d, t in zip(docs["doc_id"], docs["text"])}
    tf = Counter(t for ts in occ.values() for t in ts)
    rows = {
        r["doc_id"]: r for r in q_unigram_commonness(spark, SF).collect()
    }
    assert set(rows) == set(occ)
    for d, ts in occ.items():
        r = rows[d]
        assert r["n_tokens"] == len(ts)
        want = sum(tf[t] for t in ts) / len(ts)
        assert _close(r["mean_token_freq"], want, tol=1e-9), d


def test_embedding_centroids_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.extension_queries import (
        q_embedding_centroids,
    )

    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    sums: dict = defaultdict(lambda: defaultdict(Decimal))
    counts: dict = defaultdict(int)
    q6 = Decimal("0.000001")
    for label, vec in zip(emb["label"], emb["embedding"]):
        counts[int(label)] += 1
        for dim, v in enumerate(vec):
            sums[int(label)][dim] += Decimal(float(v)).quantize(
                q6, rounding=ROUND_HALF_UP
            )
    rows = q_embedding_centroids(spark, SF).collect()
    assert len(rows) == sum(len(d) for d in sums.values())
    for r in rows:
        want = float(sums[r["label"]][r["dim"]]) / counts[r["label"]]
        assert r["n_vectors"] == counts[r["label"]]
        assert _close(r["centroid"], want), (r["label"], r["dim"])


def test_doc_chunks_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.extension_queries import q_doc_chunks

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    want = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _toks(text)
        for idx, start in enumerate(range(0, len(toks), 48)):
            chunk = toks[start : start + 64]
            want[(doc_id, idx)] = (" ".join(chunk), len(chunk))
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in q_doc_chunks(spark, SF).collect()
    }
    assert got == want


def test_mcnemar_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_mcnemar_test

    ev = pd.read_parquet(f"{SF}/events.parquet")
    view = set(ev.loc[ev["event_type"] == "view", "user_id"])
    click = set(ev.loc[ev["event_type"] == "click", "user_id"])
    users = set(ev["user_id"])
    b = len(view - click)
    c = len(click - view)
    [r] = q_mcnemar_test(spark, SF).collect()
    assert (r["n_users"], r["view_only"], r["click_only"]) == (
        len(users), b, c,
    )
    want = round((abs(b - c) - 1) ** 2 / (b + c), 6) if b + c else None
    assert _close(r["chi2"], want)


def test_cohens_kappa_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_cohens_kappa

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cells = Counter(
        (
            1 if nc >= 300 else 0,
            1 if len(_toks(t)) >= 50 else 0,
        )
        for nc, t in zip(docs["n_chars"], docs["text"])
    )
    a, b = cells[(1, 1)], cells[(1, 0)]
    c, d = cells[(0, 1)], cells[(0, 0)]
    n = a + b + c + d
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    [r] = q_cohens_kappa(spark, SF).collect()
    assert (r["a"], r["b"], r["c"], r["d"]) == (a, b, c, d)
    assert _close(r["observed_agreement"], round(po, 6))
    assert _close(r["expected_agreement"], round(pe, 6))
    want = round((po - pe) / (1 - pe), 6) if pe != 1 else None
    assert _close(r["kappa"], want)


def test_eb_shrunk_rates_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_eb_shrunk_rates,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet")
    per = {}
    for et, grp in ev.groupby("event_type"):
        n = len(grp)
        x = int((grp["value"] >= 50.0).sum())
        per[et] = (n, x, Decimal(str(round(x / n, 6))))
    k = len(per)
    # decimal rates sum exactly; the division to m is the only float
    m = float(sum(r for _, _, r in per.values())) / k
    m2 = float(sum(r * r for _, _, r in per.values())) / k
    v = m2 - m * m
    ab = (m * (1.0 - m) / v - 1.0) if v != 0 else None
    rows = {r["event_type"]: r for r in q_eb_shrunk_rates(spark, SF).collect()}
    assert set(rows) == set(per)
    for et, (n, x, rate) in per.items():
        r = rows[et]
        assert (r["n"], r["x"]) == (n, x)
        assert _close(r["raw_rate"], float(rate))
        want = (
            round((x + m * ab) / (n + ab), 6) if ab is not None else None
        )
        assert _close(r["shrunk_rate"], want), et


def test_median_by_group_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_median_by_group,
    )

    li = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber",
        ],
    )
    got = {
        r["l_returnflag"]: r["median_price"]
        for r in q_median_by_group(spark, SF).collect()
    }
    for flag, grp in li.groupby("l_returnflag"):
        ordered = grp.sort_values(
            ["l_extendedprice", "l_orderkey", "l_linenumber"]
        )["l_extendedprice"].tolist()
        want = ordered[(len(ordered) + 1) // 2 - 1]
        assert got[flag] == want, flag


def test_popularity_index_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_popularity_index,
    )

    li = pd.read_parquet(
        f"{SF}/lineitem.parquet", columns=["l_partkey", "l_orderkey"]
    )
    plays = li.groupby("l_partkey").size()
    listeners = li.groupby("l_partkey")["l_orderkey"].nunique()
    mp, ml = int(plays.max()), int(listeners.max())
    rows = {r["partkey"]: r for r in q_popularity_index(spark, SF).collect()}
    assert set(rows) == set(plays.index)
    for pk in plays.index:
        r = rows[pk]
        assert (r["n_plays"], r["n_listeners"]) == (
            int(plays[pk]), int(listeners[pk]),
        )
        want = round(plays[pk] / mp * 0.6 + listeners[pk] / ml * 0.4, 6)
        assert _close(r["popularity_index"], want), pk


def test_quality_filter_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.extension_queries import (
        q_quality_filter,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    rows = {r["doc_id"]: r for r in q_quality_filter(spark, SF).collect()}
    assert set(rows) == set(docs["doc_id"])
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _toks(text)
        mwl = sum(len(t) for t in toks) / len(toks)
        bigrams = Counter(
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        )
        frac = (
            max(bigrams.values()) / sum(bigrams.values()) if bigrams else None
        )
        r = rows[doc_id]
        assert r["n_toks"] == len(toks)
        assert _close(r["mean_word_len"], round(mwl, 6))
        assert _close(
            r["top_bigram_frac"], round(frac, 6) if frac is not None else None
        )
        keep = (
            len(toks) >= 30
            and 4.0 <= mwl <= 5.0
            and (frac if frac is not None else 0.0) < 0.08
        )
        assert r["keep"] == int(keep), doc_id


def test_domain_mixture_matches_brute_force(spark):
    import hashlib

    from music_streaming_etl_spark.plans.extension_queries import (
        q_domain_mixture,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    weights = {"src0": 5000, "src1": 3000, "src2": 1500, "src3": 500}
    n = Counter(docs["source"])
    ntot = min(n[s] * 10000 // w for s, w in weights.items() if s in n)
    thr = {
        s: ((ntot * w // 10000) * 10000) // n[s]
        for s, w in weights.items()
        if s in n
    }
    want = set()
    for doc_id, src in zip(docs["doc_id"], docs["source"]):
        if src not in thr:
            continue
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        if h % 10000 < thr[src]:
            want.add(doc_id)
    got = {r["doc_id"] for r in q_domain_mixture(spark, SF).collect()}
    assert got == want


def test_tfidf_top_terms_matches_brute_force(spark):
    import math

    from music_streaming_etl_spark.plans.extension_queries import (
        q_tfidf_top_terms,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    occ = {d: Counter(_toks(t)) for d, t in zip(docs["doc_id"], docs["text"])}
    df = Counter(t for c in occ.values() for t in c)
    n_docs = len(occ)
    got: dict = defaultdict(list)
    for r in q_tfidf_top_terms(spark, SF).collect():
        got[r["doc_id"]].append(r)
    for d, tf in occ.items():
        scored = sorted(
            (
                (-round(cnt * math.log(n_docs / df[t]), 6), t, cnt)
                for t, cnt in tf.items()
            ),
        )[:5]
        rs = sorted(got[d], key=lambda r: r["rank"])
        assert len(rs) == len(scored), d
        for r, (neg, term, cnt) in zip(rs, scored):
            assert r["term"] == term and r["tf"] == cnt and r["df"] == df[term]
            assert _close(r["tfidf"], -neg), (d, term)


def test_duplicate_spans_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.extension_queries import (
        q_duplicate_spans,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    spans = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        toks = _toks(t)
        if len(toks) >= 5:
            spans[d] = {
                " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
            }
    cnt = Counter(s for ss in spans.values() for s in ss)
    rows = {r["doc_id"]: r for r in q_duplicate_spans(spark, SF).collect()}
    assert set(rows) == {d for d, ss in spans.items() if ss}
    for d, ss in spans.items():
        shared = sum(1 for s in ss if cnt[s] > 1)
        r = rows[d]
        assert r["n_spans"] == len(ss)
        assert r["n_shared_spans"] == shared
        assert _close(r["dup_fraction"], round(shared / len(ss), 6)), d


def test_window_running_total_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_window_running_total,
    )

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    got = {
        (r["o_custkey"], r["o_orderkey"]): r["running_revenue"]
        for r in q_window_running_total(spark, SF).collect()
    }
    assert len(got) == len(orders)
    od = pd.to_datetime(orders["o_orderdate"]).dt.date
    rows = sorted(
        zip(orders["o_custkey"], od, orders["o_orderkey"],
            orders["o_totalprice"]),
        key=lambda t: (t[0], t[1], t[2]),
    )
    run: dict = {}
    for ck, _, ok, price in rows:
        run[ck] = run.get(ck, Decimal(0)) + Decimal(str(price)).quantize(
            Decimal("0.01")
        )
        assert _close(got[(ck, ok)], float(run[ck])), (ck, ok)


def test_token_frequencies_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_token_frequencies,
    )

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    cnt = Counter(t for txt in docs["text"] for t in _toks(txt))
    want = sorted(((-n, t) for t, n in cnt.items()))[:50]
    rows = sorted(q_token_frequencies(spark, SF).collect(),
                  key=lambda r: r["rank"])
    assert len(rows) == len(want)
    for r, (neg, tok) in zip(rows, want):
        assert (r["token"], r["n"]) == (tok, -neg), r["rank"]


def test_revenue_deciles_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_revenue_deciles,
    )

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    rev: dict = defaultdict(Decimal)
    for ck, price in zip(orders["o_custkey"], orders["o_totalprice"]):
        rev[ck] += Decimal(str(price)).quantize(Decimal("0.01"))
    ordered = sorted(rev.items(), key=lambda kv: (-float(kv[1]), kv[0]))
    n, k = len(ordered), 10
    base, extra = divmod(n, k)
    want: dict = {}
    pos = 0
    for tile in range(1, k + 1):
        size = base + (1 if tile <= extra else 0)
        chunk = ordered[pos : pos + size]
        pos += size
        if chunk:
            want[tile] = (
                len(chunk), float(sum(v for _, v in chunk)),
            )
    got = {
        r["decile"]: (r["n_customers"], r["decile_revenue"])
        for r in q_revenue_deciles(spark, SF).collect()
    }
    assert set(got) == set(want)
    for tile, (nc, tot) in want.items():
        assert got[tile][0] == nc
        assert _close(got[tile][1], tot, tol=1e-6), tile


def test_percent_rank_cume_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.analytics_queries import (
        q_percent_rank_cume,
    )

    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    rev: dict = defaultdict(Decimal)
    for ck, price in zip(orders["o_custkey"], orders["o_totalprice"]):
        rev[ck] += Decimal(str(price)).quantize(Decimal("0.01"))
    seg = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    by_seg: dict = defaultdict(list)
    for ck, v in rev.items():
        if ck in seg:
            by_seg[seg[ck]].append((float(v), ck))
    got = {
        (r["c_mktsegment"], r["custkey"]): (r["pct_rank"], r["cume"])
        for r in q_percent_rank_cume(spark, SF).collect()
    }
    assert len(got) == sum(len(v) for v in by_seg.values())
    for s, pairs in by_seg.items():
        pairs.sort()
        n = len(pairs)
        for i, (_, ck) in enumerate(pairs):
            pr = round(i / (n - 1), 6) if n > 1 else 0.0
            cd = round((i + 1) / n, 6)
            g = got[(s, ck)]
            assert _close(g[0], pr) and _close(g[1], cd), (s, ck)
