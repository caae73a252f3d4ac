"""Round-9 staged surface (plans/staged_r9_queries.py) — full pre-
registration battery: cell-exact oracle parity, DESCRIBE type parity,
independent brute-force property twins, degenerate behavior, and the
domain guard. These keys are NOT in the live registry (276 through
round 8); this suite is the evidence that round 9 can register them
without staging unproven code into the driver window.
"""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from music_streaming_etl_spark.plans.staged_r9_queries import (
    REGISTRY_STAGED_R9,
    q_cramers_v,
    q_jonckheere_terpstra,
    q_ks_two_sample,
    q_mood_median_test,
    q_wilcoxon_signed_rank,
)

from test_oracle_type_parity import canon_duck, canon_spark


@pytest.mark.parametrize("name", sorted(REGISTRY_STAGED_R9))
def test_staged_r9_oracle_parity(spark, sf_dir, duck, name):
    """Cell-exact vs DuckDB at sf0.001 — the driver-gate replica."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    from selfcheck import compare

    fn, osql = REGISTRY_STAGED_R9[name]
    sdf = fn(spark, sf_dir).toPandas()
    spark.catalog.clearCache()
    odf = duck.execute(osql).fetchdf()
    assert compare(name, sdf, odf), f"{name} diverged from oracle"


def test_staged_r9_oracle_type_parity(spark, sf_dir, duck):
    """The registry-wide DESCRIBE gate, applied pre-registration."""
    problems = []
    for name, (fn, oracle) in REGISTRY_STAGED_R9.items():
        spark_types = {
            f.name.lower(): canon_spark(f.dataType.simpleString())
            for f in fn(spark, sf_dir).schema.fields
        }
        desc = duck.execute(f"DESCRIBE {oracle}").fetchall()
        for col, dtype, *_ in desc:
            dt = canon_duck(dtype)
            st = spark_types.get(col.lower())
            if dt == "hugeint" or (dt.startswith("decimal(38,") and dt != st):
                problems.append(
                    f"{name}.{col}: oracle widened to {dtype} (spark={st})"
                )
            elif st is not None and dt != st:
                problems.append(f"{name}.{col}: oracle={dt} spark={st}")
        oracle_cols = {c.lower() for c, *_ in desc}
        if set(spark_types) != oracle_cols:
            problems.append(
                f"{name}: column-set mismatch spark-only="
                f"{sorted(set(spark_types) - oracle_cols)} "
                f"oracle-only={sorted(oracle_cols - set(spark_types))}"
            )
    assert not problems, "\n".join(problems)


# --------------------------------------------------------------------------
# independent brute-force twins (pure python, exact integers where the
# plan is exact — no shared code with the distributed plans)
# --------------------------------------------------------------------------


def _orders_cents(duck):
    return duck.execute(
        "SELECT o_orderpriority AS g, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v "
        "FROM orders"
    ).fetchdf()


def test_ks_two_sample_matches_bruteforce(spark, sf_dir, duck):
    """EXACT integer twin: Python ints are arbitrary-precision, so
    d_num / d_micro / at_value must match to the unit."""
    df = _orders_cents(duck)
    a = sorted(df[df["g"] == "1-URGENT"]["v"])
    b = sorted(df[df["g"] == "5-LOW"]["v"])
    na, nb = len(a), len(b)
    best, at = -1, None
    for v in sorted(set(a) | set(b)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        gap = abs(nb * ca - na * cb)
        if gap > best:
            best, at = gap, v
    row = q_ks_two_sample(spark, sf_dir).collect()[0]
    assert (row.n_a, row.n_b) == (na, nb)
    assert int(row.d_num) == best
    assert row.at_value == at
    assert row.d_micro == best * 10**6 // (na * nb)


def test_jonckheere_matches_bruteforce(spark, sf_dir, duck):
    """O(n²) pairwise twin on the 1.5k-order corpus: J2 and E2 are
    exact integers; z must agree with the float textbook assembly to
    1e-9 relative."""
    df = _orders_cents(duck)
    order = sorted(df["g"].unique())  # the string order IS ordinal
    groups = [sorted(df[df["g"] == g]["v"]) for g in order]
    j2 = 0
    for gi in range(len(groups)):
        for hi in range(gi + 1, len(groups)):
            for x in groups[gi]:
                for y in groups[hi]:
                    if x < y:
                        j2 += 2
                    elif x == y:
                        j2 += 1
    n = len(df)
    ns = [len(g) for g in groups]
    e2 = (n * n - sum(x * x for x in ns)) // 2
    from collections import Counter

    t = Counter(df["v"])
    a_t = n * (n - 1) * (2 * n + 5)
    g3 = sum(x * (x - 1) * (2 * x + 5) for x in ns)
    t3 = sum(x * (x - 1) * (2 * x + 5) for x in t.values())
    gp2 = sum(x * (x - 1) for x in ns)
    tp2 = sum(x * (x - 1) for x in t.values())
    gp3 = sum(x * (x - 1) * (x - 2) for x in ns)
    tp3 = sum(x * (x - 1) * (x - 2) for x in t.values())
    var = (
        (a_t - g3 - t3) / 72.0
        + (gp3 * tp3) / (36.0 * n * (n - 1) * (n - 2))
        + (gp2 * tp2) / (8.0 * n * (n - 1))
    )
    z = (j2 - e2) / (2.0 * var**0.5)
    row = q_jonckheere_terpstra(spark, sf_dir).collect()[0]
    assert row.n_rows == n
    assert int(row.j2) == j2
    assert int(row.e2) == e2
    assert row.z_stat == pytest.approx(z, rel=1e-9)


def test_mood_median_matches_bruteforce(spark, sf_dir, duck):
    """Twin via statistics.median (midpoint-interpolated, the r8
    true-median convention) + the scipy.stats.median_test contingency
    chi² (ties counted in the ≤ cell)."""
    df = duck.execute(
        "SELECT l_returnflag AS g, "
        "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v "
        "FROM lineitem"
    ).fetchdf()
    vals = sorted(df["v"])
    n = len(vals)
    m = statistics.median(vals)
    m2 = int(round(m * 2))
    flags = sorted(df["g"].unique())
    ns = {g: int((df["g"] == g).sum()) for g in flags}
    above = {
        g: int(((df["g"] == g) & (2 * df["v"] > m2)).sum()) for g in flags
    }
    a_tot = sum(above.values())
    chi2 = sum(
        (above[g] * n - ns[g] * a_tot) ** 2 / ns[g] for g in flags
    ) / (a_tot * (n - a_tot))
    row = q_mood_median_test(spark, sf_dir).collect()[0]
    assert row.n_rows == n and row.n_groups == len(flags)
    assert row.grand_median_x2 == m2
    assert row.n_above == a_tot
    assert row.chi2_stat == pytest.approx(chi2, rel=1e-9)


# --------------------------------------------------------------------------
# degenerate + guard behavior
# --------------------------------------------------------------------------


def _write_orders(spark, tmp_path, rows):
    out = str(tmp_path / "orders.parquet")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderstatus string, o_orderpriority string, o_orderdate date",
    ).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_ks_constant_corpus_zero_gap(spark, sf_dir, tmp_path):
    """All values identical → the two ECDFs coincide → d_num = 0 and
    at_value is that single value."""
    import datetime

    rows = [
        (i, i, 100.0, "O", p, datetime.date(1995, 1, 1))
        for i in range(20)
        for p in ("1-URGENT", "5-LOW")
    ]
    d = _write_orders(spark, tmp_path, rows)
    row = q_ks_two_sample(spark, d).collect()[0]
    assert (row.n_a, row.n_b) == (20, 20)
    assert int(row.d_num) == 0 and row.d_micro == 0
    assert row.at_value == 10000


def test_ks_empty_corpus_empty_result(spark, sf_dir, tmp_path):
    """No URGENT/LOW rows → zero result rows (both engines agree: the
    max-gap frame is empty)."""
    import datetime

    rows = [(1, 1, 100.0, "O", "3-MEDIUM", datetime.date(1995, 1, 1))]
    d = _write_orders(spark, tmp_path, rows)
    assert q_ks_two_sample(spark, d).count() == 0


def test_jonckheere_domain_guard_nulls_stats(spark, sf_dir, tmp_path):
    """A 6th priority outside the closed pivot domain must NULL the
    derived statistics (it would otherwise be counted in n_rows but
    missing from the doubled pair sum)."""
    import datetime

    rows = [
        (i, i, 100.0 + i, "O", p, datetime.date(1995, 1, 1))
        for i, p in enumerate(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
             "5-LOW", "6-EXOTIC"]
        )
    ]
    d = _write_orders(spark, tmp_path, rows)
    row = q_jonckheere_terpstra(spark, d).collect()[0]
    assert row.n_rows == 6
    assert row.j2 is None and row.e2 is None and row.z_stat is None


def test_jonckheere_no_trend_is_zeroish(spark, sf_dir, tmp_path):
    """Identical distributions in every group → J2 == E2 exactly on a
    symmetric corpus → z == 0."""
    import datetime

    rows = []
    i = 0
    for p in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"):
        for v in (100.0, 200.0, 300.0):
            rows.append((i, i, v, "O", p, datetime.date(1995, 1, 1)))
            i += 1
    d = _write_orders(spark, tmp_path, rows)
    row = q_jonckheere_terpstra(spark, d).collect()[0]
    assert int(row.j2) == int(row.e2)
    assert row.z_stat == 0.0


def test_mood_constant_corpus_chi2_null(spark, sf_dir, tmp_path):
    """Every value equals the median → the 'above' row of the
    contingency is all-zero → chi² NULL (A·(N−A) = 0), never a
    division error."""
    out = str(tmp_path / "lineitem.parquet")
    spark.createDataFrame(
        [(i, "A" if i % 3 == 0 else ("N" if i % 3 == 1 else "R"), 50.0)
         for i in range(30)],
        "l_orderkey long, l_returnflag string, l_extendedprice double",
    ).write.mode("overwrite").parquet(out)
    row = q_mood_median_test(spark, str(tmp_path)).collect()[0]
    assert row.n_rows == 30
    assert row.grand_median_x2 == 10000
    assert row.n_above == 0
    assert row.chi2_stat is None


def test_cramers_v_matches_bruteforce(spark, sf_dir, duck):
    """Twin via plain float contingency math (numpy-free): chi² and V
    to 1e-6 relative (the 1e-9 cell quantization is far below)."""
    df = duck.execute(
        "SELECT CAST(user_id % 3 AS BIGINT) AS variant, event_type, "
        "COUNT(*) AS o FROM events GROUP BY 1, 2"
    ).fetchdf()
    n = df["o"].sum()
    rt = df.groupby("variant")["o"].sum()
    ct = df.groupby("event_type")["o"].sum()
    chi2 = 0.0
    for _, row in df.iterrows():
        e = rt[row["variant"]] * ct[row["event_type"]] / n
        chi2 += (row["o"] - e) ** 2 / e
    r, c = df["variant"].nunique(), df["event_type"].nunique()
    v = ((chi2 / n) / (min(r, c) - 1)) ** 0.5
    got = q_cramers_v(spark, sf_dir).collect()[0]
    assert got.n_rows == n
    assert (got.n_variants, got.n_types) == (r, c)
    assert got.chi2_stat == pytest.approx(chi2, rel=1e-6)
    assert got.v_stat == pytest.approx(v, rel=1e-6)


def test_wilcoxon_matches_bruteforce(spark, sf_dir, duck):
    """EXACT integer twin for W2/E2 (python ints), float twin for z:
    pandas average ranks of |d| over the paired 95→96 customer cents
    differences, zeros dropped."""
    import pandas as pd

    df = duck.execute(
        "SELECT o_custkey AS cust, EXTRACT(year FROM o_orderdate) AS y, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c "
        "FROM orders WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)"
    ).fetchdf()
    per = df.pivot_table(
        index="cust", columns="y", values="c", aggfunc="sum"
    )
    both = per.dropna()
    d = (both[1996] - both[1995]).astype(int)
    d = d[d != 0]
    n = len(d)
    ranks = d.abs().rank(method="average")
    w = float(ranks[d > 0].sum())
    e = n * (n + 1) / 4.0
    from collections import Counter

    t = Counter(d.abs())
    ties = sum(x**3 - x for x in t.values())
    var = (n * (n + 1) * (2 * n + 1) - ties / 2.0) / 24.0
    z = (w - e) / var**0.5
    got = q_wilcoxon_signed_rank(spark, sf_dir).collect()[0]
    assert got.n_pairs == n
    assert int(got.w2_pos) == int(round(2 * w))
    assert int(got.e2) == n * (n + 1) // 2
    assert got.z_stat == pytest.approx(z, rel=1e-9)


# --------------------------------------------------------------------------
# benchmark_decontamination
# --------------------------------------------------------------------------


def _write_docs(spark, tmp_path, rows):
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    ).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_decontamination_matches_bruteforce(spark, sf_dir):
    """Independent pure-Python twin: distinct 5-gram sets per doc,
    eval union from the doc_id % 20 == 0 slice, exact hit counts."""
    import re

    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")

    def spans(text):
        toks = re.split(r"\s+", str(text).strip().lower())
        return {
            " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
        }

    by_doc = {r.doc_id: spans(r.text) for r in docs.itertuples()}
    eval_union = set()
    for did, s in by_doc.items():
        if did % 20 == 0:
            eval_union |= s
    expected = {
        did: (len(s), len(s & eval_union))
        for did, s in by_doc.items()
        if did % 20 != 0 and s
    }
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_benchmark_decontamination,
    )

    got = {
        r.doc_id: (r.n_spans, r.n_eval_hits, r.contamination_fraction)
        for r in q_benchmark_decontamination(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for did, (n, hits) in expected.items():
        gn, gh, frac = got[did]
        assert (gn, gh) == (n, hits), did
        assert frac == hits / n, did


def test_decontamination_planted_quote(spark, tmp_path):
    """A training doc quoting an eval doc's 5-gram is flagged with the
    exact hit count; a disjoint training doc reports zero hits."""
    rows = [
        # eval doc (id % 20 == 0)
        (20, "alpha beta gamma delta epsilon zeta", "en", "s", 35),
        # quotes the eval doc's first 5-gram; 3 distinct spans total
        (1, "alpha beta gamma delta epsilon qq rr", "en", "s", 37),
        # disjoint vocabulary
        (2, "uu vv ww xx yy zz", "en", "s", 17),
    ]
    d = _write_docs(spark, tmp_path, rows)
    from music_streaming_etl_spark.operators.dedup import (
        benchmark_decontamination,
    )

    out = {
        r.doc_id: r
        for r in benchmark_decontamination(
            spark.read.parquet(f"{d}/documents.parquet"),
            "doc_id",
            "text",
        ).collect()
    }
    assert set(out) == {1, 2}
    assert (out[1].n_spans, out[1].n_eval_hits) == (3, 1)
    assert out[1].contamination_fraction == 1 / 3
    assert (out[2].n_spans, out[2].n_eval_hits) == (2, 0)
    assert out[2].contamination_fraction == 0.0


def test_decontamination_short_docs_and_eval_docs_absent(spark, tmp_path):
    """Docs under span_n tokens yield no spans (absent — the
    duplicate_span_stats convention); eval-slice docs never appear."""
    rows = [
        (0, "one two three four five six", "en", "s", 27),  # eval
        (3, "just four tokens here", "en", "s", 21),  # too short
        (4, "aa bb cc dd ee ff", "en", "s", 17),  # normal train doc
    ]
    d = _write_docs(spark, tmp_path, rows)
    from music_streaming_etl_spark.operators.dedup import (
        benchmark_decontamination,
    )

    out = benchmark_decontamination(
        spark.read.parquet(f"{d}/documents.parquet"), "doc_id", "text"
    ).collect()
    assert {r.doc_id for r in out} == {4}


def test_decontamination_empty_corpus(spark, tmp_path):
    """Zero documents → zero result rows in both engines."""
    d = _write_docs(spark, tmp_path, [])
    from music_streaming_etl_spark.operators.dedup import (
        benchmark_decontamination,
    )

    assert (
        benchmark_decontamination(
            spark.read.parquet(f"{d}/documents.parquet"), "doc_id", "text"
        ).count()
        == 0
    )


# --------------------------------------------------------------------------
# friedman_test
# --------------------------------------------------------------------------


def test_friedman_matches_bruteforce(spark, sf_dir, duck):
    """Independent pandas twin: pivot month×priority cents sums, drop
    incomplete blocks, average ranks per row, tie-corrected χ² via
    the scipy.friedmanchisquare formula — exact integer comparison
    for the doubled rank sums / tie term, 1e-9 rel for χ²."""
    import pandas as pd

    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_friedman_test,
    )

    df = duck.execute(
        "SELECT (EXTRACT(year FROM o_orderdate) * 100 "
        "        + EXTRACT(month FROM o_orderdate)) AS ym, "
        "o_orderpriority AS g, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c "
        "FROM orders"
    ).fetchdf()
    cells = df.pivot_table(
        index="ym", columns="g", values="c", aggfunc="sum"
    )
    pris = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    cells = cells.reindex(columns=pris).dropna()
    n, k = cells.shape
    ranks = cells.rank(axis=1, method="average")
    rsum = ranks.sum(axis=0)
    ssbn = float((rsum**2).sum())
    chi_un = 12.0 * ssbn / (n * k * (k + 1)) - 3.0 * n * (k + 1)
    ties = 0
    for _, row in cells.iterrows():
        for t in row.value_counts().values:
            ties += t**3 - t
    c = 1.0 - ties / (n * (k**3 - k))
    chi2 = chi_un / c
    got = q_friedman_test(spark, sf_dir).collect()[0]
    assert got.n_blocks == n
    names = ("urgent", "high", "medium", "notspec", "low")
    for j, p in enumerate(pris):
        assert int(got[f"r2_{names[j]}"]) == int(round(2 * rsum[p])), p
    assert int(got.tie_term) == ties
    assert got.chi2_stat == pytest.approx(chi2, rel=1e-9)


def test_friedman_all_tied_chi2_null(spark, sf_dir, tmp_path):
    """Every block fully tied → correction term hits 0 → χ² NULL;
    each doubled rank is k+1=6, so every rank sum is 6·n_blocks."""
    import datetime

    pris = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    rows = [
        (m * 10 + i, 1, 100.0, "O", p, datetime.date(1995, m, 1))
        for m in (1, 2)
        for i, p in enumerate(pris)
    ]
    d = _write_orders(spark, tmp_path, rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_friedman_test,
    )

    got = q_friedman_test(spark, d).collect()[0]
    assert got.n_blocks == 2
    assert got.chi2_stat is None
    assert got.tie_term == 2 * (5**3 - 5)
    for c in ("urgent", "high", "medium", "notspec", "low"):
        assert got[f"r2_{c}"] == 12


def test_friedman_incomplete_blocks_dropped(spark, sf_dir, tmp_path):
    """A month missing a priority is dropped (listwise complete-block
    convention) — it contributes to neither n_blocks nor the ranks."""
    import datetime

    pris = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    rows = [
        (i, 1, 100.0 + 10 * i, "O", p, datetime.date(1995, 1, 1))
        for i, p in enumerate(pris)
    ] + [
        (10 + i, 1, 50.0, "O", p, datetime.date(1995, 2, 1))
        for i, p in enumerate(pris[:4])
    ]
    d = _write_orders(spark, tmp_path, rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_friedman_test,
    )

    got = q_friedman_test(spark, d).collect()[0]
    assert got.n_blocks == 1
    # single strictly-increasing block: doubled ranks 2,4,6,8,10
    assert [
        got.r2_urgent, got.r2_high, got.r2_medium,
        got.r2_notspec, got.r2_low,
    ] == [2, 4, 6, 8, 10]
    assert got.tie_term == 0


def test_friedman_domain_guard_nulls_stats(spark, sf_dir, tmp_path):
    """A 6th priority anywhere (even in a month later dropped as
    incomplete) NULLs every derived statistic — both engines must
    refuse rather than agree on a statistically wrong value."""
    import datetime

    pris = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    rows = [
        (i, 1, 100.0 + 10 * i, "O", p, datetime.date(1995, 1, 1))
        for i, p in enumerate(pris)
    ] + [(99, 1, 10.0, "O", "6-ROGUE", datetime.date(1995, 2, 1))]
    d = _write_orders(spark, tmp_path, rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_friedman_test,
    )

    got = q_friedman_test(spark, d).collect()[0]
    assert got.n_blocks == 1
    assert got.chi2_stat is None and got.tie_term is None
    assert got.r2_urgent is None and got.r2_low is None


def test_friedman_empty_corpus(spark, sf_dir, tmp_path):
    """Zero orders → the one-row global-agg grain with n_blocks = 0
    and NULL statistics (both engines emit the single row)."""
    d = _write_orders(spark, tmp_path, [])
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_friedman_test,
    )

    got = q_friedman_test(spark, d).collect()[0]
    assert got.n_blocks == 0
    assert got.chi2_stat is None


# --------------------------------------------------------------------------
# cochrans_q
# --------------------------------------------------------------------------


def _write_events(spark, tmp_path, rows):
    out = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_cochrans_q_matches_bruteforce(spark, sf_dir, duck):
    """Independent pandas twin: per-user binary indicators over the
    funnel trio, the TEXTBOOK k(k−1)Σ(C_j−N̄)²/(kΣR−ΣR²) formula in
    floats, q_micro must equal its floor at 1e-6 grain (the emitted
    form is the exact integer identity of the same quantity)."""
    import math

    df = duck.execute(
        "WITH c AS (SELECT user_id, "
        "SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS n0, "
        "SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS n1, "
        "SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS n2 "
        "FROM events WHERE event_type IN ('view','click','purchase') "
        "GROUP BY 1) "
        "SELECT CASE WHEN 3*n0 > n0+n1+n2 THEN 1 ELSE 0 END AS x0, "
        "CASE WHEN 3*n1 > n0+n1+n2 THEN 1 ELSE 0 END AS x1, "
        "CASE WHEN 3*n2 > n0+n1+n2 THEN 1 ELSE 0 END AS x2 FROM c"
    ).fetchdf()
    k = 3
    b = len(df)
    c = [int(df.x0.sum()), int(df.x1.sum()), int(df.x2.sum())]
    r = df.x0 + df.x1 + df.x2
    n = int(r.sum())
    sr2 = int((r * r).sum())
    num = (k - 1) * (k * sum(x * x for x in c) - n * n)
    den = k * n - sr2
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_cochrans_q,
    )

    got = q_cochrans_q(spark, sf_dir).collect()[0]
    assert got.n_blocks == b
    assert [got.dom_view, got.dom_click, got.dom_purchase] == c
    if den == 0:
        # all-or-nothing corpus (sf0.001 is one: every active user
        # hits the whole funnel) — the NULL branch
        assert got.q_micro is None
    else:
        # exact integer identity vs the float textbook form
        assert got.q_micro == num * 1000000 // den
        q_float = (
            k
            * (k - 1)
            * sum((x - n / k) ** 2 for x in c)
            / (k * n - sr2)
        )
        assert got.q_micro == math.floor(q_float * 1e6) or abs(
            got.q_micro / 1e6 - q_float
        ) < 1e-6


def test_cochrans_q_planted_small_case(spark, sf_dir, tmp_path):
    """Hand-computed 3-user dominance case: u1 (view only) has view
    dominant; u2 (view+click) has both above the 2/3 mean; u3
    (balanced 1/1/1) has none. C=(2,1,0), N=3, ΣR²=5 → den=4,
    num=2·(3·5−9)=12 → Q = 3 exactly → q_micro = 3,000,000."""
    import datetime

    t = datetime.datetime(1995, 1, 1)
    rows = []
    eid = 0
    for uid, types in [
        (1, ["view"]),
        (2, ["view", "click"]),
        (3, ["view", "click", "purchase"]),
    ]:
        for ty in types:
            rows.append((eid, t, uid, ty, 1.0, "{}"))
            eid += 1
    d = _write_events(spark, tmp_path, rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_cochrans_q,
    )

    got = q_cochrans_q(spark, d).collect()[0]
    assert got.n_blocks == 3
    assert [got.dom_view, got.dom_click, got.dom_purchase] == [2, 1, 0]
    assert got.q_micro == 3_000_000


def test_cochrans_q_balanced_corpus_null(spark, sf_dir, tmp_path):
    """Every user's stage counts exactly balanced → no stage is
    strictly above any user's own mean → all R_i = 0 → the
    denominator ΣR(k−R) is 0 → Q NULL (no discordance, no info)."""
    import datetime

    t = datetime.datetime(1995, 1, 1)
    rows = [
        (u * 10 + j, t, u, ty, 1.0, "{}")
        for u in (1, 2)
        for j, ty in enumerate(("view", "click", "purchase"))
    ]
    d = _write_events(spark, tmp_path, rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_cochrans_q,
    )

    got = q_cochrans_q(spark, d).collect()[0]
    assert got.n_blocks == 2
    assert [got.dom_view, got.dom_click, got.dom_purchase] == [0, 0, 0]
    assert got.q_micro is None


def test_cochrans_q_ignores_non_funnel_types(spark, sf_dir, tmp_path):
    """signup/error events are not treatments: a user with ONLY such
    events is not a block at all."""
    import datetime

    t = datetime.datetime(1995, 1, 1)
    rows = [
        (1, t, 1, "view", 1.0, "{}"),
        (2, t, 1, "click", 1.0, "{}"),
        (3, t, 2, "signup", 1.0, "{}"),
        (4, t, 2, "error", 1.0, "{}"),
    ]
    d = _write_events(spark, tmp_path, rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_cochrans_q,
    )

    got = q_cochrans_q(spark, d).collect()[0]
    assert got.n_blocks == 1
    assert [got.dom_view, got.dom_click, got.dom_purchase] == [1, 1, 0]


def test_cochrans_q_empty_corpus(spark, sf_dir, tmp_path):
    """Zero events → the one-row global-agg grain, n_blocks = 0 and
    NULL statistic in both engines."""
    d = _write_events(spark, tmp_path, [])
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_cochrans_q,
    )

    got = q_cochrans_q(spark, d).collect()[0]
    assert got.n_blocks == 0
    assert got.q_micro is None


# --------------------------------------------------------------------------
# page_trend_test
# --------------------------------------------------------------------------


def test_page_trend_matches_bruteforce(spark, sf_dir, duck):
    """Independent pandas twin over the shared friedman blocks:
    L = Σ j·R_j with average ranks, z from the classical no-ties
    moments — L2 exact integer, z to 1e-9 rel."""
    df = duck.execute(
        "SELECT (EXTRACT(year FROM o_orderdate) * 100 "
        "        + EXTRACT(month FROM o_orderdate)) AS ym, "
        "o_orderpriority AS g, "
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c "
        "FROM orders"
    ).fetchdf()
    cells = df.pivot_table(
        index="ym", columns="g", values="c", aggfunc="sum"
    )
    pris = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    cells = cells.reindex(columns=pris).dropna()
    n, k = cells.shape
    ranks = cells.rank(axis=1, method="average")
    rsum = ranks.sum(axis=0)
    L = sum((j + 1) * rsum[p] for j, p in enumerate(pris))
    e = n * k * (k + 1) ** 2 / 4.0
    var = n * k**2 * (k + 1) ** 2 * (k - 1) / 144.0
    z = (L - e) / var**0.5
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_page_trend_test,
    )

    got = q_page_trend_test(spark, sf_dir).collect()[0]
    assert got.n_blocks == n
    assert int(got.l2) == int(round(2 * L))
    assert got.z_stat == pytest.approx(z, rel=1e-9)


def test_page_trend_perfect_increasing_block(spark, sf_dir, tmp_path):
    """One strictly increasing block: doubled ranks (2,4,6,8,10) →
    L2 = 110, E2 = 90, Var2 = 100 → z = 2 exactly."""
    import datetime

    pris = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    rows = [
        (i, 1, 100.0 + 10 * i, "O", p, datetime.date(1995, 1, 1))
        for i, p in enumerate(pris)
    ]
    d = _write_orders(spark, tmp_path, rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_page_trend_test,
    )

    got = q_page_trend_test(spark, d).collect()[0]
    assert got.n_blocks == 1
    assert got.l2 == 110
    assert got.z_stat == pytest.approx(2.0)


def test_page_trend_guard_and_empty(spark, sf_dir, tmp_path):
    """The shared domain guard NULLs l2/z on a rogue priority; the
    empty corpus emits the one n_blocks=0 row with NULL stats."""
    import datetime

    pris = [
        "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
    ]
    rows = [
        (i, 1, 100.0 + 10 * i, "O", p, datetime.date(1995, 1, 1))
        for i, p in enumerate(pris)
    ] + [(99, 1, 10.0, "O", "6-ROGUE", datetime.date(1995, 2, 1))]
    d = _write_orders(spark, tmp_path, rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_page_trend_test,
    )

    got = q_page_trend_test(spark, d).collect()[0]
    assert got.n_blocks == 1
    assert got.l2 is None and got.z_stat is None

    d2 = _write_orders(spark, tmp_path / "empty", [])
    got2 = q_page_trend_test(spark, d2).collect()[0]
    assert got2.n_blocks == 0
    assert got2.l2 is None and got2.z_stat is None


# --------------------------------------------------------------------------
# runs_test
# --------------------------------------------------------------------------


def test_runs_test_matches_bruteforce(spark, sf_dir, duck):
    """Independent pandas twin: daily cents totals, doubled-grid
    midpoint median, sign sequence by day, run count by scanning —
    exact integers for n1/n2/R, 1e-9 rel for z."""
    df = duck.execute(
        "SELECT CAST(o_orderdate AS DATE) AS day, "
        "SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))"
        " AS v FROM orders GROUP BY 1 ORDER BY day"
    ).fetchdf()
    vals = sorted(int(x) for x in df.v)
    n = len(vals)
    m2 = vals[(n + 1) // 2 - 1] + vals[n // 2]
    signs = [
        1 if 2 * int(v) > m2 else 0 for v in df.v if 2 * int(v) != m2
    ]
    n1 = sum(signs)
    n2 = len(signs) - n1
    r = 1 + sum(
        1 for a, b in zip(signs, signs[1:]) if a != b
    ) if signs else None
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_runs_test,
    )

    got = q_runs_test(spark, sf_dir).collect()[0]
    assert (got.n_above, got.n_below) == (n1, n2)
    assert got.r_runs == r
    nn = n1 + n2
    e = 1.0 + 2.0 * n1 * n2 / nn
    var = (
        2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1.0))
    )
    z = (r - e) / var**0.5
    assert got.z_stat == pytest.approx(z, rel=1e-9)


def test_runs_test_alternating_and_blocked(spark, sf_dir, tmp_path):
    """Two crafted sequences: perfectly alternating daily values →
    maximum runs (R = n); two solid blocks → minimum runs (R = 2)."""
    import datetime

    base = datetime.date(1995, 1, 1)
    # alternating low/high over 10 days
    rows = [
        (i, 1, 100.0 if i % 2 == 0 else 200.0, "O", "1-URGENT",
         base + datetime.timedelta(days=i))
        for i in range(10)
    ]
    d = _write_orders(spark, tmp_path / "alt", rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_runs_test,
    )

    got = q_runs_test(spark, d).collect()[0]
    assert (got.n_above, got.n_below) == (5, 5)
    assert got.r_runs == 10  # every step is a sign change
    # blocked: 5 low days then 5 high days -> 2 runs
    rows2 = [
        (i, 1, 100.0 if i < 5 else 200.0, "O", "1-URGENT",
         base + datetime.timedelta(days=i))
        for i in range(10)
    ]
    d2 = _write_orders(spark, tmp_path / "blk", rows2)
    got2 = q_runs_test(spark, d2).collect()[0]
    assert (got2.n_above, got2.n_below) == (5, 5)
    assert got2.r_runs == 2
    # symmetric counts: z is negative for too-few runs
    assert got2.z_stat < 0 < got.z_stat


def test_runs_test_constant_and_empty(spark, sf_dir, tmp_path):
    """Constant daily totals → every day AT the median → all dropped
    → zero signed days and NULL z; empty corpus → the same NULL
    shape with a NULL run count."""
    import datetime

    base = datetime.date(1995, 1, 1)
    rows = [
        (i, 1, 100.0, "O", "1-URGENT", base + datetime.timedelta(days=i))
        for i in range(6)
    ]
    d = _write_orders(spark, tmp_path / "const", rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_runs_test,
    )

    got = q_runs_test(spark, d).collect()[0]
    assert (got.n_above, got.n_below) == (0, 0)
    assert got.z_stat is None

    d2 = _write_orders(spark, tmp_path / "empty", [])
    got2 = q_runs_test(spark, d2).collect()[0]
    assert (got2.n_above, got2.n_below) == (0, 0)
    assert got2.r_runs is None and got2.z_stat is None


# --------------------------------------------------------------------------
# durbin_watson
# --------------------------------------------------------------------------


def test_durbin_watson_matches_bruteforce(spark, sf_dir, duck):
    """Independent pandas twin: same OLS-on-exact-sums fit, same
    cents-floor residual grid (exact integer comparison), plus a
    loose pin against the UNQUANTIZED textbook DW (the grid residue
    must be immaterial at cents scale)."""
    import math

    df = duck.execute(
        "SELECT CAST(o_orderdate AS DATE) AS day, "
        "SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))"
        " AS y FROM orders GROUP BY 1 ORDER BY day"
    ).fetchdf()
    n = len(df)
    ys = [int(v) for v in df.y]
    ts = list(range(n))
    st, st2 = sum(ts), sum(t * t for t in ts)
    sy, sty = sum(ys), sum(t * y for t, y in zip(ts, ys))
    slope = (n * sty - st * sy) / (n * st2 - st * st)
    a = (sy - slope * st) / n
    e = [math.floor(y - (a + slope * t)) for t, y in zip(ts, ys)]
    num = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
    den = sum(x * x for x in e)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_durbin_watson,
    )

    got = q_durbin_watson(spark, sf_dir).collect()[0]
    assert got.n_days == n
    assert int(got.ss_diff_c2) == num
    assert int(got.ss_resid_c2) == den
    assert got.dw_micro == num * 1000000 // den
    # unquantized textbook DW within the cents-grid residue
    ef = [y - (a + slope * t) for t, y in zip(ts, ys)]
    dw_f = sum(
        (ef[i] - ef[i - 1]) ** 2 for i in range(1, n)
    ) / sum(x * x for x in ef)
    assert abs(got.dw_micro / 1e6 - dw_f) < 1e-3


def test_durbin_watson_alternating_low_dw_pattern(spark, sf_dir, tmp_path):
    """A strongly trending-in-blocks series (5 low then 5 high days,
    detrended by OLS) leaves positively autocorrelated residuals →
    DW well below 2; an alternating series → DW above 2."""
    import datetime

    base = datetime.date(1995, 1, 1)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_durbin_watson,
    )

    blocked = [
        (i, 1, 100.0 if i < 5 else 200.0, "O", "1-URGENT",
         base + datetime.timedelta(days=i))
        for i in range(10)
    ]
    d1 = _write_orders(spark, tmp_path / "blk", blocked)
    dw_blocked = q_durbin_watson(spark, d1).collect()[0]
    alt = [
        (i, 1, 100.0 if i % 2 == 0 else 200.0, "O", "1-URGENT",
         base + datetime.timedelta(days=i))
        for i in range(10)
    ]
    d2 = _write_orders(spark, tmp_path / "alt", alt)
    dw_alt = q_durbin_watson(spark, d2).collect()[0]
    assert dw_blocked.dw_micro < 2_000_000 < dw_alt.dw_micro


def test_durbin_watson_perfect_fit_and_empty(spark, sf_dir, tmp_path):
    """A perfectly linear daily series (integer-exact fit) leaves
    zero residuals → Σe² = 0 → NULL statistic; empty corpus → the
    one n_days=0 row with NULLs."""
    import datetime

    base = datetime.date(1995, 1, 1)
    rows = [
        (i, 1, 100.0 + 10.0 * i, "O", "1-URGENT",
         base + datetime.timedelta(days=i))
        for i in range(5)
    ]
    d = _write_orders(spark, tmp_path / "lin", rows)
    from music_streaming_etl_spark.plans.staged_r9_queries import (
        q_durbin_watson,
    )

    got = q_durbin_watson(spark, d).collect()[0]
    assert got.n_days == 5
    assert int(got.ss_resid_c2) == 0
    assert got.dw_micro is None

    d2 = _write_orders(spark, tmp_path / "empty", [])
    got2 = q_durbin_watson(spark, d2).collect()[0]
    assert got2.n_days == 0
    assert got2.dw_micro is None
