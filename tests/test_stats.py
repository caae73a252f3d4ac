"""Brute-force property twins for the statistical-test operators —
the DuckDB oracle can mirror a shared formula mistake; these re-derive
Mann-Whitney U / AUC and the moment formulas independently (pure
Python, pooled-rank definition) on randomized inputs, plus
partitioning-independence for the distributed prefix-sum path."""

from __future__ import annotations

import math
import random

from music_streaming_etl_spark.operators.stats import rank_sum_stats


def _brute_mwu(pos, neg):
    """Textbook pooled average-rank formulation."""
    pooled = sorted(pos + neg)
    # average rank per value (1-based)
    ranks = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        ranks[pooled[i]] = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        i = j
    n1, n2, n = len(pos), len(neg), len(pos) + len(neg)
    r1 = sum(ranks[v] for v in pos)
    u1 = r1 - n1 * (n1 + 1) / 2.0
    # tie correction
    from collections import Counter

    t3 = sum(t**3 - t for t in Counter(pooled).values())
    var = n1 * n2 / 12.0 * ((n + 1) - t3 / (n * (n - 1))) if n > 1 else 0.0
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var) if var > 0 else None
    auc = u1 / (n1 * n2) if n1 and n2 else None
    return u1, z, auc


def _run(spark, pos, neg, parts=7):
    rows = [(v, True) for v in pos] + [(v, False) for v in neg]
    df = spark.createDataFrame(rows, "v long, is_pos boolean").repartition(
        parts
    )
    return rank_sum_stats(df, "v", "is_pos").collect()[0]


def test_rank_sum_matches_brute_force_random(spark):
    rng = random.Random(11)
    for trial, (n1, n2, vr) in enumerate(
        [(40, 60, 1000), (30, 30, 8), (100, 17, 3), (5, 200, 10**12)]
    ):
        pos = [rng.randrange(vr) for _ in range(n1)]
        neg = [rng.randrange(vr) for _ in range(n2)]
        u1, z, auc = _brute_mwu(pos, neg)
        row = _run(spark, pos, neg)
        assert row["n_pos"] == n1 and row["n_neg"] == n2, trial
        assert abs(row["u_pos"] - u1) < 1e-9, (trial, row["u_pos"], u1)
        if z is None:
            assert row["z"] is None, trial
        else:
            assert abs(row["z"] - z) < 1e-5, (trial, row["z"], z)
        assert abs(row["auc"] - auc) < 1e-5, trial


def test_rank_sum_degenerate_and_partitioning(spark):
    # all values tied -> var 0 -> z NULL, auc exactly 0.5
    row = _run(spark, [7] * 10, [7] * 20)
    assert row["z"] is None and abs(row["auc"] - 0.5) < 1e-9
    # perfect separation -> auc 1.0
    row = _run(spark, [100, 101], [1, 2, 3])
    assert row["auc"] == 1.0 and row["u_pos"] == 6.0
    # partitioning independence of the prefix-sum path
    pos = [i % 13 for i in range(50)]
    neg = [i % 7 for i in range(80)]
    a = _run(spark, pos, neg, parts=1)
    b = _run(spark, pos, neg, parts=17)
    assert a == b


def test_moment_formulas_match_numpy(spark):
    import numpy as np

    from music_streaming_etl_spark.plans.stats_queries import (
        q_distribution_moments,
    )

    rows = q_distribution_moments(spark, "/root/testdata/sf0.001").collect()
    import pandas as pd

    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    orders["p"] = orders["o_totalprice"].round(2)
    for r in rows:
        x = orders.loc[
            orders["o_orderpriority"] == r["o_orderpriority"], "p"
        ].to_numpy(dtype=float)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        assert r["n"] == len(x)
        assert abs(r["mean_price"] - mu) < 1e-4
        assert abs(r["skewness"] - m3 / m2**1.5) < 1e-5
        assert abs(r["excess_kurtosis"] - (m4 / m2**2 - 3.0)) < 1e-5


def test_regression_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from music_streaming_etl_spark.plans.stats_queries import (
        q_regression_slope_daily,
    )

    rows = q_regression_slope_daily(spark, "/root/testdata/sf0.001").collect()
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    orders["day"] = orders["o_orderdate"].dt.normalize()
    orders["cents"] = (
        (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    )
    for r in rows:
        g = (
            orders[orders["o_orderpriority"] == r["o_orderpriority"]]
            .groupby("day")["cents"]
            .sum()
        )
        x = (g.index - pd.Timestamp("1992-01-01")).days.to_numpy(float)
        y = g.to_numpy(float)
        slope, intercept = np.polyfit(x, y, 1)
        cc = np.corrcoef(x, y)[0, 1]
        assert r["n_days"] == len(x)
        assert abs(r["slope_cents_per_day"] - slope) < max(
            1e-4, abs(slope) * 1e-6
        )
        assert abs(r["intercept_cents"] - intercept) < max(
            1e-2, abs(intercept) * 1e-6
        )
        assert abs(r["r2"] - cc * cc) < 1e-6


def test_cusum_identity_matches_recurrence_loop(spark):
    """The declarative reflection identity vs the literal sequential
    recurrence, on randomized deviation series."""
    rng = random.Random(23)
    for trial in range(4):
        d = [rng.randrange(-50, 51) for _ in range(200)]
        cpos, cneg, ep, en = [], [], 0, 0
        for x in d:
            ep = max(0, ep + x)
            en = min(0, en + x)
            cpos.append(ep)
            cneg.append(en)
        rows = [(i, x) for i, x in enumerate(d)]
        df = spark.createDataFrame(rows, "i long, d long").repartition(5)
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        w = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
        got = (
            df.withColumn("s", F.sum("d").over(w))
            .withColumn("rmin", F.min("s").over(w))
            .withColumn("rmax", F.max("s").over(w))
            .select(
                "i",
                (F.col("s") - F.least(F.lit(0), F.col("rmin"))).alias("cp"),
                (F.col("s") - F.greatest(F.lit(0), F.col("rmax"))).alias("cn"),
            )
            .orderBy("i")
            .collect()
        )
        assert [r["cp"] for r in got] == cpos, trial
        assert [r["cn"] for r in got] == cneg, trial


def test_gini_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_gini_coefficient,
    )
    import pandas as pd

    row = q_gini_coefficient(spark, "/root/testdata/sf0.001").collect()[0]
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    orders["cents"] = (
        (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    )
    c = sorted(orders.groupby("o_custkey")["cents"].sum().to_list())
    n, sc = len(c), sum(c)
    src = sum((i + 1) * v for i, v in enumerate(c))
    gini = (2.0 * src - (n + 1.0) * sc) / (n * sc)
    assert row["n_customers"] == n and row["total_cents"] == sc
    assert abs(row["gini"] - gini) < 1e-6


def test_entropy_bounds_and_uniform_case(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_event_entropy

    rows = q_event_entropy(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no users"
    for r in rows:
        assert r["entropy_nats"] >= 0.0
        assert r["entropy_nats"] <= math.log(r["n_types"]) + 1e-6
    # hand-built uniform distribution -> exactly ln(k) (to 6dp quantization)
    ev = spark.createDataFrame(
        [(1, t) for t in "abcd" for _ in range(25)],
        "user_id long, event_type string",
    )
    from music_streaming_etl_spark.plans import stats_queries as SQ
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    ce = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w = Window.partitionBy("user_id")
    withn = ce.withColumn("n", F.sum("c").over(w))
    term = F.col("c").cast("decimal(19,0)") * F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double")), 6
    ).cast("decimal(12,6)")
    got = (
        withn.groupBy("user_id")
        .agg(
            F.round(
                -F.sum(term).cast("double") / F.max("n").cast("double"), 6
            ).alias("h")
        )
        .collect()[0]["h"]
    )
    assert abs(got - math.log(4)) < 2e-6


def _daily_cents(sf_dir):
    import pandas as pd

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    orders["day"] = orders["o_orderdate"].dt.normalize()
    orders["cents"] = (
        (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    )
    return orders.groupby("day")["cents"].sum().reset_index()


def test_mann_kendall_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_mann_kendall_seasonal,
    )

    row = q_mann_kendall_seasonal(spark, "/root/testdata/sf0.001").collect()[0]
    daily = _daily_cents("/root/testdata/sf0.001")
    daily["m"] = daily["day"].dt.month
    s_tot, var18_tot, nd = 0, 0, 0
    for _, g in daily.groupby("m"):
        ys = g.sort_values("day")["cents"].to_list()
        n = len(ys)
        nd += n
        s = sum(
            (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        tt = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        s_tot += s
        var18_tot += n * (n - 1) * (2 * n + 5) - tt
    z = (
        (s_tot - 1) / math.sqrt(var18_tot / 18.0)
        if s_tot > 0
        else (s_tot + 1) / math.sqrt(var18_tot / 18.0)
        if s_tot < 0
        else 0.0
    )
    assert row["n_days"] == nd
    assert row["s_stat"] == s_tot
    assert row["var18"] == var18_tot
    assert abs(row["z"] - z) < 1e-5


def test_theil_sen_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_theil_sen_seasonal,
    )

    row = q_theil_sen_seasonal(spark, "/root/testdata/sf0.001").collect()[0]
    daily = _daily_cents("/root/testdata/sf0.001")
    daily["m"] = daily["day"].dt.month
    epoch = daily["day"].min().normalize()
    import pandas as pd

    daily["di"] = (daily["day"] - pd.Timestamp("1992-01-01")).dt.days
    slopes = []
    for _, g in daily.groupby("m"):
        g = g.sort_values("day")
        ys = g["cents"].to_list()
        ds = g["di"].to_list()
        n = len(ys)
        for i in range(n):
            for j in range(i + 1, n):
                slopes.append(round((ys[j] - ys[i]) / (ds[j] - ds[i]), 6))
    slopes.sort()
    n = len(slopes)
    med = (slopes[(n + 1) // 2 - 1] + slopes[(n + 2) // 2 - 1]) / 2.0
    assert row["n_slopes"] == n
    assert abs(row["median_slope_cents_per_day"] - med) < 1e-6


def test_embedding_dim_stats_matches_numpy(spark):
    import numpy as np
    import pyarrow.parquet as pq

    from music_streaming_etl_spark.plans.stats_queries import (
        q_embedding_dim_stats,
    )

    rows = q_embedding_dim_stats(spark, "/root/testdata/sf0.001").collect()
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    assert len(rows) == mat.shape[1]
    for r in rows:
        col = mat[:, r["dim"]]
        assert r["n_vals"] == len(col)
        assert abs(r["vmin"] - col.min()) < 1e-12
        assert abs(r["vmax"] - col.max()) < 1e-12
        assert abs(r["mean"] - col.mean()) < 2e-6
        assert abs(r["std"] - col.std()) < 2e-6


def test_bootstrap_ci_deterministic_and_sane(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_bootstrap_mean_ci,
    )

    a = q_bootstrap_mean_ci(spark, "/root/testdata/sf0.001").collect()[0]
    b = q_bootstrap_mean_ci(spark, "/root/testdata/sf0.001").collect()[0]
    assert a == b  # md5 coin: rerun-identical
    assert a["n_replicates"] == 100
    # CI brackets the point estimate and is ordered
    assert a["ci_lo"] <= a["point_mean"] <= a["ci_hi"]
    # width sanity: nonzero but < 20% of the mean at n≈1500
    width = a["ci_hi"] - a["ci_lo"]
    assert 0 < width < 0.2 * a["point_mean"]


def test_kaplan_meier_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_kaplan_meier_churn,
    )
    import pandas as pd

    rows = q_kaplan_meier_churn(spark, "/root/testdata/sf0.001").collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    # unit-proof epoch-second truncation (parquet vintage may load as
    # datetime64[us] or [ns])
    ev["s"] = ev["ts"].values.astype("datetime64[s]").astype("int64")
    g = ev.groupby("user_id")["s"].agg(["min", "max"])
    max_s = ev["s"].max()
    lam = [
        ((r["max"] - r["min"]) // 3600, (max_s - r["max"]) > 86400)
        for _, r in g.iterrows()
    ]
    # brute KM
    from collections import Counter

    dcnt = Counter(t for t, ch in lam if ch)
    tcnt = Counter(t for t, _ in lam)
    n = len(lam)
    surv, expect = 1.0, {}
    for t in sorted(tcnt):
        d = dcnt.get(t, 0)
        if d < n:
            surv *= 1.0 - d / n
            expect[t] = (d, n, surv)
        else:
            expect[t] = (d, n, 0.0)
        n -= tcnt[t]
    assert len(rows) == len(expect)
    for r in rows:
        d, nar, s = expect[r["t"]]
        assert r["d"] == d and r["n_at_risk"] == nar, r["t"]
        assert abs(r["survival"] - s) < 5e-5, (r["t"], r["survival"], s)
    # survival is monotone nonincreasing
    vals = [r["survival"] for r in sorted(rows, key=lambda r: r["t"])]
    assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))


def _brute_pmi_top40(docs, cap=None):
    import re
    from collections import Counter
    from itertools import combinations

    sets = [
        sorted(set(re.split(r"\s+", t.strip().lower())))
        for t in docs["text"]
    ]
    n_docs = len(docs)
    if cap is not None:
        df0 = Counter(tok for s in sets for tok in s)
        sets = [
            [tok for _, tok in sorted((df0[t], t) for t in s)[:cap]]
            for s in sets
        ]
    df = Counter(tok for s in sets for tok in s)
    cxy = Counter(p for s in sets for p in combinations(sorted(s), 2))
    return sorted(
        (
            (round(math.log(n_docs * c / (df[a] * df[b])), 6), a, b, c)
            for (a, b), c in cxy.items()
        ),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:40]


def _assert_pmi_rows(rows, scored):
    assert len(rows) == 40
    for r, (pmi, a, b, c) in zip(sorted(rows, key=lambda r: r["rank"]), scored):
        assert (r["token_a"], r["token_b"], r["c_xy"]) == (a, b, c), r["rank"]
        assert abs(r["pmi"] - pmi) < 2e-6


def test_token_pmi_matches_brute_force(spark):
    # the registered form: rarest-K=16 per-doc cap, df/pairs
    # recomputed over the capped sets (VERDICT r3 item 7)
    from music_streaming_etl_spark.plans.stats_queries import q_token_pmi
    import pandas as pd

    rows = q_token_pmi(spark, "/root/testdata/sf0.001").collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    _assert_pmi_rows(rows, _brute_pmi_top40(docs, cap=16))


def test_token_pmi_uncapped_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_token_pmi_uncapped,
    )
    import pandas as pd

    rows = q_token_pmi_uncapped(spark, "/root/testdata/sf0.001").collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    _assert_pmi_rows(rows, _brute_pmi_top40(docs, cap=None))


def test_gains_table_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_gains_table
    import pandas as pd

    rows = q_gains_table(spark, "/root/testdata/sf0.001").collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    ordered = docs.sort_values(
        ["n_chars", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    n = len(ordered)
    q, big = divmod(n, 10)
    sizes = [q + 1] * big + [q] * (10 - big)
    pos_all = int((docs["lang"] == "en").sum())
    i, cum = 0, 0
    assert len(rows) == 10
    for r, size in zip(sorted(rows, key=lambda r: r["decile"]), sizes):
        chunk = ordered.iloc[i : i + size]
        npos = int((chunk["lang"] == "en").sum())
        cum += npos
        i += size
        assert r["n"] == size and r["n_pos"] == npos, r["decile"]
        assert r["cum_pos"] == cum
        assert abs(r["pos_rate"] - npos / size) < 1e-6
        assert abs(r["cum_capture"] - cum / pos_all) < 1e-6
        assert abs(r["lift"] - (npos / size) / (pos_all / n)) < 1e-6


def test_assortativity_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_degree_assortativity,
    )
    import pandas as pd
    from collections import Counter
    from itertools import combinations

    row = q_degree_assortativity(spark, "/root/testdata/sf0.001").collect()[0]
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    baskets = li.groupby("l_orderkey")["l_partkey"].apply(
        lambda s: sorted(set(s))
    )
    edges = {
        (u, v) for parts in baskets for u, v in combinations(parts, 2)
    }
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in edges:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    r = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert row["n_edges"] == len(edges)
    assert abs(row["assortativity"] - r) < 1e-5


def test_quantile_normalization_aligns_groups(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_quantile_normalization,
    )
    import pandas as pd

    rows = q_quantile_normalization(spark, "/root/testdata/sf0.001").collect()
    # brute force: nearest-rank map per group against pooled order stats
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    orders["c"] = (
        (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    )
    pooled = orders.sort_values(["c", "o_orderkey"]).reset_index(drop=True)
    ref = pooled["c"].to_list()
    n_all = len(ref)
    for r in rows:
        g = orders[orders["o_orderpriority"] == r["o_orderpriority"]]
        g = g.sort_values(["c", "o_orderkey"]).reset_index(drop=True)
        n_g = len(g)
        mapped = [
            ref[-(-((i + 1) * n_all) // n_g) - 1] for i in range(n_g)
        ]
        assert r["n"] == n_g
        assert abs(r["mean_raw_cents"] - g["c"].mean()) < 1e-4
        assert abs(
            r["mean_normalized_cents"] - sum(mapped) / n_g
        ) < 1e-4
    # the whole point: normalized means are nearly identical across groups
    norm = [r["mean_normalized_cents"] for r in rows]
    raw = [r["mean_raw_cents"] for r in rows]
    assert (max(norm) - min(norm)) < 0.05 * (max(raw) - min(raw) + 1)


def test_quota_sums_to_budget_and_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_largest_remainder_quota,
    )
    import pandas as pd

    rows = q_largest_remainder_quota(spark, "/root/testdata/sf0.001").collect()
    assert sum(r["quota"] for r in rows) == 10000  # the whole point
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    counts = orders.groupby("o_orderpriority").size().to_dict()
    t = sum(counts.values())
    base = {g: c * 10000 // t for g, c in counts.items()}
    rem = sorted(
        counts, key=lambda g: (-(counts[g] * 10000 % t), g)
    )
    k = 10000 - sum(base.values())
    for g in rem[:k]:
        base[g] += 1
    for r in rows:
        assert r["quota"] == base[r["o_orderpriority"]], r


def test_wilson_ci_contains_p_hat_and_is_ordered(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_wilson_ci

    rows = q_wilson_ci(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ci_lo"] <= r["p_hat"] <= r["ci_hi"] <= 1.0
        # textbook Wilson recomputation
        z, n, p = 1.959964, r["n"], r["x"] / r["n"]
        den = 1.0 + z * z / n
        ctr = p + z * z / (2.0 * n)
        half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n))
        assert abs(r["ci_lo"] - (ctr - half) / den) < 1e-6
        assert abs(r["ci_hi"] - (ctr + half) / den) < 1e-6


def test_audience_overlap_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_audience_overlap,
    )
    import pandas as pd

    rows = q_audience_overlap(spark, "/root/testdata/sf0.001").collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    sets = {
        t: set(g["user_id"]) for t, g in ev.groupby("event_type")
    }
    types = sorted(sets)
    expect = {}
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            both = len(sets[a] & sets[b])
            if both:
                expect[(a, b)] = (
                    len(sets[a]),
                    len(sets[b]),
                    both,
                    both / len(sets[a] | sets[b]),
                )
    assert len(rows) == len(expect)
    for r in rows:
        ua, ub, both, j = expect[(r["type_a"], r["type_b"])]
        assert (r["users_a"], r["users_b"], r["users_both"]) == (ua, ub, both)
        assert abs(r["jaccard"] - j) < 1e-6


def test_spearman_matches_textbook_formula(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_spearman_correlation,
    )
    import pandas as pd

    row = q_spearman_correlation(spark, "/root/testdata/sf0.001").collect()[0]
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    x = (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    y = (
        orders["o_orderdate"].dt.normalize()
        - pd.Timestamp("1992-01-01")
    ).dt.days
    # pandas .corr(method="spearman") = Pearson on average ranks
    rho = x.rank().corr(y.rank())
    assert row["n_rows"] == len(orders)
    assert abs(row["spearman_rho"] - rho) < 1e-6


def test_pvm_bridge_reconciles(spark):
    """price + volume effects reconcile to the matched-part revenue
    delta within the micro-unit quantization budget, and the identity
    price+volume == delta holds exactly per part pre-quantization."""
    from music_streaming_etl_spark.plans.stats_queries import (
        q_price_volume_mix,
    )

    row = q_price_volume_mix(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_matched"] > 0
    # per-part identity: (rev1 - p0*q1) + p0*(q1-q0) = rev1 - rev0;
    # summed, the two effects must reconcile to delta_matched within
    # n_matched floor-quantization steps (each term loses < 1e-6)
    recon = row["price_effect"] + row["volume_effect"]
    assert abs(recon - row["delta_matched"]) < 2e-6 * row["n_matched"] + 1e-4


def test_abc_invariants(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_abc_classification,
    )
    import pandas as pd

    rows = {
        r["abc_class"]: r
        for r in q_abc_classification(spark, "/root/testdata/sf0.001").collect()
    }
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    li["c"] = (
        (li["l_extendedprice"].round(2) * 100).round().astype("int64")
    )
    per = li.groupby("l_partkey")["c"].sum()
    assert sum(r["n_parts"] for r in rows.values()) == len(per)
    assert sum(r["revenue_cents"] for r in rows.values()) == int(per.sum())
    # brute-force classification
    t = int(per.sum())
    cum, classes = 0, {"A": 0, "B": 0, "C": 0}
    for key, c in sorted(
        per.items(), key=lambda kv: (-kv[1], kv[0])
    ):
        cum += int(c)
        cls = "A" if 5 * cum <= 4 * t else "B" if 20 * cum <= 19 * t else "C"
        classes[cls] += 1
    for cls, n in classes.items():
        got = rows[cls]["n_parts"] if cls in rows else 0
        assert got == n, cls
    # A captures the most revenue per part (the point of the analysis)
    if "A" in rows and "C" in rows:
        a = rows["A"]["revenue_cents"] / rows["A"]["n_parts"]
        c = rows["C"]["revenue_cents"] / rows["C"]["n_parts"]
        assert a > c


def test_seasonal_naive_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_seasonal_naive_backtest,
    )
    import pandas as pd

    row = q_seasonal_naive_backtest(spark, "/root/testdata/sf0.001").collect()[0]
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    orders["m"] = orders["o_orderdate"].dt.to_period("M")
    orders["cents"] = (
        (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    )
    monthly = orders.groupby("m")["cents"].sum()
    pairs = [
        (int(monthly[m]), int(monthly[m - 12]))
        for m in monthly.index
        if (m - 12) in monthly.index
    ]
    assert row["n_months"] == len(pairs)
    apes = [round(abs(a - f) / a, 6) for a, f in pairs]
    mape = sum(apes) / len(apes)
    bias = sum(a - f for a, f in pairs) / sum(a for a, _ in pairs)
    assert abs(row["mape"] - mape) < 2e-6
    assert abs(row["bias"] - bias) < 1e-6


def test_oov_rate_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_oov_rate
    import pandas as pd
    import re
    from collections import Counter

    rows = q_oov_rate(spark, "/root/testdata/sf0.001").collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    toks = {
        r.doc_id: re.split(r"\s+", r.text.strip().lower())
        for r in docs.itertuples()
    }
    freq = Counter(t for ts in toks.values() for t in ts)
    vocab = {
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    }
    by_lang = {}
    for r in docs.itertuples():
        ts = toks[r.doc_id]
        oov = sum(1 for t in ts if t not in vocab)
        d = by_lang.setdefault(r.lang, [0, 0, 0, 0.0])
        d[0] += 1
        d[1] += oov
        d[2] += len(ts)
        d[3] += round(oov / len(ts), 6)
    assert len(rows) == len(by_lang)
    for r in rows:
        n, oov, tot, rates = by_lang[r["lang"]]
        assert (r["n_docs"], r["oov_tokens"], r["total_tokens"]) == (
            n,
            oov,
            tot,
        )
        assert abs(r["mean_oov_rate"] - rates / n) < 2e-6


def test_hard_negative_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_hard_negative_centroids,
    )
    import numpy as np
    import pyarrow.parquet as pq

    rows = q_hard_negative_centroids(spark, "/root/testdata/sf0.001").collect()
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(t.column("label").to_pylist())
    vec_ids = np.array(t.column("vec_id").to_pylist())
    # mirror the quantization pipeline (r7 form): centroid mean
    # FLOOR-gridded to 6dp (functions/quantize semantics), vectors
    # cast to decimal(12,6)
    q = np.round(mat, 6)
    cents = {}
    for lab in np.unique(labels):
        m = mat[labels == lab].astype(np.float64)
        # decimal(38,6) sum of quantized elements / n, floor-gridded
        cents[lab] = np.floor(
            np.round(m, 6).sum(axis=0) / len(m) * 1e6
        ) / 1e6
    expect = {}
    for i, vid in enumerate(vec_ids):
        own = labels[i]
        best = None
        for lab, c in cents.items():
            if lab == own:
                continue
            # r7: raw cosine (the query emits the unrounded quotient)
            cos = float(q[i] @ c) / (
                math.sqrt(float(q[i] @ q[i])) * math.sqrt(float(c @ c))
            )
            k = (cos, -lab)
            if best is None or k > best[0]:
                best = (k, lab, cos)
        expect[int(vid)] = (int(own), int(best[1]), best[2])
    ordered = sorted(
        expect.items(), key=lambda kv: (-kv[1][2], kv[0])
    )[:20]
    assert len(rows) == 20
    for r, (vid, (own, neg, cos)) in zip(
        sorted(rows, key=lambda r: r["rank"]), ordered
    ):
        assert r["vec_id"] == vid and r["label"] == own, r["rank"]
        assert r["hard_negative_label"] == neg
        assert abs(r["cosine"] - cos) < 2e-6


def test_weighted_median_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_weighted_median_price,
    )
    import pandas as pd

    row = q_weighted_median_price(spark, "/root/testdata/sf0.001").collect()[0]
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    orders["cents"] = (
        (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    )
    c = sorted(orders.groupby("o_custkey")["cents"].sum().to_list())
    t = sum(c)
    cum = 0
    for v in c:
        cum += v
        if 2 * cum >= t:
            break
    assert row["weighted_median_cents"] == v
    assert row["total_cents"] == t
    # weighted median sits above the plain median when revenue skews up
    import statistics

    assert row["weighted_median_cents"] >= statistics.median(c)


def test_business_days_matches_python_calendar(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_business_days_to_ship,
    )
    import datetime as dtmod
    import pandas as pd

    rows = q_business_days_to_ship(spark, "/root/testdata/sf0.001").collect()
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    j = li.merge(
        orders[["o_orderkey", "o_orderpriority", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )

    def bdays(a, b):
        # literal weekday walk — the independent reference; the
        # synthetic corpus has ship dates on BOTH sides of the order
        # date, and the closed form is sign-symmetric
        if b < a:
            return -bdays(b, a)
        # weekdays in the start-inclusive half-open [a, b) — the
        # interval W(b) - W(a) counts
        n, d = 0, a.date()
        while d < b.date():
            if d.weekday() < 5:
                n += 1
            d += dtmod.timedelta(days=1)
        return n

    # closed form must equal the walk on a sample (cheap) ...
    sample = j.head(60)
    anchor = dtmod.date(1992, 1, 6)

    def W(d):
        n = (d - anchor).days
        return (n // 7) * 5 + min(n % 7, 5)

    for r in sample.itertuples():
        walked = bdays(r.o_orderdate, r.l_shipdate)
        closed = W(r.l_shipdate.date()) - W(r.o_orderdate.date())
        assert walked == closed, (r.o_orderdate, r.l_shipdate)
    # ... and the per-priority aggregate must match the closed form
    j["bd"] = [
        W(s.date()) - W(o.date())
        for o, s in zip(j["o_orderdate"], j["l_shipdate"])
    ]
    agg = j.groupby("o_orderpriority")["bd"].agg(["count", "mean", "max"])
    for r in rows:
        g = agg.loc[r["o_orderpriority"]]
        assert r["n_lines"] == g["count"]
        assert abs(r["avg_business_days"] - g["mean"]) < 1e-5
        assert r["max_business_days"] == g["max"]


def test_nearest_warehouse_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        _WAREHOUSES,
        q_nearest_warehouse,
    )
    import hashlib
    import pandas as pd

    rows = q_nearest_warehouse(spark, "/root/testdata/sf0.001").collect()
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 10000

    def hav(la1, lo1, la2, lo2):
        dlat = math.radians(la2 - la1) / 2.0
        dlon = math.radians(lo2 - lo1) / 2.0
        a = (
            math.sin(dlat) * math.sin(dlat)
            + math.cos(math.radians(la1))
            * math.cos(math.radians(la2))
            * math.sin(dlon)
            * math.sin(dlon)
        )
        return round(2.0 * 6371.0 * math.asin(math.sqrt(a)), 6)

    counts, sums = {}, {}
    for ck in sorted(set(orders["o_custkey"])):
        la = bucket(str(ck)) / 10000.0 * 180.0 - 90.0
        lo = bucket(f"lon:{ck}") / 10000.0 * 360.0 - 180.0
        best = min(
            ((hav(la, lo, wla, wlo), wid) for wid, wla, wlo in _WAREHOUSES)
        )
        counts[best[1]] = counts.get(best[1], 0) + 1
        sums[best[1]] = sums.get(best[1], 0.0) + round(best[0], 6)
    for r in rows:
        assert r["n_customers"] == counts[r["warehouse_id"]]
        assert (
            abs(r["avg_dist_km"] - sums[r["warehouse_id"]] / counts[r["warehouse_id"]])
            < 1e-5
        )
    assert sum(counts.values()) == sum(r["n_customers"] for r in rows)


def test_sprt_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_sprt_decision
    import pandas as pd

    row = q_sprt_decision(spark, "/root/testdata/sf0.001").collect()[0]
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.sort_values(["ts", "event_id"]).reset_index(drop=True)
    s = 0
    hit = None
    for n, v in enumerate(ev["value"], 1):
        s += 1 if v >= 50.0 else 0
        d = 2 * s - n
        if abs(d) >= 15:
            hit = (n, d, ev["ts"].iloc[n - 1])
            break
    if hit is None:
        assert row["decision"] == "undecided"
    else:
        n, d, ts = hit
        assert row["n_at_decision"] == n
        assert row["decision"] == (
            "accept_h1" if d >= 15 else "accept_h0"
        )
        assert abs(
            row["llr_at_decision"] - d * math.log(11.0 / 9.0)
        ) < 1e-5


def test_shapley_axioms_and_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        _CHANNELS,
        q_shapley_attribution,
    )
    import pandas as pd

    rows = q_shapley_attribution(spark, "/root/testdata/sf0.001").collect()
    got = {r["channel"]: r["shapley_value"] for r in rows}
    assert set(got) == set(_CHANNELS)
    # brute force: rebuild v(S) and the Shapley sum in pure Python
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    first_p = (
        ev[ev["event_type"] == "purchase"].groupby("user_id")["ts"].min()
    )
    stats = {}
    for uid, g in ev.groupby("user_id"):
        p_ts = first_p.get(uid)
        pre = g[
            (g["event_type"] != "purchase")
            & (True if p_ts is None else g["ts"] < p_ts)
        ]
        if len(pre) == 0 and p_ts is None:
            continue  # no exposure row and no purchase: not in ex
        key = ",".join(sorted(set(pre["event_type"])))
        n, c = stats.get(key, (0, 0))
        stats[key] = (n + 1, c + (1 if p_ts is not None else 0))
    v = {k: round(c / n, 6) for k, (n, c) in stats.items()}
    k = len(_CHANNELS)
    import math as m

    for i, ch in enumerate(_CHANNELS):
        phi = 0.0
        for mask in range(2**k):
            if (mask >> i) & 1:
                continue
            s = [c for j, c in enumerate(_CHANNELS) if (mask >> j) & 1]
            w = {0: 0.25, 1: 0.083333, 2: 0.083333, 3: 0.25}[len(s)]
            vs = v.get(",".join(s), 0.0)
            vsi = v.get(",".join(sorted(s + [ch])), 0.0)
            phi += round(w * (vsi - vs), 6)
        assert abs(got[ch] - round(phi, 6)) < 2e-6, ch


def test_npv_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_npv_revenue_stream,
    )
    import pandas as pd

    row = q_npv_revenue_stream(spark, "/root/testdata/sf0.001").collect()[0]
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    orders["m"] = orders["o_orderdate"].dt.to_period("M")
    orders["cents"] = (
        (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    )
    monthly = orders.groupby("m")["cents"].sum()
    m0 = monthly.index.min()
    npv = sum(
        round(float(c) * 1.01 ** (-(m - m0).n), 6)
        for m, c in monthly.items()
    )
    assert row["n_months"] == len(monthly)
    assert row["undiscounted_cents"] == int(monthly.sum())
    assert row["npv_cents"] == math.floor(npv)
    assert row["npv_cents"] < row["undiscounted_cents"]


def test_silhouette_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_centroid_silhouette,
    )
    import numpy as np
    import pyarrow.parquet as pq

    rows = q_centroid_silhouette(spark, "/root/testdata/sf0.001").collect()
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(t.column("label").to_pylist())
    q = np.round(mat, 6)
    cents = {
        int(lab): np.round(
            np.round(mat[labels == lab], 6).sum(axis=0)
            / (labels == lab).sum(),
            6,
        )
        for lab in np.unique(labels)
    }
    by_label = {}
    for i in range(len(mat)):
        own = int(labels[i])
        dists = {
            lab: math.sqrt(float(((q[i] - c) ** 2).sum()))
            for lab, c in cents.items()
        }
        a = dists[own]
        b = min(d for lab, d in dists.items() if lab != own)
        s = round((b - a) / max(a, b), 6)
        n, tot = by_label.get(own, (0, 0.0))
        by_label[own] = (n + 1, tot + s)
    assert len(rows) == len(by_label)
    for r in rows:
        n, tot = by_label[r["label"]]
        assert r["n_vectors"] == n
        assert abs(r["mean_silhouette"] - tot / n) < 2e-6
    # silhouette is bounded; this synthetic corpus's labels are
    # near-random so values hover just below zero — the METRIC is
    # what's verified (the brute-force match above), not the corpus
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_stratified_ate_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_stratified_ate,
    )
    import pandas as pd

    rows = q_stratified_ate(spark, "/root/testdata/sf0.001").collect()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    g = ev.groupby("user_id")["event_type"]
    pu = pd.DataFrame(
        {
            "views": g.apply(lambda s: (s == "view").sum()),
            "t": g.apply(lambda s: int((s == "click").any())),
            "y": g.apply(lambda s: int((s == "purchase").any())),
        }
    )
    pu["stratum"] = pu["views"].map(
        lambda v: "a_low_views"
        if v <= 9
        else "b_mid_views"
        if v <= 13
        else "c_high_views"
    )
    n_users = len(pu)
    for r in rows:
        cell = pu[pu["stratum"] == r["stratum"]]
        t1, t0 = cell[cell["t"] == 1], cell[cell["t"] == 0]
        assert r["n_treated"] == len(t1) and r["n_control"] == len(t0)
        if len(t1) and len(t0):
            diff = t1["y"].mean() - t0["y"].mean()
            w = len(cell) / n_users
            assert abs(r["weighted_diff"] - w * diff) < 2e-6
        else:
            assert r["weighted_diff"] is None


def test_did_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_difference_in_differences,
    )
    import pandas as pd

    row = q_difference_in_differences(spark, "/root/testdata/sf0.001").collect()[0]
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["s"] = ev["ts"].values.astype("datetime64[s]").astype("int64")
    lo, hi = ev["s"].min(), ev["s"].max()
    mid = lo + (hi - lo) // 2
    ev["period"] = (ev["s"] > mid).map({False: "pre", True: "post"})
    signup = ev[ev["event_type"] == "signup"]
    treated = set(signup.loc[signup["s"] <= mid, "user_id"])
    ever = set(signup["user_id"])
    cells = {}
    for (uid, period), g in ev.groupby(["user_id", "period"]):
        if uid in treated:
            grp = "treated"
        elif uid in ever:
            continue
        else:
            grp = "control"
        n, tot = cells.get((grp, period), (0, 0))
        cells[(grp, period)] = (n + 1, tot + len(g))
    mean = {
        k: tot / n for k, (n, tot) in cells.items()
    }

    def m(k):
        return mean.get(k)

    # at tiny SFs every user may have signed up -> the control group
    # is EMPTY; the estimator must surface NULL, not invent a number
    if any(
        m(k) is None
        for k in [
            ("treated", "pre"),
            ("treated", "post"),
            ("control", "pre"),
            ("control", "post"),
        ]
    ):
        assert row["did_estimate"] is None
    else:
        did = (m(("treated", "post")) - m(("treated", "pre"))) - (
            m(("control", "post")) - m(("control", "pre"))
        )
        assert abs(row["did_estimate"] - did) < 2e-6
    for col, key in [
        ("treated_pre_mean", ("treated", "pre")),
        ("control_post_mean", ("control", "post")),
    ]:
        if m(key) is None:
            assert row[col] is None
        else:
            assert abs(row[col] - m(key)) < 2e-6


def test_conformal_coverage_guarantee(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_conformal_interval,
    )

    rows = q_conformal_interval(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        # split-conformal theorem: calibration coverage >= ceil((n+1)α̃)/n
        # >= 0.9 minus discreteness of 1/n
        assert r["calib_coverage"] >= 0.9 - 1.0 / r["n_calib"] - 1e-9, r
        assert r["halfwidth_cents"] > 0
        assert r["n_train"] > 0 and r["n_calib"] > 0
    # determinism: md5 split -> identical rerun
    again = q_conformal_interval(spark, "/root/testdata/sf0.001").collect()
    assert rows == again


def test_conformal_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_conformal_interval,
    )
    import hashlib
    import pandas as pd

    rows = q_conformal_interval(spark, "/root/testdata/sf0.001").collect()
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    orders["c"] = (
        (orders["o_totalprice"].round(2) * 100).round().astype("int64")
    )
    orders["train"] = orders["o_orderkey"].map(
        lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
        % 10000
        < 5000
    )
    for r in rows:
        g = orders[orders["o_orderpriority"] == r["o_orderpriority"]]
        tr, ca = g[g["train"]], g[~g["train"]]
        mu = tr["c"].mean()
        assert r["n_train"] == len(tr) and r["n_calib"] == len(ca)
        assert abs(r["mu_cents"] - mu) < 1e-4
        res = sorted(
            (abs(int(c) * 1000000 - math.floor(mu * 1000000.0)), k)
            for c, k in zip(ca["c"], ca["o_orderkey"])
        )
        k = min(math.ceil((len(ca) + 1) * 0.9), len(ca))
        q_u = res[k - 1][0]
        assert abs(r["halfwidth_cents"] - q_u / 1000000.0) < 1e-6


def test_mmd_matches_numpy(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_embedding_mmd
    import numpy as np
    import pyarrow.parquet as pq

    row = q_embedding_mmd(spark, "/root/testdata/sf0.001").collect()[0]
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    mat = np.round(
        np.array(t.column("embedding").to_pylist(), dtype=np.float64), 6
    )
    labels = np.array(t.column("label").to_pylist())
    ma = mat[labels < 5].mean(axis=0)
    mb = mat[labels >= 5].mean(axis=0)
    gaps = np.round(ma - mb, 6)
    mmd2 = float((gaps * gaps).sum())
    assert row["n_dims"] == mat.shape[1]
    assert abs(row["mmd2"] - mmd2) < 2e-6
    assert abs(row["mean_shift_l2"] - math.sqrt(mmd2)) < 2e-6
    # same-distribution halves: the shift is tiny but nonzero
    assert 0 < row["mmd2"] < 0.01


def test_partial_correlation_matches_numpy(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_partial_correlation,
    )
    import datetime as dtmod
    import numpy as np
    import pandas as pd

    row = q_partial_correlation(spark, "/root/testdata/sf0.001").collect()[0]
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    j = li.merge(
        orders[["o_orderkey", "o_totalprice", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    anchor = dtmod.date(1992, 1, 6)

    def W(d):
        n = (d - anchor).days
        return (n // 7) * 5 + min(n % 7, 5)

    x = (j["o_totalprice"].round(2) * 100).round().astype("int64").to_numpy(float)
    y = np.array(
        [
            W(s.date()) - W(o.date())
            for o, s in zip(j["o_orderdate"], j["l_shipdate"])
        ],
        dtype=float,
    )
    z = np.array(
        [(o.date() - anchor).days for o in j["o_orderdate"]], dtype=float
    )
    rxy = np.corrcoef(x, y)[0, 1]
    rxz = np.corrcoef(x, z)[0, 1]
    ryz = np.corrcoef(y, z)[0, 1]
    partial = (rxy - rxz * ryz) / math.sqrt(
        (1.0 - rxz * rxz) * (1.0 - ryz * ryz)
    )
    assert row["n_lines"] == len(j)
    assert abs(row["r_value_delay"] - rxy) < 1e-5
    assert abs(row["partial_r"] - partial) < 1e-5
    assert -1.0 <= row["partial_r"] <= 1.0


def test_seasonality_strength_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_seasonality_strength,
    )
    import pandas as pd

    row = q_seasonality_strength(spark, "/root/testdata/sf0.001").collect()[0]
    daily = _daily_cents("/root/testdata/sf0.001").sort_values("day")
    c = daily["cents"].to_list()
    days = daily["day"].to_list()
    det = []
    for i in range(3, len(c) - 3):
        s7 = sum(c[i - 3 : i + 4])
        # exact ×7 residual (r7 carrier fix — see q_seasonality_strength)
        d = c[i] * 7 - s7
        det.append((days[i].weekday(), d))
    from collections import defaultdict

    by_dow = defaultdict(list)
    for dow, d in det:
        by_dow[dow].append(d)
    s_dow = {
        k: math.floor(sum(v) / len(v)) for k, v in by_dow.items()
    }
    ds = [d for _, d in det]
    rs = [d - s_dow[dow] for dow, d in det]

    def var(a):
        m = sum(a) / len(a)
        return sum(x * x for x in a) / len(a) - m * m

    strength = max(0.0, 1.0 - var(rs) / var(ds))
    assert row["n_days"] == len(det)
    assert abs(row["weekly_strength"] - strength) < 2e-6
    assert 0.0 <= row["weekly_strength"] <= 1.0


def test_mcnemar_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_mcnemar_test
    import pandas as pd

    row = q_mcnemar_test(spark, "/root/testdata/sf0.001").collect()[0]
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    g = ev.groupby("user_id")["event_type"]
    x1 = g.apply(lambda s: int((s == "view").any()))
    x2 = g.apply(lambda s: int((s == "click").any()))
    b = int(((x1 == 1) & (x2 == 0)).sum())
    c = int(((x1 == 0) & (x2 == 1)).sum())
    assert (row["view_only"], row["click_only"]) == (b, c)
    if b + c:
        assert abs(row["chi2"] - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-6
    else:
        assert row["chi2"] is None


def test_kappa_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_cohens_kappa
    import pandas as pd
    import re

    row = q_cohens_kappa(spark, "/root/testdata/sf0.001").collect()[0]
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    ra = (docs["n_chars"] >= 300).astype(int)
    rb = docs["text"].map(
        lambda t: int(len(re.split(r"\s+", t.strip().lower())) >= 50)
    )
    a = int(((ra == 1) & (rb == 1)).sum())
    b = int(((ra == 1) & (rb == 0)).sum())
    c = int(((ra == 0) & (rb == 1)).sum())
    d = int(((ra == 0) & (rb == 0)).sum())
    n = a + b + c + d
    po = (a + d) / n
    pe = ((a + b) * (a + c) + (c + d) * (b + d)) / (n * n)
    kappa = (po - pe) / (1.0 - pe)
    assert (row["a"], row["b"], row["c"], row["d"]) == (a, b, c, d)
    assert abs(row["kappa"] - kappa) < 1e-6
    assert -1.0 <= row["kappa"] <= 1.0


def test_eb_shrinkage_pulls_toward_prior_mean(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_eb_shrunk_rates,
    )

    rows = q_eb_shrunk_rates(spark, "/root/testdata/sf0.001").collect()
    assert rows
    m = sum(r["raw_rate"] for r in rows) / len(rows)
    for r in rows:
        raw, shrunk = r["raw_rate"], r["shrunk_rate"]
        # shrinkage: strictly between the raw rate and the prior mean
        lo, hi = sorted((raw, m))
        assert lo - 1e-9 <= shrunk <= hi + 1e-9, r
        # with large n the pull is small
        assert abs(shrunk - raw) < abs(raw - m) + 1e-9


def test_suggest_constraints_rules_hold_on_source(spark):
    """Every suggested rule must actually HOLD on the data it was
    derived from (the deequ suggestion contract), and the numeric
    facts must match pandas."""
    from music_streaming_etl_spark.plans.stats_queries import (
        q_suggest_constraints,
    )
    import pandas as pd

    rows = q_suggest_constraints(spark, "/root/testdata/sf0.001").collect()
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    assert rows
    for r in rows:
        col = orders[r["column"]]
        if r["rule"] == "NOT_NULL":
            assert col.notna().all(), r
        elif r["rule"] == "UNIQUE":
            assert col.is_unique, r
        elif r["rule"] == "RANGE":
            lo, hi = r["detail"].strip("[]").split(", ")
            assert float(lo) <= col.min() + 1e-9, r
            assert col.max() <= float(hi) + 1e-9, r
        elif r["rule"] == "IS_IN":
            allowed = set(r["detail"].split(","))
            assert set(col.unique()) <= allowed, r
    # the key column must have been flagged unique + not-null
    got = {(r["column"], r["rule"]) for r in rows}
    assert ("o_orderkey", "UNIQUE") in got
    assert ("o_orderkey", "NOT_NULL") in got
    assert ("o_orderpriority", "IS_IN") in got


def test_anova_matches_textbook_formula(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_anova_oneway
    import pandas as pd

    row = q_anova_oneway(spark, "/root/testdata/sf0.001").collect()[0]
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    orders["p"] = orders["o_totalprice"].round(2)
    groups = [
        g["p"].to_numpy() for _, g in orders.groupby("o_orderpriority")
    ]
    n = sum(len(g) for g in groups)
    k = len(groups)
    grand = sum(g.sum() for g in groups) / n
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row["n_groups"] == k and row["n_rows"] == n
    # integer-dollars² quantization: within k units of the float value
    assert abs(float(row["ss_between_d2"]) - ssb) < k + 1
    assert abs(float(row["ss_within_d2"]) - ssw) < k + 1
    assert abs(float(row["f_stat_micro"]) / 1e6 - f) < 1e-4


def test_floor_sat_safe_no_silent_saturation(spark):
    """Pin the trap `_floor_sat_safe` exists for: Spark's
    floor(DOUBLE) returns BIGINT and silently clamps to Long.MAX /
    Long.MIN for |arg| >= 2^63 — no ANSI error — while DuckDB's floor
    stays DOUBLE, so a plain floor silently diverges across engines
    at exactly the magnitude the anova 1000x probe measured
    (S_g^2/n_g ~ 1.8e19 at 150M orders). The helper must return the
    true value at every magnitude and still floor below 2^53."""
    import decimal

    from pyspark.sql import functions as F

    from music_streaming_etl_spark.plans.stats_queries import (
        _floor_sat_safe,
    )

    big = 1.8e19  # > 2^63 ~ 9.22e18; integral as an IEEE double
    df = spark.createDataFrame(
        [(big,), (-big,), (10.7,), (-10.7,)], "q double"
    )
    rows = df.select(
        F.floor("q").alias("plain"),
        _floor_sat_safe(F.col("q"), "decimal(38,0)").alias("safe"),
    ).collect()
    long_max, long_min = (1 << 63) - 1, -(1 << 63)
    got = {(r["plain"], r["safe"]) for r in rows}
    # the documented trap: plain floor clamps silently
    assert (long_max, decimal.Decimal(int(big))) in got
    assert (long_min, decimal.Decimal(int(-big))) in got
    # below 2^53 the helper is an ordinary floor
    assert (10, decimal.Decimal(10)) in got
    assert (-11, decimal.Decimal(-11)) in got


def test_keyness_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_keyness_llr
    import pandas as pd
    import re
    from collections import Counter

    rows = q_keyness_llr(spark, "/root/testdata/sf0.001").collect()
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    ca, cb = Counter(), Counter()
    for r in docs.itertuples():
        toks = re.split(r"\s+", r.text.strip().lower())
        (ca if r.lang == "en" else cb).update(toks)
    na, nb = sum(ca.values()), sum(cb.values())
    scored = []
    for tok in set(ca) | set(cb):
        a, b = ca.get(tok, 0), cb.get(tok, 0)
        ea = na * (a + b) / (na + nb)
        eb = nb * (a + b) / (na + nb)
        ll = 2.0 * (
            (a * math.log(a / ea) if a > 0 else 0.0)
            + (b * math.log(b / eb) if b > 0 else 0.0)
        )
        signed = ll if (a / na) >= (b / nb) else -ll
        scored.append((round(signed, 6), tok, a, b))
    scored.sort(key=lambda x: (-x[0], x[1]))
    assert len(rows) == 20
    for r, (g2, tok, a, b) in zip(
        sorted(rows, key=lambda r: r["rank"]), scored[:20]
    ):
        assert (r["token"], r["a"], r["b"]) == (tok, a, b), r["rank"]
        assert abs(r["signed_g2"] - g2) < 2e-6


def test_rmst_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import (
        q_kaplan_meier_churn,
        q_survival_rmst,
    )

    row = q_survival_rmst(spark, "/root/testdata/sf0.001").collect()[0]
    curve = sorted(
        q_kaplan_meier_churn(spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r["t"],
    )
    tau = 720
    # step integral from the (already-verified) KM curve, S=1 before t0
    area = min(curve[0]["t"], tau)
    for i, r in enumerate(curve):
        if r["t"] >= tau:
            break
        t_next = curve[i + 1]["t"] if i + 1 < len(curve) else tau
        area += round(r["survival"], 6) * (min(t_next, tau) - r["t"])
    assert row["tau_hours"] == tau
    assert abs(row["rmst_hours"] - area) < 1e-4
    # RMST is bounded by the horizon and below by the final-S floor
    assert 0 < row["rmst_hours"] <= tau


def test_rank_sum_single_row_emits_null_not_nan(spark):
    # ADVICE r3: with exactly one total row the tie term is 0/0 = NaN
    # and nullif(var, 0.0) does not catch NaN — z must still be the
    # documented NULL (one group empty), never NaN.
    for pos, neg in ([(5,), ()], [(), (5,)]):
        row = _run(spark, list(pos), list(neg), parts=1)
        assert row["z"] is None, row
        assert row["auc"] is None, row


def test_suggest_constraints_adaptive_matches_exact(spark):
    # VERDICT r3 item 6: the approx-first/exact-verify default must be
    # bit-identical to the exact single-pass form — candidate pruning
    # only skips columns that provably fail the exact predicate.
    from music_streaming_etl_spark.plans.stats_queries import (
        q_suggest_constraints,
        q_suggest_constraints_exact,
    )

    sf = "/root/testdata/sf0.001"
    a = [tuple(r) for r in q_suggest_constraints(spark, sf).collect()]
    e = [tuple(r) for r in q_suggest_constraints_exact(spark, sf).collect()]
    assert a == e and len(a) > 0
