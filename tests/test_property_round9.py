"""Round-5 brute-force property twins for the ROUND-6 driver-window
tail (backlog positions 51-65): the nine decision-batch keys re-derived
independently in pure Python / pandas from the same parquet and
compared cell-exact (ints exact; floats within 2e-6 of the 6dp round).
The DuckDB oracle can mirror a shared mistake; these share no code
with either engine's SQL. mcnemar_test / cohens_kappa /
eb_shrunk_rates already have twins in test_property_round8."""

from __future__ import annotations

import json
import math
from collections import Counter, defaultdict

import pandas as pd

SF = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    # mirrors CAST(price AS DECIMAL(18,2)) * 100 on exact-2dp inputs
    return int(round(x * 100))


def _close(a, b, tol=2e-6) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return abs(a - b) <= tol


def _orders() -> pd.DataFrame:
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["day"] = pd.to_datetime(o["o_orderdate"]).dt.date
    o["cents"] = [_cents(p) for p in o["o_totalprice"]]
    return o


def test_welch_t_test_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.decision_queries import (
        q_welch_t_test,
    )

    o = _orders()
    g = {}
    for pri, pos in (("1-URGENT", True), ("5-LOW", False)):
        v = o.loc[o["o_orderpriority"] == pri, "cents"]
        g[pos] = (len(v), int(v.sum()), int((v.astype(object) ** 2).sum()))
    (n1, s1, q1), (n2, s2, q2) = g[True], g[False]
    m1, m2 = s1 / n1, s2 / n2
    v1 = (q1 - s1 * m1) / (n1 - 1)
    v2 = (q2 - s2 * m2) / (n2 - 1)
    se1, se2 = v1 / n1, v2 / n2
    se = se1 + se2
    r = q_welch_t_test(spark, SF).collect()[0]
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert _close(r["mean_diff_cents"], m1 - m2, 1e-4)  # cents scale
    assert _close(r["t_stat"], (m1 - m2) / math.sqrt(se))
    assert _close(
        r["df_welch"],
        (se * se) / (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1)),
        1e-4,  # df is O(1e3); 6dp round + ulp at that magnitude
    )


def test_max_drawdown_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.decision_queries import (
        q_max_drawdown,
    )

    o = _orders()
    daily: dict = defaultdict(lambda: defaultdict(int))
    for pri, day, c in zip(o["o_orderpriority"], o["day"], o["cents"]):
        daily[pri][day] += c
    want = {}
    for pri, series in daily.items():
        peak, best = 0, None  # (drawdown, day, peak) with tie-break
        first = True
        for day in sorted(series):
            v = series[day]
            peak = v if first else max(peak, v)
            first = False
            dd = peak - v
            if best is None or dd > best[0]:
                best = (dd, day, peak)
        want[pri] = best
    got = {r["o_orderpriority"]: r for r in q_max_drawdown(spark, SF).collect()}
    assert set(got) == set(want)
    for pri, (dd, day, peak) in want.items():
        r = got[pri]
        assert r["trough_day"] == day, pri
        assert r["peak_cents"] == peak and r["max_drawdown_cents"] == dd
        assert _close(r["drawdown_ratio"], dd / peak if peak else None)


def test_rank_biased_overlap_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.decision_queries import (
        q_rank_biased_overlap,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet")
    clicks = ev[ev["event_type"] == "click"]
    days = pd.to_datetime(clicks["ts"]).dt.date
    items = [int(json.loads(p)["k"]) for p in clicks["props"]]
    cut = pd.Timestamp("2024-01-16").date()

    def top20(selector) -> dict[int, int]:
        c = Counter(i for i, d in zip(items, days) if selector(d))
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
        return {item: rk + 1 for rk, (item, _) in enumerate(ranked)}

    a = top20(lambda d: d < cut)
    b = top20(lambda d: d >= cut)
    ms = [max(a[i], b[i]) for i in set(a) & set(b)]
    rbo = 0.0
    for d in range(1, 21):
        ov = sum(1 for m in ms if m <= d)
        term = math.floor(0.9 ** (d - 1) * ov / d * 1e9 + 0.5) / 1e9
        rbo += term
    r = q_rank_biased_overlap(spark, SF).collect()[0]
    assert r["overlap_at_20"] == sum(1 for m in ms if m <= 20)
    assert _close(r["rbo"], rbo * 0.1)


def test_revenue_recognition_allocations_sum_exactly(spark):
    from music_streaming_etl_spark.plans.decision_queries import (
        q_revenue_recognition,
    )

    o = _orders()
    want: dict = defaultdict(int)
    for day, c in zip(o["day"], o["cents"]):
        for off in range(12):
            m = (day.month - 1 + off) % 12 + 1
            y = day.year + (day.month - 1 + off) // 12
            part = c // 12 + (1 if off < c % 12 else 0)
            want[(y, m)] += part
    got = {
        (r["month"].year, r["month"].month): r["recognized_cents"]
        for r in q_revenue_recognition(spark, SF).collect()
    }
    assert got == dict(want)
    # conservation: every order's 12 parts sum to its cents exactly
    assert sum(got.values()) == int(o["cents"].sum()) * 1


def test_item_jaccard_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.decision_queries import (
        q_item_jaccard,
    )

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    merged = li.merge(
        o[["o_orderkey", "o_custkey"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    buyers: dict = defaultdict(set)
    for part, cust in zip(merged["l_partkey"], merged["o_custkey"]):
        buyers[part].add(cust)
    top = sorted(buyers, key=lambda p: (-len(buyers[p]), p))[:50]
    pairs = []
    for i, pa in enumerate(top):
        for pb in top[i + 1 :]:
            lo, hi = min(pa, pb), max(pa, pb)
            inter = len(buyers[lo] & buyers[hi])
            uni = len(buyers[lo] | buyers[hi])
            j6 = math.floor(inter / uni * 1e6 + 0.5) / 1e6
            pairs.append((lo, hi, inter, uni, j6))
    pairs.sort(key=lambda t: (-t[4], t[0], t[1]))
    want = pairs[:25]
    got = [
        (r["pa"], r["pb"], r["inter"], r["uni"], r["jaccard"])
        for r in q_item_jaccard(spark, SF).collect()
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:4] == w[:4]
        assert _close(g[4], w[4])


def test_ucb1_allocation_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.decision_queries import (
        q_ucb1_allocation,
    )

    o = _orders()
    arms = {}
    for pri, grp in o.groupby("o_orderpriority"):
        n = len(grp)
        x = int((grp["o_orderstatus"] == "F").sum())
        arms[pri] = (n, x)
    n_total = sum(n for n, _ in arms.values())
    scored = {
        pri: (
            n,
            x,
            x / n,
            x / n + math.sqrt(2.0 * math.log(n_total) / n),
        )
        for pri, (n, x) in arms.items()
    }
    order = sorted(
        scored,
        key=lambda pri: (
            -(math.floor(scored[pri][3] * 1e6 + 0.5) / 1e6),
            pri,
        ),
    )
    got = {r["arm"]: r for r in q_ucb1_allocation(spark, SF).collect()}
    assert set(got) == set(scored)
    for rank, pri in enumerate(order, 1):
        r = got[pri]
        n, x, mean, score = scored[pri]
        assert (r["n"], r["x"]) == (n, x)
        assert _close(r["mean_reward"], mean)
        assert _close(r["ucb_score"], score)
        assert r["allocation_rank"] == rank


def test_holt_linear_trend_matches_recursion(spark):
    from music_streaming_etl_spark.plans.decision_queries import (
        q_holt_linear_trend,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet")
    days = pd.to_datetime(ev["ts"]).dt.date
    daily: dict = defaultdict(Counter)
    for et, d in zip(ev["event_type"], days):
        daily[et][d] += 1
    got = {r["etype"]: r for r in q_holt_linear_trend(spark, SF).collect()}
    assert set(got) == set(daily)
    for et, series in daily.items():
        seq = [series[d] * 1_000_000 for d in sorted(series)]
        n, level, b = 0, 0, 0
        for ym in seq:
            if n == 0:
                n, level, b = 1, ym, 0
            else:
                n += 1
                nl = math.floor((ym + level + b) / 2.0)
                b = math.floor((3 * (nl - level) + 7 * b) / 10.0)
                level = nl
        r = got[et]
        assert r["n_days"] == n and r["level_micro"] == level
        assert r["trend_micro"] == b
        assert r["forecast_7d_micro"] == level + 7 * b


def test_segment_transition_matrix_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.decision_queries import (
        q_segment_transition_matrix,
    )

    o = _orders()
    seg: dict = {}
    spend: dict = defaultdict(int)
    for cust, day, c in zip(o["o_custkey"], o["day"], o["cents"]):
        spend[(cust, day.year, day.month)] += c
    for (cust, y, m), c in spend.items():
        seg[(cust, y, m)] = (
            "LOW" if c < 200000 else ("MID" if c < 1000000 else "HIGH")
        )
    trans: Counter = Counter()
    for (cust, y, m), s in seg.items():
        nxt = (cust, y + (m == 12), m % 12 + 1)
        if nxt in seg:
            trans[(s, seg[nxt])] += 1
    tot: Counter = Counter()
    for (s_from, _), n in trans.items():
        tot[s_from] += n
    got = {
        (r["seg_from"], r["seg_to"]): r
        for r in q_segment_transition_matrix(spark, SF).collect()
    }
    assert set(got) == set(trans)
    for key, n in trans.items():
        r = got[key]
        assert r["n"] == n
        assert _close(r["p"], n / tot[key[0]])


def test_attribution_position_based_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.decision_queries import (
        q_attribution_position_based,
    )

    ev = pd.read_parquet(f"{SF}/events.parquet")
    ts = pd.to_datetime(ev["ts"])
    purchases = [
        (eid, uid, t)
        for eid, uid, t, et in zip(
            ev["event_id"], ev["user_id"], ts, ev["event_type"]
        )
        if et == "purchase"
    ]
    touches: dict = defaultdict(list)
    for eid, uid, t, et in zip(
        ev["event_id"], ev["user_id"], ts, ev["event_type"]
    ):
        if et in ("click", "view"):
            touches[uid].append((eid, t, et))
    hour = pd.Timedelta(hours=1)
    agg: dict = defaultdict(lambda: [0, 0])  # (channel, pos) -> [bp, n]
    for conv_id, uid, pts in purchases:
        win = sorted(
            (
                (t, eid, ch)
                for eid, t, ch in touches.get(uid, [])
                if pts - hour <= t < pts
            ),
        )
        cnt = len(win)
        for rn, (t, eid, ch) in enumerate(win, 1):
            if cnt == 1:
                bp, pos = 10000, "first"
            elif cnt == 2:
                bp, pos = 5000, "first" if rn == 1 else "last"
            elif rn == 1:
                bp, pos = 4000, "first"
            elif rn == cnt:
                bp, pos = 4000, "last"
            else:
                bp = 2000 // (cnt - 2) + (1 if rn - 2 < 2000 % (cnt - 2) else 0)
                pos = "middle"
            cell = agg[(ch, pos)]
            cell[0] += bp
            cell[1] += 1
    got = {
        (r["channel"], r["position"]): (r["credit_bp"], r["touches"])
        for r in q_attribution_position_based(spark, SF).collect()
    }
    assert got == {k: (v[0], v[1]) for k, v in agg.items()}
    # conservation: attributed conversions carry exactly 10,000 bp each
    n_attributed = len(
        {
            conv_id
            for conv_id, uid, pts in purchases
            if any(
                pts - hour <= t < pts for _, t, _ in touches.get(uid, [])
            )
        }
    )
    assert sum(v[0] for v in agg.values()) == 10000 * n_attributed


# --------------------------------------------------------------------------
# Stats-tail twins (anova / keyness / ivm / q1-piped / rmst)
# --------------------------------------------------------------------------

import re
from decimal import Decimal


def _toks(text: str) -> list[str]:
    # mirrors tokens(): split(lower(trim(text)), '\s+')
    return re.split(r"\s+", text.strip().lower())


def _r6(x: float) -> float:
    # ROUND half-away-from-zero at 6dp, the engines' emission rule
    s = -1.0 if x < 0 else 1.0
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6


def test_anova_oneway_matches_brute_force(spark):
    """EXACT integer twin of the round-8 IEEE-free anova form: Python
    ints are arbitrary-precision and ``//`` is exact, so every emitted
    cell must match to the unit — no tolerances anywhere."""
    from music_streaming_etl_spark.plans.stats_queries import q_anova_oneway

    o = pd.read_parquet(f"{SF}/orders.parquet")
    g = {}
    for pri, grp in o.groupby("o_orderpriority"):
        c = [
            int(Decimal(str(round(x, 2))) * 100)
            for x in grp["o_totalprice"]
        ]
        g[pri] = (len(c), sum(c), sum(x * x for x in c))
    k = len(g)
    n_all = sum(v[0] for v in g.values())
    s_all = sum(v[1] for v in g.values())
    q_all = sum(v[2] for v in g.values())
    sg = sum(s * s // (n * 10000) for n, s, _ in g.values())
    ssb = max(sg - s_all * s_all // (n_all * 10000), 0)
    ssw = max(q_all // 10000 - sg, 0)
    f_micro = (ssb * 10**6 // (k - 1)) // (ssw // (n_all - k))
    r = q_anova_oneway(spark, SF).collect()[0]
    assert (r["n_groups"], r["n_rows"]) == (k, n_all)
    # r9: the three wide columns are emitted as STRING on both engines
    # (materialized-dtype parity fix — see q_anova_oneway); the values
    # remain the exact integers, rendered as plain digits.
    assert int(r["ss_between_d2"]) == ssb
    assert int(r["ss_within_d2"]) == ssw
    assert int(r["f_stat_micro"]) == f_micro


def test_keyness_llr_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_keyness_llr

    docs = pd.read_parquet(f"{SF}/documents.parquet")
    a_cnt: Counter = Counter()
    b_cnt: Counter = Counter()
    for lang, text in zip(docs["lang"], docs["text"]):
        (a_cnt if lang == "en" else b_cnt).update(_toks(text))
    na, nb = sum(a_cnt.values()), sum(b_cnt.values())
    scored = []
    for tokn in set(a_cnt) | set(b_cnt):
        a, b = a_cnt[tokn], b_cnt[tokn]
        ea = na * (a + b) / (na + nb)
        eb = nb * (a + b) / (na + nb)
        ll = 2.0 * (
            (a * math.log(a / ea) if a > 0 else 0.0)
            + (b * math.log(b / eb) if b > 0 else 0.0)
        )
        signed = ll if a / na >= b / nb else -ll
        scored.append((tokn, a, b, _r6(signed)))
    scored.sort(key=lambda t: (-t[3], t[0]))
    got = q_keyness_llr(spark, SF).collect()
    assert len(got) == 20
    for rk, (r, w) in enumerate(zip(got, scored[:20]), 1):
        assert r["rank"] == rk
        assert (r["token"], r["a"], r["b"]) == (w[0], w[1], w[2])
        assert _close(r["signed_g2"], w[3])


def test_ivm_refresh_equals_full_recompute(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_ivm_refresh

    o = _orders()
    want_n: Counter = Counter()
    want_s: Counter = Counter()
    for day, c in zip(o["day"], o["cents"]):
        want_n[day] += 1
        want_s[day] += c
    got = q_ivm_refresh(spark, SF).collect()
    assert {r["day"] for r in got} == set(want_n)
    for r in got:
        assert r["n"] == want_n[r["day"]]
        assert r["sum_cents"] == want_s[r["day"]]


def test_tpch_q1_piped_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_tpch_q1_piped

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    cutoff = pd.Timestamp("1998-09-02").date()
    ship = pd.to_datetime(li["l_shipdate"]).dt.date
    keep = li[ship <= cutoff]
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in q_tpch_q1_piped(spark, SF).collect()
    }
    groups = keep.groupby(["l_returnflag", "l_linestatus"])
    assert set(got) == set(groups.groups)
    for key, grp in groups:
        q = [Decimal(str(round(x, 2))) for x in grp["l_quantity"]]
        ep = [Decimal(str(round(x, 2))) for x in grp["l_extendedprice"]]
        dc = [Decimal(str(round(x, 2))) for x in grp["l_discount"]]
        tx = [Decimal(str(round(x, 2))) for x in grp["l_tax"]]
        n = len(grp)
        r = got[key]
        assert r["count_order"] == n
        assert _close(r["sum_qty"], float(sum(q)), 1e-3)
        assert _close(r["sum_base_price"], float(sum(ep)), 1e-2)
        disc_price = sum(
            (e * (1 - d)).quantize(Decimal("0.0001"))
            for e, d in zip(ep, dc)
        )
        charge = sum(
            (e * (1 - d) * (1 + t)).quantize(Decimal("0.000001"))
            for e, d, t in zip(ep, dc, tx)
        )
        # decimal-exact accumulations; double only at emission
        assert _close(r["sum_disc_price"], float(disc_price), 1e-2)
        assert _close(r["sum_charge"], float(charge), 1e-2)
        assert _close(r["avg_qty"], float(sum(q)) / n, 1e-4)
        assert _close(r["avg_price"], float(sum(ep)) / n, 1e-2)
        assert _close(r["avg_disc"], float(sum(dc)) / n, 1e-6)


def test_survival_rmst_matches_brute_force(spark):
    from music_streaming_etl_spark.plans.stats_queries import q_survival_rmst

    ev = pd.read_parquet(f"{SF}/events.parquet")
    # normalize to ns first: parquet loads as datetime64[us] in
    # pandas 2.x, where astype(int64) would yield MICROseconds
    sec = (
        pd.to_datetime(ev["ts"]).astype("datetime64[ns]").astype("int64")
        // 1_000_000_000
    )
    per: dict = {}
    for uid, s in zip(ev["user_id"], sec):
        lo, hi = per.get(uid, (s, s))
        per[uid] = (min(lo, s), max(hi, s))
    max_s = int(sec.max())
    lab = [
        ((hi - lo) // 3600, (max_s - hi) > 86400) for lo, hi in per.values()
    ]
    grain: dict = defaultdict(lambda: [0, 0])  # t -> [d, total]
    for t, ch in lab:
        grain[t][0] += ch
        grain[t][1] += 1
    n_users = len(lab)
    ts_sorted = sorted(grain)
    cum = Decimal(0)
    s_t: dict = {}
    seen = 0
    for t in ts_sorted:
        d, tot = grain[t]
        n = n_users - seen
        seen += tot
        if d < n:
            cum += Decimal(str(_r6(math.log(1.0 - d / n))))
            s_t[t] = _r6(math.exp(float(cum)))
        else:
            s_t[t] = 0.0
    TAU = 720
    area = Decimal(0)
    pre = [t for t in ts_sorted if t < TAU]
    for i, t in enumerate(pre):
        t_next = ts_sorted[i + 1] if i + 1 < len(ts_sorted) else TAU
        width = min(t_next, TAU) - t
        area += Decimal(str(s_t[t])) * width
    t0 = min(pre) if pre else None
    want = float(area + min(t0, TAU)) if t0 is not None else None
    r = q_survival_rmst(spark, SF).collect()[0]
    assert r["tau_hours"] == TAU
    assert _close(r["rmst_hours"], want, 1e-4)
