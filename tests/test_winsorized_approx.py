"""The approx winsorized twin must agree with the exact one within
the sketch's tolerance: same row counts, and per-group winsorized
means within 1% relative error (ε=1/10000 sketch on this data is far
tighter; 1% is the loud-failure bound)."""

from __future__ import annotations

from music_streaming_etl_spark.plans.analytics_queries import (
    q_winsorized_stats,
    q_winsorized_stats_approx,
)


def test_approx_winsorized_close_to_exact(spark, sf_dir):
    exact = {
        r["l_returnflag"]: (r["n_items"], r["winsorized_mean_cents"])
        for r in q_winsorized_stats(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: (r["n_items"], r["winsorized_mean_cents"])
        for r in q_winsorized_stats_approx(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for flag, (n_e, m_e) in exact.items():
        n_a, m_a = approx[flag]
        assert n_a == n_e, flag  # clipping never changes row counts
        assert abs(m_a - m_e) / m_e < 0.01, (flag, m_e, m_a)
