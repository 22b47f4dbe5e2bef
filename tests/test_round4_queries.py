"""Invariants for the round-4 additions beyond the causal battery
(tests/test_causal.py): monitoring, burst detection, graph extensions,
allocation, segmentation, inventory.

Oracle equivalence is tools/check_oracles.py's job; these assert the
statistical/structural properties a hash-match can't express."""

from __future__ import annotations

# registry first — direct query-module imports can trip the circular
# dedup_queries<->registry chain depending on test order
from amorphous_mapreduce_spark.queries_registry import QUERIES


def test_pchart_limits_bracket_rate(spark, sf_dir):
    rows = QUERIES["error_rate_pchart"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["lcl"] <= r["p_bar"] <= r["ucl"]
        in_limits = r["lcl"] <= r["p_day"] <= r["ucl"]
        assert r["out_of_control"] == (not in_limits)


def test_obf_boundary_monotone_and_n_cumulative(spark, sf_dir):
    rows = sorted(
        QUERIES["group_sequential_obf"](spark, sf_dir).collect(),
        key=lambda r: r["look"],
    )
    assert len(rows) == 5
    bounds = [r["zbound"] for r in rows]
    assert bounds == sorted(bounds, reverse=True)  # OBF spends late
    ns = [(r["n_a"] + r["n_b"]) for r in rows]
    assert ns == sorted(ns)  # looks accumulate data


def test_ks_exp_within_unit_interval(spark, sf_dir):
    rows = QUERIES["interarrival_exp_ks"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["ks_d"] <= 1.0
        assert 0.0 <= r["f_hat"] <= 1.0
        assert 0.0 <= r["f_exp"] <= 1.0
        assert r["mean_gap_s"] > 0


def test_kleinberg_margin_sign_matches_flag(spark, sf_dir):
    rows = QUERIES["kleinberg_burst_days"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["burst"] == (r["burst_margin"] > 0)
    # five series, same day span each
    by_type: dict[str, int] = {}
    for r in rows:
        by_type[r["event_type"]] = by_type.get(r["event_type"], 0) + 1
    assert len(by_type) == 5
    assert len(set(by_type.values())) == 1


def test_ppr_mass_conserved_below_seed_total(spark, sf_dir):
    rows = QUERIES["ppr_copurchase"](spark, sf_dir).collect()
    assert rows
    # truncating division only loses mass: top-40 total stays under the
    # injected budget M + 3 restarts
    assert sum(r["mass_q"] for r in rows) <= (1 << 40) * 2
    masses = [r["mass_q"] for r in rows]
    assert masses == sorted(masses, reverse=True)


def test_fair_share_sums_to_capacity(spark, sf_dir):
    rows = QUERIES["fair_share_allocation"](spark, sf_dir).collect()
    assert rows
    total_alloc = sum(r["allocated"] for r in rows)
    cap = rows[0]["capacity"]
    # exact rational level: allocations sum to capacity within float
    # print noise of the lam_num/lam_den division
    assert abs(total_alloc - cap) < 1e-6 * cap + 1.0
    for r in rows:
        assert r["allocated"] <= r["demand"] + 1e-9


def test_rfm_quintiles_partition_population(spark, sf_dir):
    rows = QUERIES["rfm_cell_matrix"](spark, sf_dir).collect()
    assert rows
    n = sum(r["n_customers"] for r in rows)
    # every dimension's quintile populations are near-equal (exact ranks)
    for dim in ("r_q", "f_q", "m_q"):
        per_q: dict[int, int] = {}
        for r in rows:
            per_q[r[dim]] = per_q.get(r[dim], 0) + r["n_customers"]
        assert set(per_q) <= {0, 1, 2, 3, 4}
        assert max(per_q.values()) - min(per_q.values()) <= n // 5 + 1


def test_newsvendor_quantile_above_mean_or_equal_order(spark, sf_dir):
    rows = QUERIES["newsvendor_stock_levels"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["q80_daily"] is not None
        assert abs(
            r["safety_stock"] - (r["q80_daily"] - r["mean_daily"])
        ) < 1e-9 * max(1.0, abs(r["q80_daily"]))


def test_learned_index_errors_nonnegative(spark, sf_dir):
    rows = QUERIES["learned_index_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["max_abs_err"] >= 0.0
        assert 0 <= r["n_page_misses"] <= r["n"]
        assert r["slope"] > 0  # rank grows with key
