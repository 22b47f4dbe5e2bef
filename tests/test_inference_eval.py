"""Python-recomputation checks for the two-sample / agreement /
funnel-significance / MAP batch (stats, analysis, analytics, eval)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import QUERIES
from amorphous_mapreduce_spark.sources import load_table


def test_mann_whitney_matches_naive_ranksum(spark, sf_dir):
    r = QUERIES["mann_whitney_u"](spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("R", "A"))
        .select(F.col("l_quantity").cast("int").alias("v"), "l_returnflag")
        .collect()
    )
    xs = sorted((row.v, row.l_returnflag) for row in rows)
    n = len(xs)
    # naive midrank assignment
    ranks: list[float] = [0.0] * n
    i = 0
    while i < n:
        j = i
        while j < n and xs[j][0] == xs[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        for k in range(i, j):
            ranks[k] = mid
        i = j
    n_r = sum(1 for _, f in xs if f == "R")
    n_a = n - n_r
    r_sum = sum(rk for rk, (_, f) in zip(ranks, xs) if f == "R")
    u = r_sum - n_r * (n_r + 1) / 2.0
    assert r.n_ret == n_r and r.n_acc == n_a
    assert r.u_stat2 == round(2 * u)
    # tie-corrected z
    from collections import Counter

    t_term = sum(t**3 - t for t in Counter(v for v, _ in xs).values())
    var = n_r * n_a / 12.0 * ((n + 1) - t_term / (n * (n - 1)))
    z = (u - n_r * n_a / 2.0) / math.sqrt(var)
    assert abs(r.z_value - z) < 1e-9 * max(1.0, abs(z))


def test_cohens_kappa_recompute_from_confusion(spark, sf_dir):
    r = QUERIES["cohens_kappa"](spark, sf_dir).collect()[0]
    cm = QUERIES["langid_confusion"](spark, sf_dir).collect()
    n = sum(row.n_docs for row in cm)
    agree = sum(row.n_docs for row in cm if row.lang_true == row.lang_pred)
    rows_t: dict[str, int] = {}
    cols_t: dict[str, int] = {}
    for row in cm:
        rows_t[row.lang_true] = rows_t.get(row.lang_true, 0) + row.n_docs
        cols_t[row.lang_pred] = cols_t.get(row.lang_pred, 0) + row.n_docs
    pe_mass = sum(rt * cols_t.get(c, 0) for c, rt in rows_t.items())
    assert r.n_docs == n and r.n_agree == agree
    assert r.kappa == (n * agree - pe_mass) / (n * n - pe_mass)
    assert -1.0 <= r.kappa <= 1.0
    assert 0.0 < r.pe < 1.0  # non-degenerate marginals


def test_funnel_step_z_consistency(spark, sf_dir):
    rows = {r.step: r for r in QUERIES["funnel_step_significance"](spark, sf_dir).collect()}
    assert set(rows) == {"1_view_to_click", "2_click_to_purchase"}
    for r in rows.values():
        assert 0 <= r.conv_even <= r.n_even
        assert 0 <= r.conv_odd <= r.n_odd
        assert r.rate_even == r.conv_even / r.n_even
        if r.z_value is not None:
            p = (r.conv_even + r.conv_odd) / (r.n_even + r.n_odd)
            z = (r.rate_even - r.rate_odd) / math.sqrt(
                p * (1 - p) * (1 / r.n_even + 1 / r.n_odd)
            )
            assert abs(r.z_value - z) < 1e-12 * max(1.0, abs(z))
    # step 2 funnel is a subset of step 1 conversions at the user-day grain
    assert rows["2_click_to_purchase"].n_even == rows["1_view_to_click"].conv_even


def test_map_at_10_mass_identity(spark, sf_dir):
    rows = QUERIES["map_at_10"](spark, sf_dir).collect()
    assert [r.query_id for r in rows] == ["q0", "q1", "q2"]
    for r in rows:
        assert 0 <= r.n_rel <= 10
        if r.n_rel == 0:
            assert r.ap is None and r.ap_mass == 0
        else:
            assert r.ap == r.ap_mass / (2520.0 * r.n_rel)
            assert 0.0 < r.ap <= 1.0
        # mass is bounded by the all-relevant prefix: sum over k of 2520
        assert r.ap_mass <= 2520 * r.n_rel


def test_map_relevance_labels_match_ndcg_hash(spark, sf_dir):
    # the binary rel rule is the >=2 cut of the ndcg graded rule
    h = int(hashlib.md5(b"rel:123").hexdigest()[:15], 16)
    assert h % 4 in (0, 1, 2, 3)
