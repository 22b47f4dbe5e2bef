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


def test_mlr_matches_numpy_lstsq(spark, sf_dir):
    import numpy as np

    r = QUERIES["lineitem_mlr_pricing"](spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_extendedprice", "l_discount", "l_quantity")
        .collect()
    )
    y = np.array([round(row.l_extendedprice * 100) for row in rows], dtype=float)
    X = np.column_stack(
        [
            np.ones(len(rows)),
            [round(row.l_discount * 100) for row in rows],
            [row.l_quantity for row in rows],
        ]
    )
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert r.n == len(rows)
    for got, want in zip(
        (r.beta0_cents, r.beta1_cents_per_bp, r.beta2_cents_per_unit), beta
    ):
        assert abs(got - want) < 1e-6 * max(1.0, abs(want))
    pred = X @ beta
    ss_res = float(((y - pred) ** 2).sum())
    ss_tot = float(((y - y.mean()) ** 2).sum())
    assert abs(r.r_sq - (1 - ss_res / ss_tot)) < 1e-9
    assert 0.0 <= r.r_sq <= 1.0


def test_cuped_theta_reduces_variance(spark, sf_dir):
    r = QUERIES["cuped_adjusted_lift"](spark, sf_dir).collect()[0]
    assert r.n_even > 0 and r.n_odd > 0
    assert 0.0 <= r.rho_sq <= 1.0
    # recompute theta/rho^2 from per-user pre/post sums
    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "value")
        .collect()
    )
    import collections
    from datetime import datetime

    pre = collections.defaultdict(int)
    post = collections.defaultdict(int)
    cut = datetime(2024, 1, 16)
    for row in rows:
        cents = round(row.value * 100)
        (pre if row.ts < cut else post)[row.user_id] += cents
    users = sorted(set(pre) | set(post))
    xs = [pre.get(u, 0) for u in users]
    ys = [post.get(u, 0) for u in users]
    n = len(users)
    sx, sy = sum(xs), sum(ys)
    cov = n * sum(x * y for x, y in zip(xs, ys)) - sx * sy
    vx = n * sum(x * x for x in xs) - sx * sx
    assert abs(r.theta - cov / vx) < 1e-12 * max(1.0, abs(cov / vx))


def test_hits_authority_properties(spark, sf_dir):
    rows = QUERIES["hits_supplier_authority"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    scaled = [r.authority_scaled for r in rows]
    assert scaled == sorted(scaled, reverse=True)
    assert scaled[0] == 1 << 20  # the max-normalized leader is exactly 2^20
    assert all(0 < s <= 1 << 20 for s in scaled)
