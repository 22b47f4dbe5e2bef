"""Tests for round-3 additions: GK audit, Heaps fit, Shapley valuation,
Fellegi-Sunter weights, SPRT boundary, BM25 sweep.

Queries are imported via queries_registry (circular-import convention).
"""

from __future__ import annotations

import pytest

from amorphous_mapreduce_spark.queries_registry import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q():
    return QUERIES


def test_heaps_law_fit_sane(spark, q):
    row = q["heaps_law_fit"](spark, SF).collect()[0]
    assert row.n_points == 10
    # trigram type inventory grows sublinearly but genuinely
    assert 0.0 < row.beta < 1.5
    assert 0.0 <= row.r2 <= 1.0


def test_shapley_lang_valuation_efficiency(spark, q):
    rows = q["shapley_lang_valuation"](spark, SF).collect()
    assert {r.lang for r in rows} == {"de", "en", "es", "fr", "zh"}
    phi_sum = sum(r.phi for r in rows)
    r2_full = rows[0].r2_full
    # Shapley efficiency: sum of phi == f(full) - f(empty), up to the
    # 2^-20 per-term quantization (80 terms)
    assert abs(phi_sum - r2_full) < 1e-3
    assert all(r.r2_full == r2_full for r in rows)


def test_fellegi_sunter_weights_direction(spark, q):
    rows = {r.feature: r for r in q["fellegi_sunter_weights"](spark, SF).collect()}
    assert set(rows) == {"lang", "source", "len20", "head24"}
    for r in rows.values():
        assert 0 < r.m_tot and 0 < r.u_tot
        assert 0 <= r.m_agree <= r.m_tot
        assert 0 <= r.u_agree <= r.u_tot
    # near-dups agree on language far more often than random pairs
    assert rows["lang"].weight_bits > 0


def test_sprt_boundary_llr_identity(spark, q):
    rows = q["sprt_ab_boundary"](spark, SF).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.decision in ("accept_h0", "accept_h1", "continue")
        # final LLR is exactly the closed form over totals
        assert r.llr_final_scaled == r.n_conv * 772764 + (
            r.n_events - r.n_conv
        ) * (-189344)
        if r.decision == "accept_h1":
            assert r.first_up_day is not None
        if r.decision == "accept_h0":
            assert r.first_down_day is not None


def test_bm25_param_sweep_shape(spark, q):
    rows = q["bm25_param_sweep"](spark, SF).collect()
    assert len(rows) == 9
    for r in rows:
        assert r.hits_at_10 <= min(10, r.n_rel)
        assert 0.0 <= r.recall_at_10 <= 1.0
        assert r.mrr_mass_2520 <= 10 * 2520


def test_approx_quantile_bound_holds_everywhere(spark, q):
    out = q["approx_quantile_audit"](spark, SF).collect()
    assert out and all(r.approx_within_bound for r in out)


def test_sql_filtered_rollup_consistency(spark, q):
    rows = q["sql_filtered_rollup"](spark, SF).collect()
    assert len(rows) == 25
    for r in rows:
        assert r.n_urgent <= r.n_orders and r.n_finished <= r.n_orders
        assert r.first_order_ts <= r.last_order_ts


def test_sequential_purchase_rules_bounds(spark, q):
    rows = q["sequential_purchase_rules"](spark, SF).collect()
    assert 0 < len(rows) <= 15
    for r in rows:
        # support counts customers, bounded by both margins
        assert r.support <= r.n_ante and r.support <= r.n_cons
        assert 0.0 < r.confidence <= 1.0
        assert r.antecedent != r.consequent


def test_boilerplate_prefix_mass_bounds(spark, q):
    rows = q["boilerplate_prefix_mass"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_pref <= r.n_docs
        assert 0.0 < r.mass_share <= 1.0
        assert r.boilerplate_flag == (r.n_pref * 20 > r.n_docs)
        assert len(r.prefix) <= 32


def test_weighted_jaccard_vs_unweighted(spark, q):
    wj = q["weighted_jaccard_pairs"](spark, SF).collect()
    assert wj
    for r in wj:
        assert 0 < r.w_inter <= r.w_union
        assert 0.05 <= r.weighted_jaccard + 1e-12 <= 1.0


def test_content_defined_chunks_conservation(spark, q):
    rows = q["content_defined_chunks"](spark, SF).collect()
    assert rows
    # total_tokens equals the independent per-source token count
    from amorphous_mapreduce_spark.operators.dedup import tokenized
    from amorphous_mapreduce_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    exp = {
        r["source"]: r["n"]
        for r in tokenized(docs)
        .join(
            docs.select(F.col("doc_id").alias("id"), "source"), "id"
        )
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.total_tokens == exp[r.source]
        assert 1 <= r.max_chunk_tokens
        assert r.n_chunks >= r.n_docs


def test_coverage_greedy_monotone_gains(spark, q):
    rows = sorted(
        q["coverage_greedy_docs"](spark, SF).collect(), key=lambda r: r.round
    )
    assert [r.round for r in rows] == [1, 2, 3, 4, 5]
    gains = [r.gain for r in rows]
    # submodularity: marginal gains are non-increasing
    assert all(a >= b for a, b in zip(gains, gains[1:]))
    # cumulative coverage equals the running gain total (disjoint gains)
    cum = 0
    for r in rows:
        cum += r.gain
        assert r.cum_covered == cum
    # selected docs are distinct
    assert len({r.doc_id for r in rows}) == 5


def test_join_view_ivm_identity(spark, q):
    rows = q["join_view_ivm_proof"](spark, SF).collect()
    assert rows
    assert all(r.matches for r in rows)
    assert all(r.direct_cents == r.maintained_cents for r in rows)
