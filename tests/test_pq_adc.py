"""Product-quantization ADC recall query: structural invariants."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_pq_adc_recall_histogram(spark):
    from amorphous_mapreduce_spark import queries_registry as qr
    from amorphous_mapreduce_spark.queries.similarity_queries import (
        PQ_PANEL,
        PQ_TOPK,
    )

    rows = qr.QUERIES["pq_adc_recall"](spark, SF_SMOKE).collect()
    assert rows
    total = sum(r["n_queries"] for r in rows)
    assert total == PQ_PANEL  # every panel query lands in exactly one bucket
    for r in rows:
        assert 0 <= r[f"overlap_at_{PQ_TOPK}"] <= PQ_TOPK
        assert r["n_queries"] > 0
    # PQ with trained codebooks must beat the all-zero-overlap floor
    assert any(r[f"overlap_at_{PQ_TOPK}"] > 0 for r in rows)


def test_media_ahash_finds_exactly_sibling_pairs(spark):
    from amorphous_mapreduce_spark import queries_registry as qr
    from amorphous_mapreduce_spark.queries.multimodal_queries import N_MEDIA

    rows = qr.QUERIES["media_ahash_near_dup"](spark, SF_SMOKE).collect()
    pairs = {(r["qid"], r["nid"]) for r in rows}
    expected = {(2 * k, 2 * k + 1) for k in range(N_MEDIA // 2)}
    assert pairs == expected
    assert all(r["is_sibling"] for r in rows)
    assert all(r["hamming"] <= 2 for r in rows)


def test_bellman_ford_invariants(spark):
    from amorphous_mapreduce_spark import queries_registry as qr

    rows = qr.QUERIES["bellman_ford_part_distances"](spark, SF_SMOKE).collect()
    assert rows
    dists = [r["dist"] for r in rows]
    assert dists[0] == 0  # the source settles at distance 0
    assert dists == sorted(dists)  # top-k ordering by distance
    assert all(d >= 0 for d in dists)
    # 4 relaxation rounds with min edge weight 1+1000//max_support bound
    # any settled distance by rounds * max edge weight (w <= 501)
    assert all(d <= 4 * 501 for d in dists)


def test_als_rank1_beats_global_mean(spark):
    from amorphous_mapreduce_spark import queries_registry as qr

    row = qr.QUERIES["als_rank1_backtest"](spark, SF_SMOKE).collect()[0]
    assert row["n_ratings"] >= row["n_users"]
    assert row["rmse_als"] >= 0.0
    # a personalized rank-1 fit must explain variance the global mean cannot
    assert 0.0 < row["r2_vs_mean"] <= 1.0
