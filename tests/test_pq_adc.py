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
