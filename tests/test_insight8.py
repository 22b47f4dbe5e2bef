"""Batch-9 invariants: PCA variance explained, Apdex — verified
against numpy / brute force at sf0.001."""

from __future__ import annotations

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_pca_variance_vs_numpy(spark):
    import numpy as np

    out = QUERIES["pca_variance_explained"](spark, SF).toPandas().iloc[0]
    emb = load_table(spark, SF, "embeddings").toPandas()
    M = np.array(
        [np.round(np.array(v, dtype=np.float64) * 1000) for v in emb.embedding]
    )
    G = (M.T @ M).astype(np.int64)
    assert out.n_dims == G.shape[0]
    assert out.trace_q == np.trace(G)
    # the Rayleigh quotient of the 8-round integer iterate approximates
    # the true top eigenvalue from below (within a few percent after 8
    # power rounds)
    evals = np.linalg.eigvalsh(G.astype(np.float64))
    lam_true = evals[-1]
    assert out.lambda1_q <= lam_true * (1 + 1e-9)
    assert out.lambda1_q >= 0.9 * lam_true
    assert out.var_explained_top1 == out.lambda1_q / out.trace_q
    assert 0 < out.var_explained_top1 <= 1
    # hi/lo reconstruction is the exact integer
    v_q = (
        QUERIES["embedding_power_iteration"](spark, SF)
        .toPandas()
        .sort_values("dim")
        .v_q.to_numpy()
        .astype(object)
    )
    vgv = int(v_q @ G.astype(object) @ v_q)
    assert out.rq_hi == vgv // (1 << 30)
    assert out.rq_lo == vgv % (1 << 30)
    assert out.vv == int(v_q @ v_q)


def test_apdex_bruteforce(spark):
    out = QUERIES["apdex_daily_score"](spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    ev["us"] = ev.ts.astype("int64") // 1000
    from collections import defaultdict

    days = defaultdict(lambda: [0, 0, 0])  # n, sat, tol
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        start = prev = None
        spans = []
        for u in g.us:
            if prev is None or u - prev > 1_800_000_000:
                if start is not None:
                    spans.append((start, prev + 1 - start))
                start = u
            prev = u
        spans.append((start, prev + 1 - start))
        for s, d in spans:
            rec = days[s // 86_400_000_000]
            rec[0] += 1
            rec[1] += d <= 60_000_000
            rec[2] += 60_000_000 < d <= 240_000_000
    assert len(out) == len(days)
    for r in out.itertuples():
        n, sat, tol = days[r.day_idx]
        assert (r.n_sessions, r.n_satisfied, r.n_tolerating) == (n, sat, tol)
        assert r.apdex == (2 * sat + tol) / (2 * n)
        assert 0 <= r.apdex <= 1
