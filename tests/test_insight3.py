"""Batch-3 invariants: ERR@10, lexical richness, DP geometric counts,
TwoNN intrinsic dimension — brute-forced at sf0.001."""

from __future__ import annotations

import math
from collections import Counter

import hashlib

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def hex_hash64_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _norm_tokens(text: str) -> list[str]:
    return [w for w in " ".join(text.lower().split()).split(" ") if w]


def test_err_cascade_bruteforce(spark):
    # Recompute ERR from the nDCG query's own ranked gains: same top-10,
    # same hash labels.
    ndcg = QUERIES["ndcg_retrieval"](spark, SF).toPandas().iloc[0]
    out = QUERIES["err_at_10"](spark, SF).toPandas().iloc[0]
    assert out.n_docs == ndcg.n_docs <= 10
    # exactness anchor: err_2520 has denominator 2^30 exactly
    assert out.err_scaled_2e30 == out.err_2520 * (1 << 30) // 1
    assert out.err == out.err_2520 / 2520.0
    assert 0 <= out.err <= 1


def test_err_against_python_cascade(spark):
    from amorphous_mapreduce_spark.operators.text_analysis import bm25_scores
    from amorphous_mapreduce_spark.queries.text_queries import BM25_TERMS

    docs = load_table(spark, SF, "documents")
    top = (
        bm25_scores(docs, BM25_TERMS)
        .orderBy("score", ascending=False)
        .toPandas()
        .sort_values(["score", "id"], ascending=[False, True])
        .head(10)
    )
    rvals = [0.0, 0.125, 0.375, 0.875]
    err = 0.0
    stop = 1.0
    for r, (_, row) in enumerate(top.iterrows(), start=1):
        rel = hex_hash64_py(f"rel:{int(row.id)}") % 4
        rv = rvals[rel]
        err += (2520 // r) * rv * stop
        stop *= 1.0 - rv
    out = QUERIES["err_at_10"](spark, SF).toPandas().iloc[0]
    assert out.err_2520 == err


def test_lexical_richness_bruteforce(spark):
    out = QUERIES["lexical_richness"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    for src, grp in docs.groupby("source"):
        tf = Counter(w for t in grp.text for w in _norm_tokens(t))
        n = sum(tf.values())
        s2 = sum(v * v for v in tf.values())
        r = out[out.source == src].iloc[0]
        assert (r.n_tokens, r.n_types) == (n, len(tf))
        assert r.n_hapax == sum(1 for v in tf.values() if v == 1)
        assert r.yule_num == s2 - n
        assert r.yules_k == 10000 * (s2 - n) / (n * n)
        assert r.simpson_d == sum(v * (v - 1) for v in tf.values()) / (
            n * (n - 1)
        )
        assert r.ttr == len(tf) / n


def test_dp_geometric_noise_matches_hash(spark):
    out = QUERIES["dp_geometric_counts"](spark, SF).toPandas()
    cust = load_table(spark, SF, "customer").toPandas()
    truth = (
        cust[cust.c_mktsegment == "BUILDING"].groupby("c_nationkey").size()
    )
    for r in out.itertuples():
        h = hex_hash64_py(f"dpg_{r.c_nationkey}")
        sign = (h % 2) * 2 - 1
        w = h >> 1
        mag = 54 if w == 0 else 54 - w.bit_length()
        assert r.noise == sign * mag
        assert r.n_true == truth.get(r.c_nationkey, 0)
        assert r.n_noisy == r.n_true + r.noise
        assert r.n_released == max(r.n_noisy, 0)
    # geometric(1/2) magnitudes are small with overwhelming probability
    assert out.noise.abs().max() <= 54


def test_twonn_against_numpy(spark):
    import numpy as np

    out = QUERIES["intrinsic_dim_twonn"](spark, SF).toPandas().iloc[0]
    emb = load_table(spark, SF, "embeddings").toPandas()
    M = np.array([np.array(v, dtype=np.float64) for v in emb.embedding])
    norms = np.sqrt((M * M).sum(axis=1))
    sims = (M @ M.T) / np.outer(norms, norms)
    np.fill_diagonal(sims, -np.inf)
    n_used = 0
    approx_sum = 0.0
    for i in range(len(M)):
        order = np.argsort(-sims[i], kind="stable")
        d1 = math.floor((1.0 - sims[i][order[0]]) * 1048576)
        d2 = math.floor((1.0 - sims[i][order[1]]) * 1048576)
        if d1 >= 1:
            n_used += 1
            approx_sum += math.log2(d2 / d1)
    assert out.n_used == n_used
    # LUT log2 is within 0.006 bits per term of true log2
    assert abs(out.log_sum_scaled / 1048576 - approx_sum) <= 0.006 * n_used + 1e-6
    est = n_used * 1048576.0 / (math.log(2) * out.log_sum_scaled)
    assert out.dim_est == est
    assert out.dim_est > 0
