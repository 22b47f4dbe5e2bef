"""Batch-7/8 invariants: Kneser-Ney bigrams and the ANF neighborhood
sketch — brute-forced at sf0.001."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _norm_tokens(text: str) -> list[str]:
    return [w for w in " ".join(text.lower().split()).split(" ") if w]


def test_kneser_ney_bruteforce(spark):
    out = QUERIES["kneser_ney_bigrams"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    bi: Counter = Counter()
    for t in docs.text:
        ws = _norm_tokens(t)
        bi.update(zip(ws, ws[1:]))
    c1: Counter = Counter()
    n1p: Counter = Counter()
    ncont: Counter = Counter()
    for (a, b), c in bi.items():
        c1[a] += c
        n1p[a] += 1
        ncont[b] += 1
    T = len(bi)
    top_ctx = sorted(c1, key=lambda w: (-c1[w], w))[:5]
    assert set(out.w1) == set(top_ctx)
    for w1 in top_ctx:
        conts = [(b, c) for (a, b), c in bi.items() if a == w1]
        scored = sorted(
            (
                -(max(4 * c - 3, 0) * T + 3 * n1p[w1] * ncont[b]),
                b,
                c,
            )
            for b, c in conts
        )[:5]
        rows = out[out.w1 == w1].sort_values("rnk")
        assert list(rows.w2) == [s[1] for s in scored]
        for r, (negnum, b, c) in zip(rows.itertuples(), scored):
            assert r.p_num == -negnum and r.c == c
            assert r.p_den == 4 * c1[w1] * T
            assert r.p_kn == r.p_num / r.p_den
    # probabilities per context sum to <= 1 (full distribution sums to 1;
    # we only see top-5)
    assert (out.groupby("w1").p_kn.sum() <= 1.0 + 1e-12).all()


def test_anf_sketch_bruteforce(spark):
    from amorphous_mapreduce_spark.operators.dedup import minhash_lsh_pairs
    from amorphous_mapreduce_spark.queries.sketch_queries import _HLL_LC64

    out = QUERIES["anf_neighborhood_sketch"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=16, band_bits=4).toPandas()
    adj = defaultdict(set)
    for r in pairs.itertuples():
        adj[r.qid].add(r.nid)
        adj[r.nid].add(r.qid)
    assert len(out) == len(adj)
    for r in out.itertuples():
        ball = {r.node} | adj[r.node]
        for u in list(adj[r.node]):
            ball |= adj[u]
        assert r.ball2_exact == len(ball)
        # replay the register propagation exactly
        regs: dict = {}
        for v in ball:
            h = int(hashlib.md5(f"anf_{v}".encode()).hexdigest()[:15], 16)
            w = h >> 6
            rho = 55 if w == 0 else 55 - w.bit_length()
            b = h % 64
            regs[b] = max(regs.get(b, 0), rho)
        used = len(regs)
        denom = sum(1 << (55 - v) for v in regs.values()) + (64 - used) * (
            1 << 55
        )
        assert r.registers_used == used
        assert r.sum_scaled == denom
        raw = 1.046802484394006e20 / denom
        est = _HLL_LC64[64 - used - 1] if (used < 64 and raw <= 160.0) else raw
        assert r.ball2_est == est
