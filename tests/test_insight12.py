"""Batch-13 invariants: CKA quantization, TextRank keywords —
verified against numpy / networkx-free Python replays at sf0.001."""

from __future__ import annotations

from collections import Counter, defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_cka_vs_numpy(spark):
    import math

    import numpy as np

    out = (
        QUERIES["cka_quantization"](spark, SF).toPandas().set_index("variant")
    )
    emb = load_table(spark, SF, "embeddings").toPandas()
    V = np.array([np.array(v, dtype=np.float64) for v in emb.embedding])
    scale = np.abs(V).max(axis=1)
    V = V[scale > 0]
    scale = scale[scale > 0]
    X = np.round(V * 1000).astype(np.int64)
    Y8 = np.trunc(V / scale[:, None] * 127).astype(np.int64)
    Y1 = np.sign(V).astype(np.int64)
    n, d = X.shape

    def fro2(A, B):
        C = n * (A.T @ B.astype(object)) - np.outer(
            A.sum(0).astype(object), B.sum(0)
        )
        return int((C.astype(object) ** 2).sum())

    def recon(v):
        P = 1 << 53
        q1, r0 = v // P, v % P
        return (float(q1 // P) * float(P) + float(q1 % P)) * float(P) + float(
            r0
        )

    fxx = fro2(X, X)
    for variant, Y in (("int8", Y8), ("sign", Y1)):
        r = out.loc[variant]
        fxy, fyy = fro2(X, Y), fro2(Y, Y)
        assert r.n == n and r.d2 == d * d
        assert r.f_cross == recon(fxy)
        assert r.f_x == recon(fxx)
        assert r.f_y == recon(fyy)
        assert r.cka == recon(fxy) / math.sqrt(recon(fxx) * recon(fyy))
        # CKA is a similarity in (0, 1]; int8 preserves geometry better
        # than 1-bit sign hashing
        assert 0.0 < r.cka <= 1.0 + 1e-12
    assert out.loc["int8"].cka > out.loc["sign"].cka
    assert out.loc["int8"].cka > 0.98  # 8-bit is near-isometric


def test_textrank_python_replay(spark):
    from amorphous_mapreduce_spark.operators.dedup import tokenized
    from amorphous_mapreduce_spark.queries.text_queries import (
        TEXTRANK_ROUNDS,
        TEXTRANK_SCALE,
        TEXTRANK_TOP,
    )

    toks = tokenized(load_table(spark, SF, "documents")).collect()
    by_doc = defaultdict(dict)
    for t in toks:
        by_doc[t.id][t.pos] = t.word
    wgt = Counter()
    for doc in by_doc.values():
        for p, w in doc.items():
            nxt = doc.get(p + 1)
            if nxt is not None and nxt != w:
                wgt[(w, nxt)] += 1
                wgt[(nxt, w)] += 1
    outw = Counter()
    for (a, _b), c in wgt.items():
        outw[a] += c
    rank = {w: TEXTRANK_SCALE for w in outw}
    for _ in range(TEXTRANK_ROUNDS):
        spread = Counter()
        for (a, b), c in wgt.items():
            spread[b] += (rank[a] * c) // outw[a]
        rank = {
            w: (3 * TEXTRANK_SCALE + 17 * spread.get(w, 0)) // 20
            for w in outw
        }
    expect = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[
        :TEXTRANK_TOP
    ]
    out = QUERIES["textrank_keywords"](spark, SF).toPandas()
    got = list(zip(out.word, out.rank_q))
    assert got == expect
    for r in out.itertuples():
        assert r.rank == r.rank_q / TEXTRANK_SCALE
        assert r.degree_w == outw[r.word]


def test_logrank_python_replay(spark):
    import numpy as np

    out = QUERIES["logrank_survival_test"](spark, SF).toPandas().iloc[0]
    ev = load_table(spark, SF, "events").toPandas()
    ev["us"] = ev.ts.astype("int64") // 1000
    S = 1 << 20
    L = 600
    obs = []
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        start = prev = None
        for u in g.us:
            if prev is None or u - prev > 1_800_000_000:
                if start is not None:
                    obs.append((uid % 2, prev + 1 - start))
                start = u
            prev = u
        obs.append((uid % 2, prev + 1 - start))
    grp = np.array([g for g, _ in obs])
    dur = np.array([d // 1_000_000 for _, d in obs])
    t_obs = np.minimum(dur, L)
    event = (dur < L).astype(int)
    assert out.n_a == (grp == 0).sum() and out.n_b == (grp == 1).sum()
    assert out.events_a == event[grp == 0].sum()
    assert out.events_b == event[grp == 1].sum()
    times = np.unique(t_obs[event == 1])
    sum_ome = sum_v = 0
    ref_ome = ref_v = 0.0
    npts = 0
    for t in times:
        n1 = int(((grp == 0) & (t_obs >= t)).sum())
        n2 = int(((grp == 1) & (t_obs >= t)).sum())
        d1 = int(((grp == 0) & (t_obs == t) & (event == 1)).sum())
        d2 = int(((grp == 1) & (t_obs == t) & (event == 1)).sum())
        n, d = n1 + n2, d1 + d2
        if n < 2 or d < 1:
            continue
        npts += 1
        sum_ome += d1 * S - (d * n1 * S) // n
        sum_v += (d * n1 * n2 * (n - d) * S) // (n * n * (n - 1))
        ref_ome += d1 - d * n1 / n
        ref_v += d * n1 * n2 * (n - d) / (n * n * (n - 1))
    assert out.n_timepoints == npts
    assert out.sum_ome_q == sum_ome
    assert out.sum_v_q == sum_v
    assert out.chi2 == (float(sum_ome) ** 2) / (float(S) * float(sum_v))
    # quantization fidelity: matches the float log-rank to ~1e-3
    ref_chi2 = ref_ome * ref_ome / ref_v
    assert abs(out.chi2 - ref_chi2) <= max(1e-3, 0.01 * ref_chi2)
    # null sanity: parity cohorts share the hazard — chi2 is small
    assert out.chi2 < 15
