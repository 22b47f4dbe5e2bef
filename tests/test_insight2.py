"""Batch-2 invariants: QLM retrieval, k-means silhouette, HLL overlap,
context sweep, SQL rolling share — brute-forced at sf0.001."""

from __future__ import annotations

import math
from collections import Counter

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.functions.intlog import LOG2_LUT, LOG2_SCALE
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _log2s(c: int) -> int:
    e = c.bit_length() - 1
    return e * LOG2_SCALE + LOG2_LUT[(c * 256) // (1 << e) - 256]


def _norm_tokens(text: str) -> list[str]:
    return [w for w in " ".join(text.lower().split()).split(" ") if w]


def test_qlm_matches_bruteforce(spark):
    from amorphous_mapreduce_spark.queries.text_queries import QLM_MU, QLM_TERMS

    out = QUERIES["qlm_retrieval"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    toks = {r.doc_id: _norm_tokens(r.text) for r in docs.itertuples()}
    C = sum(len(t) for t in toks.values())
    cf = Counter()
    for ws in toks.values():
        cf.update(ws)
    scored = []
    for did, ws in toks.items():
        dl = len(ws)
        tfs = Counter(ws)
        s = sum(
            _log2s(tfs[t] * C + QLM_MU * cf[t]) - _log2s((dl + QLM_MU) * C)
            for t in QLM_TERMS
        )
        scored.append((-s, did, dl, s))
    scored.sort()
    want = scored[:15]
    assert len(out) == 15
    for r, (_, did, dl, s) in zip(out.itertuples(), want):
        assert (r.id, r.dl, r.qlm_scaled) == (did, dl, s)
        assert r.qlm_bits == s / LOG2_SCALE
    # smoothing sanity: docs actually containing a query term outrank
    # same-length docs without one
    assert out.iloc[0][["tf_0", "tf_1", "tf_2"]].sum() > 0


def test_silhouette_bounds_and_consistency(spark):
    out = QUERIES["kmeans_silhouette"](spark, SF).toPandas()
    sizes = QUERIES["kmeans_cluster_sizes"](spark, SF).toPandas()
    assert sorted(out.cell) == sorted(sizes.cell)
    m = out.merge(sizes, on="cell")
    assert (m.n_members_x == m.n_members_y).all()
    # simplified silhouette with nearest-other is in [0, 1)
    assert (out.mean_sil >= 0).all() and (out.mean_sil < 1).all()
    assert (out.sil_sum_q == (out.mean_sil * out.n_members * 1048576).round()).all()


def test_hll_overlap_algebra(spark):
    out = QUERIES["hll_source_overlap"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    n_src = docs.source.nunique()
    assert len(out) == n_src * (n_src - 1) // 2
    # union denominator can never exceed either side's (min of terms)
    assert (out.denom_union <= out.denom_a).all()
    assert (out.denom_union <= out.denom_b).all()
    # hence est_union >= max(est_a, est_b) and intersection <= min side
    assert (out.est_union >= out[["est_a", "est_b"]].max(axis=1) - 1e-9).all()
    assert (
        out.est_intersection <= out[["est_a", "est_b"]].min(axis=1) + 1e-9
    ).all()
    # exact overlap direction check on one pair: bigger true overlap
    # should not estimate at zero when vocab is shared
    vocab = {
        s: set(w for t in docs[docs.source == s].text for w in _norm_tokens(t))
        for s in docs.source.unique()[:3]
    }
    ss = sorted(vocab)
    for i in range(len(ss)):
        for j in range(i + 1, len(ss)):
            true_inter = len(vocab[ss[i]] & vocab[ss[j]])
            row = out[(out.src_a == ss[i]) & (out.src_b == ss[j])]
            if len(row) and true_inter > 100:
                est = row.iloc[0].est_intersection
                assert est > 0.2 * true_inter  # loose m=64 error band


def test_context_sweep_bruteforce(spark):
    from amorphous_mapreduce_spark.queries.corpus_queries import CTX_LEVELS

    out = QUERIES["context_length_sweep"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    dls = [len(_norm_tokens(t)) for t in docs.text]
    assert len(out) == len(CTX_LEVELS)
    for r in out.itertuples():
        ctx = r.ctx
        assert r.n_docs == len(dls)
        assert r.tokens_total == sum(dls)
        assert r.n_truncated == sum(1 for d in dls if d > ctx)
        assert r.tokens_lost == sum(d - ctx for d in dls if d > ctx)
        assert r.pad_waste_unpacked == sum(ctx - d for d in dls if d <= ctx)
        kept = sum(min(d, ctx) for d in dls)
        assert r.packed_seqs_lb == math.ceil(kept / ctx)


def test_sql_rolling_share_invariants(spark):
    out = QUERIES["sql_rolling_share"](spark, SF).toPandas()
    # shares within each month sum to 1
    g = out.groupby("month_idx")
    assert (g.cents.sum() == g.month_cents.first()).all()
    tot = out.groupby("month_idx").share.sum()
    assert ((tot - 1).abs() < 1e-9).all()
    # rolling window never exceeds 3 months of mass
    assert (out.cents_3m >= out.cents).all()
    assert (out.share_3m >= 0).all() and (out.share_3m <= 1).all()
