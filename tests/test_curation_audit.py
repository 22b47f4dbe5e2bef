"""Bigram gain, dim audit, waterfall, knockout: Python replays and
invariants (imports via queries_registry)."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pytest

from amorphous_mapreduce_spark.queries_registry import QUERIES
from amorphous_mapreduce_spark.sources import load_table


def _toks(text: str) -> list[str]:
    return [w for w in re.sub(r"\s+", " ", text.strip().lower()).split(" ") if w]


def test_bigram_gain_replay(spark, sf_dir):
    from amorphous_mapreduce_spark.functions.intlog import LOG2_LUT, LOG2_SCALE

    def l(c: int) -> int:
        e = c.bit_length() - 1
        return e * LOG2_SCALE + LOG2_LUT[(c * 256) // (1 << e) - 256]

    rows = {r.source: r for r in QUERIES["bigram_perplexity_gain"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    uni: dict[str, Counter] = defaultdict(Counter)
    bg: dict[str, Counter] = defaultdict(Counter)
    vocab = set()
    for d in docs:
        ts = _toks(d.text)
        vocab.update(ts)
        uni[d.source].update(ts)
        bg[d.source].update(zip(ts, ts[1:]))
    v = len(vocab)
    for s, cu in uni.items():
        n_s = sum(cu.values())
        bits1 = sum(c * (l(n_s + v) - l(c + 1)) for c in cu.values())
        n_bg = sum(bg[s].values())
        bits2 = sum(
            c12 * (l(cu[w1] + v) - l(c12 + 1)) for (w1, _), c12 in bg[s].items()
        )
        r = rows[s]
        assert (r.n_tokens, r.n_bigrams) == (n_s, n_bg)
        assert r.unigram_bits == pytest.approx(bits1 / (n_s * LOG2_SCALE), abs=1e-12)
        assert r.bigram_bits == pytest.approx(bits2 / (n_bg * LOG2_SCALE), abs=1e-12)
        # bigram conditioning should not hurt in-domain fit materially
        assert r.gain_bits > -0.5


def test_dim_audit_replay(spark, sf_dir):
    import numpy as np

    rows = QUERIES["embedding_dim_audit"](spark, sf_dir).collect()
    assert len(rows) == 64
    emb = load_table(spark, sf_dir, "embeddings").collect()
    qs = []
    for r in emb:
        v = np.array(r.embedding, dtype=np.float64)
        s = np.abs(v).max()
        if s > 0:
            qs.append(np.trunc(v / s * 127.0).astype(np.int64))
    q = np.stack(qs)
    for r in rows:
        col = q[:, r.dim]
        assert r.n == len(col)
        assert r.sum_q == int(col.sum())
        assert r.sum_q2 == int((col.astype(object) ** 2).sum())
        assert (r.min_q, r.max_q) == (int(col.min()), int(col.max()))
        assert r.n_sat == int((np.abs(col) == 127).sum())
        assert r.var_q == pytest.approx(
            (r.n * r.sum_q2 - r.sum_q**2) / (r.n * r.n), rel=1e-12
        )
        assert r.var_q >= 0


def test_waterfall_accounts_for_every_doc(spark, sf_dir):
    rows = QUERIES["curation_waterfall"](spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.doc_share for r in rows) == pytest.approx(1.0, abs=1e-12)
    stages = [r.stage for r in rows]
    assert stages == sorted(stages)
    assert set(stages) <= {
        "a_short",
        "b_repetitive",
        "c_low_diversity",
        "d_no_stopwords",
        "e_pass",
    }
    # the pass stage must exist and dominate on the synthetic corpus
    byname = {r.stage: r for r in rows}
    assert byname["e_pass"].n_docs > 0


def test_knockout_invariants(spark, sf_dir):
    rows = QUERIES["source_knockout_dup_yield"](spark, sf_dir).collect()
    assert rows
    m = None
    for r in rows:
        assert 0 <= r.n_internal <= r.n_incident
        assert r.n_cross == r.n_incident - r.n_internal
        assert 0 < r.knockout_share <= 1.0
        got_m = round(r.n_incident / r.knockout_share)
        m = m or got_m
        assert abs(got_m - m) <= 1  # same pair total behind every row
    # every pair touches 1 or 2 sources: sum(incident) between m and 2m
    tot_inc = sum(r.n_incident for r in rows)
    assert m <= tot_inc <= 2 * m


def test_release_manifest_accounting(spark, sf_dir):
    import hashlib

    rows = QUERIES["training_release_manifest"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 4
    q = {r.id: r for r in QUERIES["quality_rules"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()

    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower())

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    survivors = {}
    for d in docs:
        if d.doc_id in q and q[d.doc_id].rules_pass:
            dg = h60(norm(d.text))
            if dg not in survivors or d.doc_id < survivors[dg]:
                survivors[dg] = d.doc_id
    shards = {}
    for dg, did in survivors.items():
        if h60(f"rel:{did}") % 100 < 50:
            s = h60(f"shard:{did}") % 4
            st = shards.setdefault(s, [0, 0, None, None, 0])
            st[0] += 1
            st[1] += q[did].n_words
            st[2] = did if st[2] is None else min(st[2], did)
            st[3] = did if st[3] is None else max(st[3], did)
            st[4] ^= dg
    for r in rows:
        want = shards[r.shard]
        assert [r.n_docs, r.n_tokens, r.min_id, r.max_id, r.content_xor] == want
    assert len(rows) == len(shards)


def test_media_chunk_near_dup_finds_exactly_siblings(spark, sf_dir):
    rows = QUERIES["media_chunk_near_dup"](spark, sf_dir).collect()
    # 64 sibling-structured blobs -> exactly the 32 even/odd pairs
    assert len(rows) == 32
    for r in rows:
        assert r.nid == r.qid + 1 and r.qid % 2 == 0
        assert r.shared_chunks == 7
        assert r.chunk_overlap == 7 / 8


def test_lsh_band_sweep_tradeoff(spark, sf_dir):
    rows = QUERIES["lsh_band_sweep"](spark, sf_dir).collect()
    assert [r.band_width for r in rows] == [2, 4, 8]
    n_true = {r.n_true for r in rows}
    assert len(n_true) == 1 and n_true.pop() > 0
    for a, b in zip(rows, rows[1:]):
        # wider bands = stricter AND across more rows = fewer candidates
        assert a.n_candidates >= b.n_candidates
        assert a.n_hits >= b.n_hits
    for r in rows:
        assert 0.0 <= r.recall <= 1.0 and 0.0 <= r.precision <= 1.0
        assert r.n_bands * r.band_width == 16
    # the narrowest banding must catch most true pairs on this fixture
    assert rows[0].recall >= 0.9
