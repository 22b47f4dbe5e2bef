"""Batch-6 invariants: Markov entropy rate, rich club, correlated-
sampling join estimate — brute-forced at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.functions.intlog import LOG2_LUT, LOG2_SCALE
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _log2s(c: int) -> int:
    e = c.bit_length() - 1
    return e * LOG2_SCALE + LOG2_LUT[(c * 256) // (1 << e) - 256]


def test_entropy_rate_bruteforce(spark):
    out = QUERIES["markov_entropy_rate"](spark, SF).toPandas()
    ev = (
        load_table(spark, SF, "events")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    trans: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        ts = list(g.event_type)
        trans.update(zip(ts, ts[1:]))
    rows: dict = defaultdict(lambda: [0, 0])
    for (a, _), c in trans.items():
        rows[a][0] += c
        rows[a][1] += c * _log2s(c)
    n = sum(v[0] for v in rows.values())
    assert len(out) == len(rows)
    for r in out.itertuples():
        tot, clogc = rows[r.from_type]
        ent = tot * _log2s(tot) - clogc
        assert (r.from_total, r.ent_num) == (tot, ent)
        assert r.h_cond_bits == ent / (tot * LOG2_SCALE)
        assert r.pi_weight == tot / n
        # conditional entropy bounded by log2(#observed next states)
        k = sum(1 for (a, _) in trans if a == r.from_type)
        assert r.h_cond_bits <= math.log2(max(k, 1)) + 0.01
    # entropy rate = sum of contributions, sanity range
    rate = out.rate_contrib_bits.sum()
    assert 0 <= rate <= math.log2(ev.event_type.nunique()) + 0.01


def test_rich_club_monotone_structure(spark):
    out = QUERIES["rich_club_coefficient"](spark, SF).toPandas()
    # nodes shrink as the threshold rises
    s = out.sort_values("k")
    assert s.n_nodes_k.is_monotonic_decreasing
    assert s.n_edges_k.is_monotonic_decreasing
    assert ((s.phi.dropna() >= 0) & (s.phi.dropna() <= 1)).all()
    # cross-check k=1 against the pairs operator
    from amorphous_mapreduce_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, SF, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=16, band_bits=4).toPandas()
    deg: Counter = Counter()
    for r in pairs.itertuples():
        deg[r.qid] += 1
        deg[r.nid] += 1
    for r in out.itertuples():
        nodes = {v for v, d in deg.items() if d > r.k}
        e = sum(1 for p in pairs.itertuples() if p.qid in nodes and p.nid in nodes)
        assert r.n_nodes_k == len(nodes)
        assert r.n_edges_k == e


def test_sampled_join_matches_hash_sample(spark):
    out = QUERIES["sampled_join_cardinality"](spark, SF).toPandas().iloc[0]
    ev = load_table(spark, SF, "events").toPandas()
    od = load_table(spark, SF, "orders").toPandas()

    def keep(k: int) -> bool:
        return int(hashlib.md5(f"cs_{k}".encode()).hexdigest()[:15], 16) % 16 == 0

    cu = Counter(ev.user_id)
    co = Counter(od.o_custkey)
    exact = sum(c * co.get(k, 0) for k, c in cu.items())
    sampled = sum(c * co.get(k, 0) for k, c in cu.items() if keep(k))
    assert out.exact_pairs == exact
    assert out.sampled_pairs == sampled
    assert out.est_pairs == sampled * 16
