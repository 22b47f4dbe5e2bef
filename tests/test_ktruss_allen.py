"""Batch-18 invariants: k-truss peel, Allen interval census — verified
against pure-Python replays at sf0.001."""

from __future__ import annotations

from collections import defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _truss_peel(edges: set, k: int, rounds: int):
    """Order-free k-truss peel on a symmetric edge set."""
    cur = set(edges)
    history = [len(cur)]
    for _ in range(rounds):
        nbrs = defaultdict(set)
        for a, b in cur:
            nbrs[a].add(b)
        cur = {
            (a, b)
            for a, b in cur
            if len(nbrs[a] & nbrs[b]) >= k - 2
        }
        history.append(len(cur))
    return cur, history


def test_ktruss_python_replay(spark):
    from amorphous_mapreduce_spark.operators.dedup import minhash_lsh_pairs
    from amorphous_mapreduce_spark.queries.dedup_queries import (
        KTRUSS_K,
        KTRUSS_ROUNDS,
    )

    docs = load_table(spark, SF, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=16, band_bits=4).collect()
    sym = set()
    for r in pairs:
        sym.add((r.qid, r.nid))
        sym.add((r.nid, r.qid))
    final, hist = _truss_peel(sym, KTRUSS_K, KTRUSS_ROUNDS)
    deg = defaultdict(int)
    for a, _ in final:
        deg[a] += 1

    out = QUERIES["ktruss_near_dup"](spark, SF).toPandas()
    got = {r.id: r.truss_deg for r in out.itertuples()}
    assert got == dict(deg)
    # peel converged inside the fixed round budget (extra rounds no-ops),
    # so the fixed-round result IS the true k-truss
    assert hist[-1] == hist[-2]
    # truss property: every surviving edge sits in >= k-2 triangles
    nbrs = defaultdict(set)
    for a, b in final:
        nbrs[a].add(b)
    assert all(len(nbrs[a] & nbrs[b]) >= KTRUSS_K - 2 for a, b in final)
    # the truss is a subgraph of the 2-core by construction
    assert all(d >= 1 for d in got.values())


def test_allen_python_replay(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    iv = defaultdict(lambda: [10**18, -(10**18)])
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        day, wk = us // 86_400_000_000, us // 604_800_000_000
        key = (r.user_id, r.event_type, wk)
        iv[key][0] = min(iv[key][0], day)
        iv[key][1] = max(iv[key][1], day)
    by_uw = defaultdict(list)
    for (u, t, wk), (s, e) in iv.items():
        by_uw[(u, wk)].append((s, e, t))
    census = defaultdict(lambda: [0, set()])
    for (u, _wk), spans in by_uw.items():
        spans.sort()
        for i in range(len(spans)):
            for j in range(i + 1, len(spans)):
                (s1, e1, _), (s2, e2, _) = spans[i], spans[j]
                if e1 < s2:
                    rel = "precedes"
                elif e1 == s2:
                    rel = "meets"
                elif s1 == s2 and e1 == e2:
                    rel = "equals"
                elif s1 == s2:
                    rel = "starts"
                elif e1 == e2:
                    rel = "finished_by"
                elif e1 > e2:
                    rel = "contains"
                else:
                    rel = "overlaps"
                census[rel][0] += 1
                census[rel][1].add(u)

    out = QUERIES["allen_interval_profile"](spark, SF).toPandas()
    got = {r.rel: (r.n_pairs, r.n_users) for r in out.itertuples()}
    assert got == {k: (c, len(us)) for k, (c, us) in census.items()}
    # the seven relations partition all ordered pairs
    assert sum(c for c, _ in census.values()) == sum(
        len(v) * (len(v) - 1) // 2 for v in by_uw.values()
    )
