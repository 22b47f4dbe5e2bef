"""Batch-14 invariants: greedy LM decode, RLE layout audit —
verified against pure-Python replays at sf0.001."""

from __future__ import annotations

from collections import Counter, defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_greedy_decode_python_replay(spark):
    from amorphous_mapreduce_spark.operators.dedup import tokenized
    from amorphous_mapreduce_spark.queries.lm_queries import DECODE_STEPS

    toks = tokenized(load_table(spark, SF, "documents")).collect()
    by_doc = defaultdict(dict)
    for t in toks:
        by_doc[t.id][t.pos] = t.word
    bg = Counter()
    for doc in by_doc.values():
        for p, w in doc.items():
            nxt = doc.get(p + 1)
            if nxt is not None:
                bg[(w, nxt)] += 1
    outflow = Counter()
    for (a, _b), c in bg.items():
        outflow[a] += c
    cur = min(outflow, key=lambda w: (-outflow[w], w))
    path = [(0, cur, None)]
    for i in range(1, DECODE_STEPS + 1):
        cands = {b: c for (a, b), c in bg.items() if a == cur}
        nxt = min(cands, key=lambda w: (-cands[w], w))
        path.append((i, nxt, cands[nxt]))
        cur = nxt
    out = QUERIES["greedy_lm_decode"](spark, SF).toPandas()
    got = [
        (r.step, r.word, None if r.step == 0 else r.in_count)
        for r in out.itertuples()
    ]
    assert got == path
    # greedy chain property: each used count is the max over the
    # previous word's continuations
    for i in range(1, len(path)):
        prev_w = path[i - 1][1]
        assert path[i][2] == max(
            c for (a, _b), c in bg.items() if a == prev_w
        )


def test_rle_layout_pandas_replay(spark):
    out = QUERIES["rle_compression_audit"](spark, SF).toPandas()
    li = load_table(spark, SF, "lineitem").toPandas()
    import numpy as np
    import pandas as pd

    df = pd.DataFrame(
        {
            "okey": li.l_orderkey,
            "ln": li.l_linenumber,
            "returnflag": li.l_returnflag,
            "shipday": (
                np.array(li.l_shipdate, dtype="datetime64[D]")
                - np.datetime64("1970-01-01", "D")
            ).astype(np.int64),
            "qty": li.l_quantity.astype(np.int64),
        }
    )
    widths = {"returnflag": 1, "shipday": 4, "qty": 8}

    def runs(d, part, order):
        d = d.sort_values(order).reset_index(drop=True)
        res = {}
        for c in widths:
            prev = d.groupby(part)[c].shift(1)
            res[c] = int(((d[c] != prev) | prev.isna()).sum())
        return res

    df["shard"] = df.okey // max(1, 4096)
    df["bkt"] = df.shipday // 32
    nat = runs(df, "shard", ["shard", "okey", "ln", "returnflag", "shipday", "qty"])
    bys = runs(df, "bkt", ["bkt", "shipday", "okey", "ln", "returnflag", "qty"])
    for r in out.itertuples():
        exp = (nat if r.layout == "natural" else bys)[r.col]
        assert r.n_runs == exp
        w = widths[r.col]
        assert r.est_rle_bytes == exp * (w + 4)
        assert r.raw_bytes == len(df) * w
        assert r.compression_ratio == (len(df) * w) / (exp * (w + 4))
    o = out.set_index(["layout", "col"])
    # the trade-off story: shipdate sort crushes the date column's runs
    # and degrades the orderkey-clustered quantity not at all (qty is
    # random either way), while returnflag stays ~incompressible
    # (at sf0.001 the floor is #distinct days ~ 2300, so the factor is
    # ~2.6x; at sf0.01 it's 24x)
    assert (
        o.loc[("by_shipdate", "shipday")].n_runs
        < o.loc[("natural", "shipday")].n_runs / 2
    )


def test_beam_search_python_replay(spark):
    from amorphous_mapreduce_spark.functions.intlog import LOG2_LUT, LOG2_SCALE
    from amorphous_mapreduce_spark.operators.dedup import tokenized
    from amorphous_mapreduce_spark.queries.lm_queries import (
        BEAM_K,
        BEAM_STEPS,
    )

    def ilog(c):
        e = c.bit_length() - 1
        return e * LOG2_SCALE + LOG2_LUT[(c * 256) // (1 << e) - 256]

    toks = tokenized(load_table(spark, SF, "documents")).collect()
    by_doc = defaultdict(dict)
    for t in toks:
        by_doc[t.id][t.pos] = t.word
    bg = Counter()
    for doc in by_doc.values():
        for p, w in doc.items():
            nxt = doc.get(p + 1)
            if nxt is not None:
                bg[(w, nxt)] += 1
    outflow = Counter()
    nbrs = defaultdict(list)
    for (a, b), c in bg.items():
        outflow[a] += c
        nbrs[a].append((b, c))
    start = min(outflow, key=lambda w: (-outflow[w], w))
    beam = [(start, start, 0)]
    for _ in range(BEAM_STEPS):
        cands = []
        for path, word, score in beam:
            for b, c in nbrs[word]:
                cands.append(
                    (path + " " + b, b, score + ilog(c) - ilog(outflow[word]))
                )
        cands.sort(key=lambda t: (-t[2], t[0]))
        beam = cands[:BEAM_K]
    out = QUERIES["beam_search_decode"](spark, SF).toPandas()
    got = [(r.path, r.last_word, r.score_q) for r in out.itertuples()]
    assert got == beam
    # beam dominance: the top beam's score is >= the greedy path score
    greedy = QUERIES["greedy_lm_decode"](spark, SF).toPandas()
    gw = list(greedy.word)
    gscore = sum(
        ilog(bg[(gw[i], gw[i + 1])]) - ilog(outflow[gw[i]])
        for i in range(len(gw) - 1)
    )
    assert beam[0][2] >= gscore
    for r in out.itertuples():
        assert r.total_bits == -r.score_q / LOG2_SCALE


def test_edge_support_python_replay(spark):
    from amorphous_mapreduce_spark.operators.dedup import minhash_lsh_pairs

    docs = load_table(spark, SF, "documents")
    pairs = [
        (r.qid, r.nid)
        for r in minhash_lsh_pairs(docs, num_hashes=16, band_bits=4).collect()
    ]
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    hist = Counter(len(adj[a] & adj[b]) for a, b in pairs)
    out = QUERIES["near_dup_edge_support"](spark, SF).toPandas()
    got = {r.support: r.n_edges for r in out.itertuples()}
    assert got == dict(hist)
    for r in out.itertuples():
        assert r.in_3truss == (r.support >= 1)
    assert out.n_edges.sum() == len(pairs)
