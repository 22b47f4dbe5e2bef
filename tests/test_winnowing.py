"""Winnowing fingerprint invariants: selection density, the match
guarantee, and brute-force parity at sf0.001."""

from __future__ import annotations

import hashlib

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.queries.dedup_queries import (
    WINNOW_MIN_SHARED,
    WINNOW_W,
)
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _norm_tokens(text: str) -> list[str]:
    return [w for w in " ".join(text.lower().split()).split(" ") if w]


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _winnow(text: str) -> set:
    ws = _norm_tokens(text)
    hs = [_h(" ".join(ws[i : i + 3])) for i in range(len(ws) - 2)]
    sel = set()
    for e in range(WINNOW_W - 1, len(hs)):
        win = hs[e - WINNOW_W + 1 : e + 1]
        m = min(win)
        # min-position tie-break
        p = (e - WINNOW_W + 1) + win.index(m)
        sel.add((p, m))
    return {h for _, h in sel}


def test_winnowing_pairs_bruteforce(spark):
    out = QUERIES["winnowing_fingerprint_pairs"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    fps = {r.doc_id: _winnow(r.text) for r in docs.itertuples()}
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            shared = len(fps[a] & fps[b])
            if shared >= WINNOW_MIN_SHARED:
                want[(a, b)] = shared
    got = {(r.qid, r.nid): r.n_shared_fp for r in out.itertuples()}
    assert got == want


def test_winnowing_density_and_guarantee(spark):
    docs = load_table(spark, SF, "documents").toPandas()
    long_docs = [r.text for r in docs.itertuples() if len(_norm_tokens(r.text)) > 40]
    assert long_docs
    for t in long_docs[:10]:
        n_sh = len(_norm_tokens(t)) - 2
        fp = _winnow(t)
        # winnowing keeps roughly 2/(W+1) of shingles, never more than
        # one per window start
        assert 0 < len(fp) <= n_sh
        assert len(fp) <= n_sh - WINNOW_W + 1 + 1
    # match guarantee: two docs sharing a run of >= W + 2 tokens share
    # a fingerprint (hashes in the shared run line up identically)
    base = _norm_tokens(long_docs[0])
    run = base[5 : 5 + WINNOW_W + 5]
    doc_a = " ".join(["alpha beta gamma"] + run + ["delta epsilon zeta"])
    doc_b = " ".join(["one two three four"] + run + ["five six seven"])
    assert _winnow(doc_a) & _winnow(doc_b)
