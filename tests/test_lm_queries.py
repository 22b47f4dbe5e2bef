"""LM-scoring battery: intlog kernel bounds + independent Python replays
of surprisal / DSIR / cross-entropy (imports via queries_registry — the
circular-import convention)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pytest

from amorphous_mapreduce_spark.functions.intlog import (
    LOG2_LUT,
    LOG2_SCALE,
    log2_scaled,
)
from amorphous_mapreduce_spark.queries_registry import QUERIES
from amorphous_mapreduce_spark.sources import load_table


def _l(c: int) -> int:
    """Pure-Python replica of the intlog kernel."""
    e = c.bit_length() - 1
    idx = (c * 256) // (1 << e) - 256
    return e * LOG2_SCALE + LOG2_LUT[idx]


def _toks(text: str) -> list[str]:
    return [w for w in re.sub(r"\s+", " ", text.strip().lower()).split(" ") if w]


def test_intlog_bounds_and_spark_parity(spark):
    vals = [1, 2, 3, 7, 255, 256, 511, 4097, 10**6 + 3, 2**40 + 99, 2**54]
    for c in vals:
        exact = LOG2_SCALE * math.log2(c)
        assert 0 <= exact - _l(c) < LOG2_SCALE * math.log2(1 + 1 / 256) + 1
    df = spark.createDataFrame([(v,) for v in vals], "c long")
    got = {r.c: r.l for r in df.select("c", log2_scaled("c").alias("l")).collect()}
    assert got == {v: _l(v) for v in vals}


def test_surprisal_replay(spark, sf_dir):
    rows = QUERIES["unigram_surprisal_filter"](spark, sf_dir).collect()
    docs = {
        r.doc_id: _toks(r.text)
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    cw = Counter(w for ts in docs.values() for w in ts)
    n_tok = sum(cw.values())
    scored = []
    for did, ts in docs.items():
        num = _l(n_tok) * len(ts) - sum(_l(cw[w]) for w in ts)
        scored.append((num / (len(ts) * LOG2_SCALE), did, len(ts), num))
    scored.sort(key=lambda t: (-t[0], t[1]))
    assert [(r.id, r.n_tokens, r.surprisal_scaled) for r in rows] == [
        (d, n, num) for _, d, n, num in scored[: len(rows)]
    ]
    for r, (bits, *_rest) in zip(rows, scored):
        assert r.mean_bits == pytest.approx(bits, abs=1e-12)
        # mean surprisal of a real doc sits in a sane band
        assert 0.0 < r.mean_bits < 64.0


def test_xent_matrix_replay(spark, sf_dir):
    rows = QUERIES["lang_cross_entropy_matrix"](spark, sf_dir).collect()
    doc_rows = load_table(spark, sf_dir, "documents").collect()
    cl: dict[str, Counter] = defaultdict(Counter)
    for r in doc_rows:
        cl[r.lang].update(_toks(r.text))
    vocab = len({w for c in cl.values() for w in c})
    got = {(r.train_lang, r.eval_lang): r for r in rows}
    assert len(rows) == len(cl) ** 2
    for t, ct in cl.items():
        n_t = sum(ct.values())
        for e, ce in cl.items():
            t_e = sum(ce.values())
            num = _l(n_t + vocab) * t_e - sum(
                tf * _l(ct[w] + 1) for w, tf in ce.items()
            )
            r = got[(t, e)]
            assert r.eval_tokens == t_e
            assert r.cross_entropy_bits == pytest.approx(
                num / (t_e * LOG2_SCALE), abs=1e-12
            )
    # in-domain beats every transfer: diagonal is the row-wise minimum
    for e in cl:
        diag = got[(e, e)].cross_entropy_bits
        for t in cl:
            if t != e:
                assert diag <= got[(t, e)].cross_entropy_bits


def test_dsir_weights_replay(spark, sf_dir):
    import hashlib

    rows = QUERIES["dsir_importance_weights"](spark, sf_dir).collect()
    doc_rows = load_table(spark, sf_dir, "documents").collect()

    def bucket(w: str) -> int:
        return int(hashlib.md5(f"dsir:{w}".encode()).hexdigest()[:15], 16) % 512

    ct: Counter = Counter()
    cr: Counter = Counter()
    pool: dict[int, list[int]] = {}
    for r in doc_rows:
        bs = [bucket(w) for w in _toks(r.text)]
        cr.update(bs)
        if r.lang != "en":
            ct.update(bs)
        else:
            pool[r.doc_id] = bs
    nt, nr = sum(ct.values()), sum(cr.values())
    base = _l(nt + 512) - _l(nr + 512)
    scored = []
    for did, bs in pool.items():
        num = sum(_l(ct[b] + 1) - _l(cr[b] + 1) for b in bs) - len(bs) * base
        scored.append((num / (len(bs) * LOG2_SCALE), did, len(bs), num))
    scored.sort(key=lambda t: (-t[0], t[1]))
    assert [(r.id, r.n_tokens, r.weight_scaled) for r in rows] == [
        (d, n, num) for _, d, n, num in scored[: len(rows)]
    ]
