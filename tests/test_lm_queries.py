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


def test_loo_influence_replay(spark, sf_dir):
    rows = {r.source: r for r in QUERIES["loo_source_influence"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").collect()
    cw: Counter = Counter()
    per_src: dict[str, list] = defaultdict(list)
    for d in docs:
        ts = _toks(d.text)
        cw.update(ts)
        per_src[d.source].extend(ts)
    n_tok = sum(cw.values())
    bits_all = t_all = 0
    per = {}
    for s, ts in per_src.items():
        b = sum(_l(n_tok) - _l(cw[w]) for w in ts)
        per[s] = (len(ts), b)
        bits_all += b
        t_all += len(ts)
    for s, (t_s, b_s) in per.items():
        r = rows[s]
        assert r.n_tokens == t_s
        assert r.source_mean_bits == pytest.approx(
            b_s / (t_s * LOG2_SCALE), abs=1e-12
        )
        want = (bits_all - b_s) / ((t_all - t_s) * LOG2_SCALE) - bits_all / (
            t_all * LOG2_SCALE
        )
        assert r.loo_influence_bits == pytest.approx(want, abs=1e-12)
    # influences telescope around zero: mass-weighted mean shift is bounded
    assert sum(rows[s].loo_influence_bits for s in rows) == pytest.approx(
        sum(
            (bits_all - b) / ((t_all - t) * LOG2_SCALE)
            for t, b in per.values()
        )
        - len(per) * bits_all / (t_all * LOG2_SCALE),
        abs=1e-9,
    )


def test_smd_balance_replay(spark, sf_dir):
    rows = {r.covariate: r for r in QUERIES["smd_covariate_balance"](spark, sf_dir).collect()}
    assert set(rows) == {"n_events", "n_types", "purchase_cents"}
    ev = load_table(spark, sf_dir, "events").collect()
    per: dict[int, dict] = {}
    for e in ev:
        u = per.setdefault(
            e.user_id, {"n_events": 0, "purchase_cents": 0, "types": set()}
        )
        u["n_events"] += 1
        u["types"].add(e.event_type)
        if e.event_type == "purchase":
            u["purchase_cents"] += round(float(e.value) * 100)
    for cov in ("n_events", "n_types", "purchase_cents"):
        arms: dict[int, list[int]] = {0: [], 1: []}
        for uid, u in per.items():
            x = len(u["types"]) if cov == "n_types" else u[cov]
            arms[uid % 2].append(x)
        mt = sum(arms[0]) / len(arms[0])
        mc = sum(arms[1]) / len(arms[1])
        vt = sum(x * x for x in arms[0]) / len(arms[0]) - mt * mt
        vc = sum(x * x for x in arms[1]) / len(arms[1]) - mc * mc
        r = rows[cov]
        assert (r.n_even, r.n_odd) == (len(arms[0]), len(arms[1]))
        assert r.mean_diff == pytest.approx(mt - mc, abs=1e-9)
        if vt + vc == 0:
            assert r.smd is None
        else:
            assert r.smd == pytest.approx(
                (mt - mc) / ((vt + vc) / 2) ** 0.5, rel=1e-9
            )
