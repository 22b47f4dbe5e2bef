"""Batch-16 invariants: weighted sampling manifest, isotonic PAVA fit,
SAX motifs — verified against pure-Python replays at sf0.001."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _log2_scaled(c: int) -> int:
    from amorphous_mapreduce_spark.functions.intlog import LOG2_LUT, LOG2_SCALE

    e = c.bit_length() - 1
    idx = (c * 256) // (1 << e) - 256
    return e * LOG2_SCALE + LOG2_LUT[idx]


def test_weighted_sample_python_replay(spark):
    import re

    docs = load_table(spark, SF, "documents").collect()
    keyed = []
    for d in docs:
        norm = re.sub(r"\s+", " ", d.text.strip().lower())
        w = len(norm.split(" ")) if norm else 1
        u = int(hashlib.md5(f"ws_{d.doc_id}".encode()).hexdigest()[:13], 16) + 1
        key = ((52 * 1048576 - _log2_scaled(u)) * 1048576) // w
        keyed.append((key, d.doc_id, d.source, w))
    keyed.sort()
    expect = keyed[:64]

    out = QUERIES["weighted_sample_manifest"](spark, SF).toPandas()
    got = sorted(
        (r.key_q, r.doc_id, r.source, r.w_tokens) for r in out.itertuples()
    )
    assert got == expect
    # E-S property: every key is non-negative and the sample leans heavy
    # (median sampled weight >= corpus median — near-certain at k=64)
    assert all(k >= 0 for k, *_ in got)
    all_w = sorted(w for *_, w in keyed)
    got_w = sorted(w for *_, w in got)
    assert got_w[len(got_w) // 2] >= all_w[len(all_w) // 2]


def test_isotonic_python_replay(spark):
    li = load_table(spark, SF, "lineitem").collect()
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        b = round(r.l_discount * 100)
        agg[b][0] += 1
        agg[b][1] += 1 if r.l_returnflag == "R" else 0
    bins = sorted(agg)
    mq = {}
    for i in bins:
        for j in bins:
            if i <= j:
                sw = sum(agg[b][0] for b in bins if i <= b <= j)
                sy = sum(agg[b][1] for b in bins if i <= b <= j)
                mq[(i, j)] = (1048576 * sy) // sw
    fit = {
        k: max(
            min(m for (i2, j), m in mq.items() if i2 == i and j >= k)
            for i in bins
            if i <= k
        )
        for k in bins
    }
    out = QUERIES["isotonic_return_rate"](spark, SF).toPandas()
    assert list(out.bin) == bins
    prev = None
    for r in out.itertuples():
        assert r.n == agg[r.bin][0] and r.pos == agg[r.bin][1]
        assert r.raw_q == (1048576 * r.pos) // r.n
        assert r.iso_q == fit[r.bin]
        assert abs(r.iso_rate - r.iso_q / 1048576.0) < 1e-15
        # PAVA output must be monotone non-decreasing in the score
        if prev is not None:
            assert r.iso_q >= prev
        assert bool(r.monotone_ok) == (prev is None or r.iso_q >= prev)
        prev = r.iso_q
    # the fit stays inside the observed rate range
    raws = [(1048576 * agg[b][1]) // agg[b][0] for b in bins]
    assert min(raws) <= min(out.iso_q) and max(out.iso_q) <= max(raws)


def test_sax_python_replay(spark):
    # sf0.001's daily grid is too sparse for complete weeks — replay at
    # sf0.01 where the calendar is dense (15k orders, still collect-safe).
    orders = load_table(spark, "/root/testdata/sf0.01", "orders").collect()
    daily = Counter()
    for r in orders:
        day = (
            r.o_orderdate.date() - __import__("datetime").date(1970, 1, 1)
        ).days
        daily[day] += round(r.o_totalprice * 100)
    weeks = defaultdict(list)
    for d, c in daily.items():
        weeks[d // 7].append(c)
    weekly = {w: sum(v) for w, v in weeks.items() if len(v) == 7}
    n = len(weekly)
    order = sorted(weekly.items(), key=lambda kv: (kv[1], kv[0]))
    sym = {
        w: "abcd"[(4 * rank) // n] for rank, (w, _) in enumerate(order)
    }
    words = Counter()
    first = {}
    for w in weekly:
        if all(w + o in sym for o in range(4)):
            word = "".join(sym[w + o] for o in range(4))
            words[word] += 1
            first[word] = min(first.get(word, 10**9), w)
    top = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:12]
    mx = max(words.values())
    nd = sum(1 for c in words.values() if c == 1)

    out = QUERIES["sax_weekly_motifs"](spark, "/root/testdata/sf0.01").toPandas()
    assert [(r.word, r.cnt) for r in out.itertuples()] == top
    for r in out.itertuples():
        assert r.first_week == first[r.word]
        assert bool(r.is_motif) == (r.cnt == mx)
        assert r.n_discords == nd
        assert set(r.word) <= set("abcd") and len(r.word) == 4
