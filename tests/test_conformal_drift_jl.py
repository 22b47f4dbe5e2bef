"""Conformal intervals, PSI drift, source modularity, JL distortion:
independent Python/numpy replays (imports via queries_registry)."""

from __future__ import annotations

import hashlib
import math

import pytest

from amorphous_mapreduce_spark.queries_registry import QUERIES
from amorphous_mapreduce_spark.sources import load_table


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_conformal_replay_and_coverage(spark, sf_dir):
    row = QUERIES["conformal_price_intervals"](spark, sf_dir).collect()[0]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .collect()
    )
    tr, ca, te = [], [], []
    for r in li:
        s = _h(f"conf:{r.l_orderkey}:{r.l_linenumber}") % 4
        obs = (
            float(r.l_quantity),
            round(float(r.l_extendedprice) * 100),
            r.l_orderkey,
            r.l_linenumber,
        )
        (tr if s <= 1 else ca if s == 2 else te).append(obs)
    n = len(tr)
    sx = sum(x for x, *_ in tr)
    sy = sum(y for _, y, *_ in tr)
    sxx = sum(x * x for x, *_ in tr)
    sxy = sum(x * y for x, y, *_ in tr)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    assert row.n_train == n and row.n_calib == len(ca) and row.n_test == len(te)
    assert row.slope == pytest.approx(slope, rel=1e-12)
    assert row.intercept == pytest.approx(intercept, rel=1e-12)
    res = sorted(
        (abs(y - (row.intercept + row.slope * x)), k1, k2) for x, y, k1, k2 in ca
    )
    k = (9 * (len(ca) + 1) + 9) // 10
    assert row.qhat_cents == pytest.approx(res[k - 1][0], abs=1e-9)
    covered = sum(
        1
        for x, y, *_ in te
        if abs(y - (row.intercept + row.slope * x)) <= row.qhat_cents
    )
    assert row.n_covered == covered
    # split-conformal guarantee holds in expectation; allow small-n slack
    assert row.coverage > 0.85


def test_psi_replay(spark, sf_dir):
    from amorphous_mapreduce_spark.functions.intlog import LOG2_LUT, LOG2_SCALE

    def l(c: int) -> int:
        e = c.bit_length() - 1
        return e * LOG2_SCALE + LOG2_LUT[(c * 256) // (1 << e) - 256]

    row = QUERIES["psi_value_stability"](spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select("ts", "value")
        .collect()
    )
    from collections import Counter
    from datetime import datetime

    cut = datetime(2024, 1, 16)
    c1: Counter = Counter()
    c2: Counter = Counter()
    for r in ev:
        b = round(float(r.value) * 100) // 500
        (c1 if r.ts.replace(tzinfo=None) < cut else c2)[b] += 1
    n1, n2 = sum(c1.values()), sum(c2.values())
    assert (row.n1, row.n2) == (n1, n2)
    psi = 0
    for b in set(c1) | set(c2):
        dp = (c1[b] * LOG2_SCALE) // n1 - (c2[b] * LOG2_SCALE) // n2
        lr = l(c1[b] + 1) - l(n1 + 1024) - l(c2[b] + 1) + l(n2 + 1024)
        psi += dp * lr
    assert row.psi_scaled == psi
    assert row.psi_bits == pytest.approx(psi / LOG2_SCALE**2, abs=1e-15)


def test_modularity_consistency(spark, sf_dir):
    rows = QUERIES["near_dup_source_modularity"](spark, sf_dir).collect()
    assert rows, "graph should be non-empty at test SFs"
    two_m = sum(r.deg_sum for r in rows)
    assert two_m % 2 == 0
    m = two_m // 2
    assert sum(r.internal_edges for r in rows) <= m
    q = sum(r.q_contrib for r in rows)
    assert -1.0 <= q <= 1.0
    for r in rows:
        expect = (4 * m * r.internal_edges - r.deg_sum**2) / (4 * m * m)
        assert r.q_contrib == pytest.approx(expect, abs=1e-15)
        assert 0 < r.n_nodes and r.internal_edges * 2 <= r.deg_sum


def test_jl_distortion_replay(spark, sf_dir):
    import numpy as np

    from amorphous_mapreduce_spark.queries.pipeline_queries import JL_SIGNS

    rows = QUERIES["jl_projection_distortion"](spark, sf_dir).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    qs = {}
    for vid, v in emb.items():
        s = np.abs(v).max()
        if s > 0:
            qs[vid] = np.trunc(v / s * 127.0).astype(np.int64)
    signs = np.array(JL_SIGNS, dtype=np.int64)
    got = {r.off: r for r in rows}
    for off in (1, 7, 131):
        so = sp = npair = 0
        mx, mn = -math.inf, math.inf
        for vid, qa in qs.items():
            qb = qs.get(vid + off)
            if qb is None:
                continue
            d2o = int(((qa - qb) ** 2).sum())
            if d2o == 0:
                continue
            ya, yb = signs @ qa, signs @ qb
            d2p = int(((ya - yb) ** 2).sum())
            so += d2o
            sp += d2p
            npair += 1
            ratio = d2p / (8.0 * d2o)
            mx, mn = max(mx, ratio), min(mn, ratio)
        r = got[off]
        assert (r.n_pairs, r.sum_d2_orig, r.sum_d2_proj) == (npair, so, sp)
        assert r.ratio_of_sums == pytest.approx(sp / (8.0 * so), rel=1e-12)
        assert r.max_ratio == pytest.approx(mx, rel=1e-12)
        assert r.min_ratio == pytest.approx(mn, rel=1e-12)
        # JL with k=8 is loose but the aggregate should be near-isometric
        assert 0.5 < r.ratio_of_sums < 2.0
