"""Batch-17 invariants: z-order layout audit, bucketed Kendall tau,
RANSAC fit — verified against pure-Python replays at small SF."""

from __future__ import annotations

import hashlib
from collections import defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _parts(spark, sf=SF):
    return [
        (r.p_partkey, int(r.p_size), round(r.p_retailprice * 100))
        for r in load_table(spark, sf, "part").collect()
    ]


def test_zorder_python_replay(spark):
    from amorphous_mapreduce_spark.queries.warehouse_queries import _ZO_PREDS

    rows = _parts(spark)
    maxpk = max(pk for pk, _, _ in rows)
    shards = defaultdict(list)
    for pk, sz, cents in rows:
        # Spark div / DuckDB // truncate toward zero (pk can be 0 in the
        # fixtures, making pk-1 negative)
        q = (pk - 1) * 64
        nat = min(63, abs(q) // maxpk * (1 if q >= 0 else -1))
        pb = min(63, max(0, (cents - 90000) // 157))
        z = 0
        for k in range(6):
            z += ((sz >> k) & 1) << (2 * k)
            z += ((pb >> k) & 1) << (2 * k + 1)
        shards[("natural", nat)].append((sz, cents))
        shards[("zorder", z // 64)].append((sz, cents))

    out = QUERIES["zorder_layout_audit"](spark, SF).toPandas()
    for r in out.itertuples():
        zs = {k: v for k, v in shards.items() if k[0] == r.layout}
        pred = next(p for p in _ZO_PREDS if p[0] == r.pred_id)
        _, slo, shi, clo, chi = pred
        skipped = {
            k
            for k, v in zs.items()
            if max(s for s, _ in v) < slo
            or min(s for s, _ in v) > shi
            or max(c for _, c in v) < clo
            or min(c for _, c in v) > chi
        }
        assert r.n_shards == len(zs)
        assert r.n_skipped == len(skipped)
        assert r.rows_skipped == sum(len(zs[k]) for k in skipped)
        matches = sum(
            1
            for _, v in zs.items()
            for s, c in v
            if slo <= s <= shi and clo <= c <= chi
        )
        assert r.n_matches == matches
        # soundness: skipped shards contain zero matching rows
        assert all(
            not any(slo <= s <= shi and clo <= c <= chi for s, c in zs[k])
            for k in skipped
        )


def test_kendall_inversions_python_replay(spark):
    rows = _parts(spark)
    n = len(rows)
    cd = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = (rows[i][2] > rows[j][2]) - (rows[i][2] < rows[j][2])
            dy = (rows[i][1] > rows[j][1]) - (rows[i][1] < rows[j][1])
            cd += dx * dy
    xc, yc = defaultdict(int), defaultdict(int)
    for _, sz, cents in rows:
        xc[cents] += 1
        yc[sz] += 1
    n1 = sum(c * (c - 1) // 2 for c in xc.values())
    n2 = sum(c * (c - 1) // 2 for c in yc.values())

    out = QUERIES["kendall_inversions_parts"](spark, SF).toPandas()
    r = out.iloc[0]
    assert r.n == n and r.n_pairs == n * (n - 1) // 2
    assert r.c_minus_d == cd
    assert r.x_tie_pairs == n1 and r.y_tie_pairs == n2
    n0 = n * (n - 1) / 2
    assert abs(r.tau_a - cd / n0) < 1e-12
    assert abs(r.tau_b - cd / ((n0 - n1) * (n0 - n2)) ** 0.5) < 1e-12


def test_ransac_python_replay(spark):
    rows = _parts(spark)
    thr = 2000 * 1048576

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    # round-7 one-pass scheme: ONE md5 per row, 64 affine slot mixes,
    # endpoint = argmin of pack = mix * 2^32 + pk (slot 2t='a', 2t+1='b')
    def endpoint(slot):
        return min(
            rows,
            key=lambda r: (
                (h(f"ransac_{r[0]}") % 2147483647 * (2 * slot + 1)
                 + slot * 12345) % 2147483647,
                r[0],
            ),
        )

    lines = {}
    for t in range(32):
        (_, xa, ya), (_, xb, yb) = endpoint(2 * t), endpoint(2 * t + 1)
        if xa == xb:
            continue
        num = (yb - ya) * 1048576
        den = xb - xa
        m_q = -((-num) // den) if (num < 0) != (den < 0) else num // den
        # ^ truncation toward zero (Spark div / DuckDB //)
        lines[t] = (m_q, ya * 1048576 - m_q * xa)
    scored = {
        t: sum(
            1
            for _, sx, yc2 in rows
            if abs(yc2 * 1048576 - (m * sx + b)) <= thr
        )
        for t, (m, b) in lines.items()
    }
    win_t = min(scored, key=lambda t: (-scored[t], t))
    m, b = lines[win_t]
    inl = [(sx, yc2) for _, sx, yc2 in rows if abs(yc2 * 1048576 - (m * sx + b)) <= thr]
    n_in = len(inl)
    s_x = sum(x for x, _ in inl)
    s_y = sum(y for _, y in inl)
    s_xy = sum(x * y for x, y in inl)
    s_xx = sum(x * x for x, _ in inl)
    slope = (n_in * s_xy - s_x * s_y) / (n_in * s_xx - s_x * s_x)

    out = QUERIES["ransac_price_fit"](spark, SF).toPandas()
    r = out.iloc[0]
    assert r.cand == win_t
    assert r.m_q == m and r.b_q == b
    assert r.n_inliers == scored[win_t] == n_in
    assert r.n_points == len(rows)
    assert abs(r.refit_slope - slope) < 1e-9 * max(abs(slope), 1.0)
    # consensus property: the winner's inlier count is the panel max
    assert scored[win_t] == max(scored.values())
