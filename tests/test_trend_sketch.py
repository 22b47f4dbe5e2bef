"""Batch-15 invariants: Misra-Gries summary, Mann-Kendall, periodogram —
verified against pure-Python replays at sf0.001."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _mg_reduce(counts: dict, k: int) -> tuple[dict, int]:
    """Canonical order-free Misra-Gries reduce: subtract the (k+1)-th
    largest count, keep positive. Returns (summary, t)."""
    if len(counts) <= k:
        return dict(counts), 0
    t = sorted(counts.values(), reverse=True)[k]
    return {w: c - t for w, c in counts.items() if c > t}, t


def _h64(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_misra_gries_python_replay(spark):
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    k = 12
    toks = tokenized(load_table(spark, SF, "documents")).collect()
    shard_counts: dict[int, Counter] = defaultdict(Counter)
    exact: Counter = Counter()
    for t in toks:
        shard_counts[_h64(f"mg_{t.id}") % 8][t.word] += 1
        exact[t.word] += 1
    merged: Counter = Counter()
    t_sum = 0
    for sc in shard_counts.values():
        summary, t = _mg_reduce(sc, k)
        t_sum += t
        for w, c in summary.items():
            merged[w] += c
    final, big_t = _mg_reduce(dict(merged), k)
    bound = t_sum + big_t

    out = QUERIES["misra_gries_heavy_hitters"](spark, SF).toPandas()
    assert len(out) == 15
    top15 = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert list(zip(out.word, out.exact_count)) == top15
    for r in out.itertuples():
        assert r.mg_est == final.get(r.word, 0)
        assert r.err_bound == bound
        # the MG guarantee: exact - Σt <= est <= exact
        assert 0 <= r.underestimate <= bound
        assert bool(r.within_bound)
    # capacity respected: at most k words survive the final reduce
    assert len(final) <= k
    # heavy hitters with exact > bound are guaranteed present
    for w, c in exact.items():
        if c > bound:
            assert final.get(w, 0) > 0


def test_mann_kendall_python_replay(spark):
    li = load_table(spark, SF, "lineitem").collect()
    part = {
        r.p_partkey: r.p_brand for r in load_table(spark, SF, "part").collect()
    }
    monthly: Counter = Counter()
    for r in li:
        cc = round(r.l_extendedprice * 100) * (100 - round(r.l_discount * 100))
        mi = r.l_shipdate.year * 12 + r.l_shipdate.month
        monthly[(part[r.l_partkey], mi)] += cc
    by_brand: dict[str, list] = defaultdict(list)
    for (b, mi), x in monthly.items():
        by_brand[b].append((mi, x))
    out = QUERIES["mann_kendall_trend"](spark, SF).toPandas()
    assert set(out.brand) == set(by_brand)
    for r in out.itertuples():
        xs = [x for _, x in sorted(by_brand[r.brand])]
        n = len(xs)
        s = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = Counter(xs)
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        assert r.n_months == n
        assert r.s_stat == s
        assert r.var18 == var18
        if s == 0:
            assert r.z_stat == 0.0
        else:
            z = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
            assert abs(r.z_stat - z) < 1e-12
        expected = (
            "increasing"
            if r.z_stat > 1.96
            else "decreasing" if r.z_stat < -1.96 else "none"
        )
        assert r.trend == expected


def test_periodogram_python_replay(spark):
    from amorphous_mapreduce_spark.queries.trend_queries import (
        _COS_LUT,
        _SIN_LUT,
        _TRIG_SCALE,
    )

    orders = load_table(spark, SF, "orders").collect()
    daily: Counter = Counter()
    for r in orders:
        day = (r.o_orderdate.date() - __import__("datetime").date(1970, 1, 1)).days
        daily[day] += round(r.o_totalprice * 100)
    mu = sum(daily.values()) // len(daily)
    dev = {d: c - mu for d, c in daily.items()}

    out = QUERIES["periodogram_weekly_power"](spark, SF).toPandas()
    assert list(out.period) == [7, 30]
    assert abs(out.power_share.sum() - 1.0) < 1e-12
    for r in out.itertuples():
        p = r.period
        a = sum(y * _COS_LUT[p][d % p] for d, y in dev.items())
        b = sum(y * _SIN_LUT[p][d % p] for d, y in dev.items())
        assert r.a_i == a and r.b_i == b
        power = (a / _TRIG_SCALE) ** 2 + (b / _TRIG_SCALE) ** 2
        assert r.n_days == len(dev)
        assert abs(r.power - power) <= 1e-9 * max(power, 1.0)
        assert r.power >= 0.0
