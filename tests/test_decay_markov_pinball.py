"""Batch-19 invariants: decayed leaderboard, Markov next-event holdout,
pinball-loss scoreboard — pure-Python replays at sf0.001."""

from __future__ import annotations

import datetime
from collections import Counter, defaultdict

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"
EPOCH = datetime.date(1970, 1, 1)


def test_decayed_leaderboard_python_replay(spark):
    li = load_table(spark, SF, "lineitem").select(
        "l_partkey", "l_shipdate"
    ).collect()
    days = [((r.l_shipdate.date() - EPOCH).days, r.l_partkey) for r in li]
    t_now = max(d for d, _ in days)
    raw, dec = Counter(), Counter()
    for d, pk in days:
        raw[pk] += 1
        dec[pk] += (1 << 40) >> ((t_now - d) // 180)
    top = sorted(dec.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    out = QUERIES["decayed_part_leaderboard"](spark, SF).toPandas()
    assert [(r.partkey, r.decayed_scaled) for r in out.itertuples()] == top
    for r in out.itertuples():
        assert r.raw_cnt == raw[r.partkey]
        expect_rank = 1 + sum(
            1
            for pk, c in raw.items()
            if c > r.raw_cnt or (c == r.raw_cnt and pk < r.partkey)
        )
        assert r.raw_rank == expect_rank
        # decayed score can never exceed the undecayed dyadic max
        assert r.decayed_scaled <= r.raw_cnt * (1 << 40)


def test_markov_next_event_python_replay(spark):
    ev = load_table(spark, SF, "events").collect()
    by_user = defaultdict(list)
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        by_user[r.user_id].append((us, r.event_id, r.event_type))
    split = 19738
    train, test = Counter(), []
    for seq in by_user.values():
        seq.sort()
        for (u1, _, t1), (u2, _, t2) in zip(seq, seq[1:]):
            if u2 // 86_400_000_000 < split:
                train[(t1, t2)] += 1
            else:
                test.append((t1, t2))
    # argmax with (count desc, type asc) tie-break
    by_prev = defaultdict(dict)
    for (p, n), c in train.items():
        by_prev[p][n] = c
    pred = {
        p: min(d, key=lambda n: (-d[n], n)) for p, d in by_prev.items()
    }
    stats = defaultdict(lambda: [0, 0])
    for p, n in test:
        if p in pred:
            stats[p][0] += 1
            stats[p][1] += 1 if n == pred[p] else 0

    out = QUERIES["markov_next_event_accuracy"](spark, SF).toPandas()
    assert {r.prev for r in out.itertuples()} == set(stats)
    for r in out.itertuples():
        assert r.predicted == pred[r.prev]
        assert (r.n_test, r.n_correct) == tuple(stats[r.prev])
        assert abs(r.accuracy - r.n_correct / r.n_test) < 1e-15


def test_pinball_python_replay(spark):
    orders = load_table(spark, "/root/testdata/sf0.01", "orders").collect()
    daily = Counter()
    for r in orders:
        daily[(r.o_orderdate.date() - EPOCH).days] += round(
            r.o_totalprice * 100
        )
    fc = []
    for d, y in daily.items():
        if d - 7 in daily:
            fc.append(("naive7", y, daily[d - 7]))
        prev = [daily.get(d - o) for o in range(1, 8)]
        if all(p is not None for p in prev):
            fc.append(("ma7", y, sum(prev) // 7))
    expect = {}
    for q in (2, 10, 18):
        for model in ("naive7", "ma7"):
            rows = [(y, f) for m, y, f in fc if m == model]
            l20 = sum(
                q * (y - f) if y - f >= 0 else (q - 20) * (y - f)
                for y, f in rows
            )
            expect[(model, q)] = (len(rows), l20)

    out = QUERIES["forecast_pinball_loss"](
        spark, "/root/testdata/sf0.01"
    ).toPandas()
    assert len(out) == 6
    for r in out.itertuples():
        n, l20 = expect[(r.model, r.q20)]
        assert (r.n_days, r.loss20_total) == (n, l20)
        assert abs(r.mean_loss_cents - l20 / (20.0 * n)) < 1e-9
        assert r.loss20_total >= 0
