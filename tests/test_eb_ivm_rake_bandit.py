"""EB shrinkage, IVM proof, RAKE, bandit replay: Python replays and
invariants (imports via queries_registry)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pytest

from amorphous_mapreduce_spark.queries_registry import QUERIES
from amorphous_mapreduce_spark.sources import load_table


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_eb_shrinkage_properties(spark, sf_dir):
    rows = QUERIES["eb_return_rate_shrinkage"](spark, sf_dir).collect()
    assert rows
    a, b = rows[0].alpha, rows[0].beta
    assert a > 0 and b > 0
    mu = a / (a + b)
    for r in rows:
        assert (r.alpha, r.beta) == (a, b)
        assert r.posterior_rate == pytest.approx(
            (r.k + a) / (r.n + a + b), rel=1e-12
        )
        # shrinkage: posterior sits strictly between raw rate and prior mean
        lo, hi = sorted((r.raw_rate, mu))
        assert lo - 1e-12 <= r.posterior_rate <= hi + 1e-12
    posts = [r.posterior_rate for r in rows]
    assert posts == sorted(posts, reverse=True)


def test_ivm_proof_holds(spark, sf_dir):
    rows = QUERIES["incremental_agg_maintenance"](spark, sf_dir).collect()
    assert len(rows) == 6  # 3 returnflags x 2 linestatus
    for r in rows:
        assert r.matches is True
        assert r.n_full == r.n_incr
        assert r.sum_qty_full == r.sum_qty_incr
        assert r.sum_cents_full == r.sum_cents_incr


def test_rake_replay(spark, sf_dir):
    from amorphous_mapreduce_spark.operators.text_analysis import STOPWORDS

    rows = QUERIES["rake_keyphrases"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").collect()
    stop = set(STOPWORDS)
    phrases = []
    for d in docs:
        toks = [
            w
            for w in re.sub(r"\s+", " ", d.text.strip().lower()).split(" ")
            if w
        ]
        run: list[str] = []
        for w in toks + ["the"]:  # sentinel stopword flushes the last run
            if w in stop:
                if 1 <= len(run) <= 4:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
    freq: Counter = Counter()
    deg: Counter = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    scored: dict[tuple, int] = {}
    occ: Counter = Counter()
    for p in phrases:
        occ[p] += 1
        scored[p] = sum((deg[w] * 1048576) // freq[w] for w in p)
    top = sorted(scored.items(), key=lambda kv: (-kv[1], " ".join(kv[0])))
    got = [(r.phrase, r.score_scaled, r.n_occurrences) for r in rows]
    want = [(" ".join(p), s, occ[p]) for p, s in top[: len(rows)]]
    assert got == want


def test_bandit_replay_consistency(spark, sf_dir):
    rows = QUERIES["bandit_replay_eval"](spark, sf_dir).collect()
    assert [r.arm for r in rows] == [0, 1, 2]
    ev = load_table(spark, sf_dir, "events").collect()
    views = [e for e in ev if e.event_type == "view"]
    n_per_arm = Counter(_h(f"arm:{e.event_id}") % 3 for e in views)
    clicks = defaultdict(list)
    for e in ev:
        if e.event_type == "click":
            clicks[e.user_id].append(e.ts)
    for r in rows:
        assert r.n_views == n_per_arm[r.arm]
        assert 0 <= r.n_matched_rewarded <= r.n_matched <= r.n_views
        assert r.logged_ctr == pytest.approx(r.n_rewarded / r.n_views)
        if r.n_matched:
            assert r.replay_ctr == pytest.approx(
                r.n_matched_rewarded / r.n_matched
            )
    # uniform logging: arms should split views roughly evenly
    tot = sum(r.n_views for r in rows)
    for r in rows:
        assert r.n_views > tot / 6


def test_kfold_cv_replay(spark, sf_dir):
    import numpy as np

    rows = QUERIES["kfold_cv_price_model"](spark, sf_dir).collect()
    assert [r.fold for r in rows] == [0, 1, 2, 3]
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .collect()
    )
    folds = defaultdict(list)
    for r in li:
        f = _h(f"cv:{r.l_orderkey}:{r.l_linenumber}") % 4
        folds[f].append((float(r.l_quantity), round(float(r.l_extendedprice) * 100)))
    for r in rows:
        train = [o for f, obs in folds.items() if f != r.fold for o in obs]
        test = folds[r.fold]
        assert (r.n_train, r.n_test) == (len(train), len(test))
        X = np.column_stack([np.ones(len(train)), [x for x, _ in train]])
        y = np.array([v for _, v in train])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert r.intercept == pytest.approx(beta[0], rel=1e-9)
        assert r.slope == pytest.approx(beta[1], rel=1e-9)
        pred = np.array([r.intercept + r.slope * x for x, _ in test])
        rmse = float(np.sqrt(((np.array([v for _, v in test]) - pred) ** 2).mean()))
        assert r.rmse_cents == pytest.approx(rmse, rel=1e-9)


def test_fisher_index_properties(spark, sf_dir):
    rows = QUERIES["fisher_price_index"](spark, sf_dir).collect()
    assert rows and all(r.yr != 1995 for r in rows)
    for r in rows:
        assert r.n_matched_parts > 0
        assert 0 < r.laspeyres and 0 < r.paasche
        lo, hi = sorted((r.laspeyres, r.paasche))
        # Fisher is the geometric mean: strictly between its factors
        assert lo - 1e-12 <= r.fisher <= hi + 1e-12
        assert r.fisher == pytest.approx(
            (r.laspeyres * r.paasche) ** 0.5, rel=1e-12
        )


def test_croston_replay(spark, sf_dir):
    rows = QUERIES["croston_intermittent_demand"](spark, sf_dir).collect()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_shipdate", "l_quantity")
        .collect()
    )
    dd: dict[int, Counter] = defaultdict(Counter)
    for r in li:
        dd[r.l_partkey][r.l_shipdate.date()] += int(r.l_quantity)
    scored = []
    for part, days in dd.items():
        if len(days) <= 8:
            continue
        ordered = sorted(days, reverse=True)[:9]
        z = sum(days[d] * (1 << (8 - j)) for j, d in enumerate(ordered[:8], 1))
        p = sum(
            (ordered[j] - ordered[j + 1]).days * (1 << (7 - (j + 1)))
            for j in range(0, 7)
        )
        scored.append((z * 127.0 / (255.0 * p), part, len(days), z, p))
    scored.sort(key=lambda t: (-t[0], t[1]))
    got = [(r.part, r.n_events, r.z_scaled, r.p_scaled) for r in rows]
    want = [(part, n, z, p) for _, part, n, z, p in scored[: len(rows)]]
    assert got == want
    for r, s in zip(rows, scored):
        assert r.demand_per_day == pytest.approx(s[0], rel=1e-12)


def test_design_effect_replay(spark, sf_dir):
    r = QUERIES["cluster_design_effect"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").filter(
        "event_type = 'purchase'"
    ).collect()
    w = Counter(e.user_id for e in ev)
    s1 = sum(w.values())
    s2 = sum(v * v for v in w.values())
    assert (r.n_users, r.n_purchases) == (len(w), s1)
    assert r.effective_sample_size == pytest.approx(s1 * s1 / s2, rel=1e-12)
    assert r.design_effect == pytest.approx(s1 * s2 / (s1 * s1), rel=1e-12)
    # ESS can never exceed the raw count; deff never drops below 1
    assert r.effective_sample_size <= s1 and r.design_effect >= 1.0
