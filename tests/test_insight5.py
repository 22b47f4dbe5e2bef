"""Batch-5 invariants: Chao1 richness, capture-recapture, Little's law
— brute-forced at sf0.001."""

from __future__ import annotations

from collections import Counter

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _norm_tokens(text: str) -> list[str]:
    return [w for w in " ".join(text.lower().split()).split(" ") if w]


def test_chao1_bruteforce(spark):
    out = QUERIES["chao1_vocab_richness"](spark, SF).toPandas()
    docs = load_table(spark, SF, "documents").toPandas()
    for src, grp in docs.groupby("source"):
        tf = Counter(w for t in grp.text for w in _norm_tokens(t))
        f1 = sum(1 for v in tf.values() if v == 1)
        f2 = sum(1 for v in tf.values() if v == 2)
        r = out[out.source == src].iloc[0]
        assert (r.v_obs, r.f1, r.f2) == (len(tf), f1, f2)
        assert r.chao1_est == len(tf) + (f1 * f1) / (2 * (f2 + 1))
        assert r.good_turing_coverage == 1.0 - f1 / sum(tf.values())
        # Chao1 never below the observed vocabulary
        assert r.chao1_est >= r.v_obs


def test_capture_recapture_bruteforce(spark):
    out = QUERIES["capture_recapture_actives"](spark, SF).toPandas().iloc[0]
    ev = load_table(spark, SF, "events").toPandas()
    us = ev.ts.astype("int64") // 1000
    mid2 = us.min() + us.max()
    first = set(ev.user_id[us * 2 < mid2])
    second = set(ev.user_id[us * 2 >= mid2])
    n1, n2, m = len(first), len(second), len(first & second)
    assert (out.n1, out.n2, out.m_both) == (n1, n2, m)
    assert out.n_true == len(first | second)
    assert out.chapman_est == (n1 + 1) * (n2 + 1) / (m + 1) - 1.0
    # Chapman is consistent: with near-total overlap it lands near truth
    assert abs(out.chapman_est - out.n_true) <= max(3, 0.5 * out.n_true)


def test_littles_law_identity_and_bruteforce(spark):
    out = QUERIES["littles_law_audit"](spark, SF).toPandas().iloc[0]
    assert bool(out.matches) is True
    ev = load_table(spark, SF, "events").toPandas()
    ev["us"] = ev.ts.astype("int64") // 1000
    n_sessions = 0
    total = 0
    t0, t1 = None, None
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        start = prev = None
        for u in g.us:
            if prev is None or u - prev > 1_800_000_000:
                if start is not None:
                    total += prev + 1 - start
                    n_sessions += 1
                    t1 = max(t1 or 0, prev + 1)
                start = u
                t0 = start if t0 is None else min(t0, start)
            prev = u
        total += prev + 1 - start
        n_sessions += 1
        t1 = max(t1 or 0, prev + 1)
    assert out.n_sessions == n_sessions
    assert out.total_dur_us == total
    assert out.sweep_integral_us == total
    assert out.horizon_us == t1 - t0
    assert out.w_mean_s == total / (n_sessions * 1_000_000)
    assert out.l_avg_concurrency == total / (t1 - t0)
    # Little's law in the exact integers: L * horizon == lambda*W*horizon
    assert out.lambda_per_hour * out.w_mean_s / 3600 != 0
