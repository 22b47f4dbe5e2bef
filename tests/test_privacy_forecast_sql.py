"""t-closeness, pinball backtest, hierarchical reconcile, SQL LATERAL:
replays and invariants (imports via queries_registry)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from amorphous_mapreduce_spark.queries_registry import QUERIES
from amorphous_mapreduce_spark.sources import load_table


def test_t_closeness_replay(spark, sf_dir):
    rows = QUERIES["t_closeness_audit"](spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer").collect()
    import math

    per: dict[tuple, Counter] = defaultdict(Counter)
    glob: Counter = Counter()
    for c in cust:
        b = math.floor(round(float(c.c_acctbal) * 100) / 100000)
        per[(c.c_nationkey, c.c_mktsegment)][b] += 1
        glob[b] += 1
    bands = sorted(glob)
    ng, nb = sum(glob.values()), len(bands)
    scored = []
    for (nat, seg), cnt in per.items():
        nc = sum(cnt.values())
        ccum = gcum = emd = 0
        for b in bands:
            ccum += cnt[b]
            gcum += glob[b]
            emd += abs(ng * ccum - nc * gcum)
        scored.append((emd / (nc * ng * (nb - 1)), nat, seg, nc, emd))
    scored.sort(key=lambda t: (-t[0], t[1], t[2]))
    got = [(r.nationkey, r.mktsegment, r.n_rows, r.emd_scaled) for r in rows]
    want = [(nat, seg, nc, emd) for _, nat, seg, nc, emd in scored[: len(rows)]]
    assert got == want
    for r, s in zip(rows, scored):
        assert r.t_value == pytest.approx(s[0], abs=1e-15)
        assert 0.0 <= r.t_value <= 1.0


def test_pinball_calibration(spark, sf_dir):
    rows = {r.quantile: r for r in QUERIES["quantile_forecast_pinball"](spark, sf_dir).collect()}
    assert set(rows) == {"p10", "p50", "p90"}
    n = {r.n_test_days for r in rows.values()}
    assert len(n) == 1  # every quantile scores the same holdout
    # coverage must be monotone in the quantile level and loosely calibrated
    assert rows["p10"].coverage < rows["p50"].coverage < rows["p90"].coverage
    assert rows["p10"].coverage < 0.5 < rows["p90"].coverage
    for r in rows.values():
        assert r.mean_pinball_cents > 0


def test_hierarchical_reconcile_coherence(spark, sf_dir):
    rows = QUERIES["hierarchical_forecast_reconcile"](spark, sf_dir).collect()
    assert len(rows) == 25
    by_region: dict[int, list] = defaultdict(list)
    for r in rows:
        by_region[r.region].append(r)
        assert r.abs_err_bu == pytest.approx(
            abs(r.forecast_bu_cents - r.actual_2001_cents)
        )
        assert r.abs_err_td == pytest.approx(
            abs(r.forecast_td_cents - r.actual_2001_cents)
        )
    for region, rs in by_region.items():
        bu = sum(r.forecast_bu_cents for r in rs)
        td = sum(r.forecast_td_cents for r in rs)
        # both methods are coherent: they sum to the same region forecast
        assert td == pytest.approx(bu, rel=1e-9)


def test_sql_lateral_topn_is_per_customer_top2(spark, sf_dir):
    rows = QUERIES["sql_lateral_topn"](spark, sf_dir).collect()
    per: dict[int, list] = defaultdict(list)
    for r in rows:
        per[r.custkey].append(r)
    cust = {
        c.c_custkey: float(c.c_acctbal)
        for c in load_table(spark, sf_dir, "customer").collect()
    }
    orders = defaultdict(list)
    for o in load_table(spark, sf_dir, "orders").collect():
        orders[o.o_custkey].append(
            (round(float(o.o_totalprice) * 100), o.o_orderkey)
        )
    for ck, rs in per.items():
        assert cust[ck] > 9000
        assert len(rs) <= 2
        want = sorted(((-c, k) for c, k in orders[ck]))[: len(rs)]
        got = sorted(((-r.order_cents, r.orderkey) for r in rs))
        assert got == want
    # no high-balance customer with orders is missing
    for ck, bal in cust.items():
        if bal > 9000 and orders[ck]:
            assert ck in per


def test_ivf_probe_sweep_monotone(spark, sf_dir):
    rows = QUERIES["ivf_probe_sweep"](spark, sf_dir).collect()
    assert [r.n_probe for r in rows] == [1, 2, 3, 4]
    for a, b in zip(rows, rows[1:]):
        # more probes can only add candidates and recall
        assert a.n_candidates <= b.n_candidates
        assert a.n_hits <= b.n_hits
        assert a.n_exact == b.n_exact
    for r in rows:
        assert 0.0 <= r.recall <= 1.0
        assert r.recall == pytest.approx(r.n_hits / r.n_exact)
    # the full 4-probe setting must match the registered ivf recall query
    full = QUERIES["similarity_ivf_recall"](spark, sf_dir).collect()[0]
    assert rows[-1].n_hits == full.n_hits and rows[-1].n_exact == full.n_exact
