from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def registry():
    return entrymod.queries()


def test_registry_oracle_coverage(registry):
    # Every oracle key must have a query; queries without oracles are the
    # explicitly allowed non-SQL-expressible ops.
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(registry)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier",
        "topk_customers_per_nation",
        "events_sessionize",
    ],
)
def test_queries_smoke(spark, sf_dir, registry, name):
    df = registry[name](spark, sf_dir)
    assert df.count() >= 0  # executes without error at smoke SF
    assert len(df.columns) > 0


def test_q1_group_keys_unique(spark, sf_dir, registry):
    df = registry["q1_pricing_summary"](spark, sf_dir)
    assert df.groupBy("l_returnflag", "l_linestatus").count().filter(
        F.col("count") > 1
    ).count() == 0


def test_q5_broadcast_in_plan(spark, sf_dir, registry):
    from amorphous_mapreduce_spark.plans import explain_str

    plan = explain_str(registry["q5_local_supplier"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # dims must broadcast, not shuffle


def test_topk_rank_bounds(spark, sf_dir, registry):
    rows = registry["topk_customers_per_nation"](spark, sf_dir).collect()
    assert all(1 <= r["rnk"] <= 3 for r in rows)


def test_basket_rules_bounds(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = QUERIES["basket_part_pairs"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.pa < r.pb
        assert r.ab >= 2
        assert 0.0 < r.confidence <= 1.0
        assert r.ab <= min(r.sup_a, r.sup_b)
        assert r.lift > 0.0


def test_sql_frontend_plans_semi_join_with_pushdown(spark):
    """The raw-SQL EXISTS query decorrelates to a semi join and pushes
    the literal filters to the lineitem scan."""
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    df = QUERIES["sql_returned_supplier_counts"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert "PushedFilters" in plan and "l_returnflag" in plan


def test_sql_frontend_concentration_shares_bounded(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    out = QUERIES["sql_revenue_concentration"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert (out.top20_revenue <= out.total_revenue + 1e-9).all()
    assert (out.top20_revenue >= 0).all()
    # top-20% of customers should hold at least a proportional share
    frac = out.top20_revenue / out.total_revenue
    assert (frac[out.n_customers >= 5] >= 0.15).all()


def test_recursive_sql_hops_match_bfs_bruteforce(spark):
    """The shared recursive SQL computes true shortest hops over the
    top-2-out-edge transition graph."""
    from collections import deque

    from pyspark.sql import functions as F

    from amorphous_mapreduce_spark.queries_registry import QUERIES
    from amorphous_mapreduce_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    out = {r.node: r.hops
           for r in QUERIES["sql_funnel_reachability"](spark, sf).collect()}

    ev = load_table(spark, sf, "events").toPandas()
    ev["node"] = ev.event_type + "_" + (ev.value / 120).apply(
        lambda v: str(int(v // 1))
    )
    trans = {}
    for _, g in ev.sort_values("event_id").groupby("user_id"):
        ns = list(g.node)
        for a, b in zip(ns, ns[1:]):
            if a != b:
                trans[(a, b)] = trans.get((a, b), 0) + 1
    edges = {}
    for (a, b), w in trans.items():
        edges.setdefault(a, []).append((-w, b))
    adj = {a: [b for _, b in sorted(lst)[:2]] for a, lst in edges.items()}
    dist = {"signup_0": 0}
    dq = deque(["signup_0"])
    while dq:
        cur = dq.popleft()
        if dist[cur] >= 10:
            continue
        for nxt in adj.get(cur, []):
            if nxt not in dist:
                dist[nxt] = dist[cur] + 1
                dq.append(nxt)
    assert out == dist


def test_session_gap_sensitivity_monotone(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = sorted(
        QUERIES["session_gap_sensitivity"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.gap_minutes,
    )
    assert [r.gap_minutes for r in rows] == [5, 15, 30, 60]
    sessions = [r.n_sessions for r in rows]
    # longer timeouts merge sessions: counts weakly decrease
    assert sessions == sorted(sessions, reverse=True)
    for r in rows:
        assert r.n_sessions >= r.n_users  # each user has >= 1 session
