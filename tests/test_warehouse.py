"""Warehouse battery invariants (queries/warehouse_queries.py) —
semantic properties the oracle hash can't express, cross-checked by
brute force at sf0.001."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import QUERIES
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_scd2_intervals_partition_each_user_timeline(spark):
    out = QUERIES["scd2_user_state"](spark, SF).toPandas()
    ev = load_table(spark, SF, "events").toPandas()
    counts = ev.groupby("user_id").size()
    got = out.groupby("user_id").n_events.sum()
    assert got.to_dict() == counts.to_dict()
    for _, g in out.groupby("user_id"):
        g = g.sort_values("valid_from_us")
        # exactly one open interval per user, and it is the last one
        assert g.valid_to_us.isna().sum() == 1
        assert pd.isna(g.valid_to_us.iloc[-1])
        # intervals chain: each valid_to equals the next valid_from
        closed = g.valid_to_us.iloc[:-1].astype("int64").tolist()
        nxt = g.valid_from_us.iloc[1:].astype("int64").tolist()
        assert closed == nxt
        # consecutive intervals never share a state (else they'd merge)
        states = g.event_type.tolist()
        assert all(a != b for a, b in zip(states, states[1:]))


def test_skyline_is_a_true_pareto_frontier(spark):
    sky = QUERIES["part_skyline"](spark, SF).toPandas()
    parts = load_table(spark, SF, "part").toPandas()

    def dominates(a, b):
        return (
            a.p_retailprice <= b.p_retailprice
            and a.p_size >= b.p_size
            and (a.p_retailprice < b.p_retailprice or a.p_size > b.p_size)
        )

    for brand, g in parts.groupby("p_brand"):
        fr = sky[sky.p_brand == brand]
        assert len(fr) >= 1
        rows = list(g.itertuples())
        fr_rows = list(fr.itertuples())
        # no frontier point dominates another
        for a in fr_rows:
            assert not any(dominates(b, a) for b in fr_rows if b.p_partkey != a.p_partkey)
        # every part is on the frontier or dominated by a frontier part
        fr_keys = set(fr.p_partkey)
        for b in rows:
            if b.p_partkey not in fr_keys:
                assert any(dominates(a, b) for a in fr_rows)


def test_ma7_equals_window_formulation(spark):
    out = QUERIES["daily_revenue_ma7"](spark, SF).toPandas()
    daily = (
        out[["ddate", "day_revenue"]]
        .sort_values("ddate")
        .reset_index(drop=True)
        .set_index("ddate")
    )
    rolling = daily.day_revenue.rolling("7D").sum()
    got = out.set_index("ddate").rev_7d
    assert (rolling - got.reindex(rolling.index)).abs().max() < 1e-6


def test_incremental_rollup_equals_full_recompute(spark):
    out = QUERIES["incremental_daily_rollup"](spark, SF).toPandas()
    ev = load_table(spark, SF, "events")
    full = (
        ev.groupBy(F.col("ts").cast("date").cast("timestamp").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            F.count("*").alias("n_events"),
        )
        .toPandas()
    )
    merged = out.sort_values("day").reset_index(drop=True)
    full = full.sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        merged[["day", "sum_value", "n_events"]],
        full[["day", "sum_value", "n_events"]],
        check_dtype=False,
    )


def test_peak_concurrency_matches_bruteforce(spark):
    out = {
        r.day_idx: r.peak_concurrency
        for r in QUERIES["peak_concurrent_sessions"](spark, SF).collect()
    }
    ev = (
        load_table(spark, SF, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .toPandas()
        .sort_values(["user_id", "us", "event_id"])
    )
    # brute-force sessionize + sweep
    spans = []
    for _, g in ev.groupby("user_id"):
        start = prev = None
        for us in g.us:
            if prev is None or us - prev > 1_800_000_000:
                if start is not None:
                    spans.append((start, prev + 1))
                start = us
            prev = us
        spans.append((start, prev + 1))
    bounds = sorted(
        [(s, -1) for s, _ in spans] + [(e, 1) for _, e in spans]
    )  # delta encoded so starts (-1 flag) sort before ends at equal time
    level = 0
    peak_by_day = {}
    for us, tag in bounds:
        day = us // 86_400_000_000
        if day not in peak_by_day:
            # level standing since the previous event spans this day's
            # start — the query's carry term
            peak_by_day[day] = level
        level += 1 if tag == -1 else -1
        peak_by_day[day] = max(peak_by_day[day], level)
    # query only reports days with boundary events; compare those
    for day, peak in out.items():
        assert peak_by_day.get(day) == peak, (day, peak, peak_by_day.get(day))


def test_revenue_waterfall_identity(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = QUERIES["revenue_waterfall"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # the PVM bridge is an algebraic identity: vol + price == delta
        assert abs(r.volume_effect + r.price_effect - r.delta) <= 1e-6 * max(
            1.0, abs(r.delta)
        )


def test_leaderboard_churn_invariants(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = QUERIES["leaderboard_churn"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        # partial first/last months can have < 10 ranked parts
        assert 1 <= r.n_entered + r.n_stayed <= 10
        assert r.rank_shift_stayed <= 9 * r.n_stayed


def test_hierarchy_rollup_root_is_grand_total(spark):
    from amorphous_mapreduce_spark.queries.warehouse_queries import (
        q_hierarchy_rollup,
    )
    from amorphous_mapreduce_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = {r.node: r for r in q_hierarchy_rollup(spark, sf).collect()}
    orders = load_table(spark, sf, "orders")
    from pyspark.sql import functions as F

    exp = orders.select(
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
        "o_custkey",
    )
    total = exp.agg(F.sum("cents")).collect()[0][0]
    n_cust = exp.select("o_custkey").distinct().count()
    assert rows[0].subtree_cents == total
    assert rows[0].n_descendants == n_cust


def test_weekday_count_formula():
    import datetime

    from amorphous_mapreduce_spark.queries.warehouse_queries import _BIZ_W

    def g(d):
        return 5 * (d // 7) + _BIZ_W[d % 7]

    # brute-force check over 4 weeks against python weekday()
    for d in range(200):
        want = sum(
            1
            for k in range(d)
            if (datetime.date(1970, 1, 1) + datetime.timedelta(days=k)).weekday() < 5
        )
        assert g(d) == want, d


def test_bitmap_popcount_matches_distinct_days(spark):
    from pyspark.sql import functions as F

    from amorphous_mapreduce_spark.queries.analytics_queries import (
        q_user_day_bitmaps,
    )
    from amorphous_mapreduce_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    hist = q_user_day_bitmaps(spark, sf).collect()
    ev = load_table(spark, sf, "events").select(
        "user_id",
        (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
        .cast("long")
        .alias("d"),
    )
    per_user = ev.distinct().groupBy("user_id").count()
    want = {
        r["count"]: r["n"]
        for r in per_user.groupBy("count").agg(F.count("*").alias("n")).collect()
    }
    got = {r.n_active_days: r.n_users for r in hist}
    assert got == want


def test_fd_profile_key_fd_holds(spark):
    from amorphous_mapreduce_spark.queries.dq_queries import q_fd_profile

    rows = {r.fd: r for r in q_fd_profile(spark, "/root/testdata/sf0.001").collect()}
    # a key FD can never be violated
    assert rows["c_custkey->c_nationkey"].n_violating == 0
    # behavioural "FD" fails for most active users
    assert rows["user_id->event_type"].n_violating > 0


def test_frequent_triples_subpairs_frequent(spark):
    from amorphous_mapreduce_spark.queries.analytics_queries import (
        TRIPLES_MINSUP,
        q_frequent_part_triples,
    )
    from amorphous_mapreduce_spark.sources import load_table
    from pyspark.sql import functions as F
    import collections

    sf = "/root/testdata/sf0.001"
    tri = q_frequent_part_triples(spark, sf).collect()
    items = (
        load_table(spark, sf, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        .collect()
    )
    baskets = collections.defaultdict(set)
    for r in items:
        baskets[r.o].add(r.p)
    for r in tri:
        assert r.p1 < r.p2 < r.p3
        # recount support by brute force
        sup = sum(
            1
            for s in baskets.values()
            if r.p1 in s and r.p2 in s and r.p3 in s
        )
        assert sup == r.support >= TRIPLES_MINSUP


def test_abc_xyz_partition_of_parts(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES
    from amorphous_mapreduce_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["abc_xyz_matrix"](spark, sf).collect()
    n_parts = sum(r.n_parts for r in rows)
    distinct_parts = (
        load_table(spark, sf, "lineitem").select("l_partkey").distinct().count()
    )
    assert n_parts == distinct_parts
    for r in rows:
        assert r.abc in ("A", "B", "C") and r.xyz in ("X", "Y", "Z")


def test_brand_reigns_cover_all_days(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES
    from amorphous_mapreduce_spark.sources import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["brand_reign_streaks"](spark, sf).collect()
    total_days = sum(r.n_days_on_top for r in rows)
    n_days = (
        load_table(spark, sf, "lineitem")
        .select(
            (
                F.unix_micros(F.col("l_shipdate").cast("timestamp"))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("d")
        )
        .distinct()
        .count()
    )
    assert total_days == n_days
    for r in rows:
        assert 1 <= r.longest_reign <= r.n_days_on_top
        assert r.n_reigns >= 1


def test_hierarchy_share_in_unit_interval(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = QUERIES["hierarchy_share_of_parent"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    for r in rows:
        assert r.parent == r.node // 10
        assert 0.0 < r.share_of_parent <= 1.0
        assert r.subtree_cents <= r.parent_cents
