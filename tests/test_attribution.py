"""Attribution model invariants (queries/analytics_queries.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries.analytics_queries import (
    q_events_attribution,
)
from amorphous_mapreduce_spark.sources import load_table


def test_attribution_conserves_purchases_and_value(spark, sf_dir):
    rows = q_events_attribution(spark, sf_dir).collect()
    models = {r.model for r in rows}
    assert models == {"last_touch", "first_touch"}
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
    )
    n = purchases.count()
    total = purchases.select(
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
    ).collect()[0][0]
    for m in models:
        mrows = [r for r in rows if r.model == m]
        # every purchase is credited exactly once per model
        assert sum(r.n_purchases for r in mrows) == n
        assert abs(sum(r.credited_value for r in mrows) - total) < 1e-6
        assert {r.channel for r in mrows} <= {"click", "view", "direct"}


def test_attribution_channels_differ_between_models(spark, sf_dir):
    rows = q_events_attribution(spark, sf_dir).collect()
    by = {(r.model, r.channel): r.n_purchases for r in rows}
    # direct credit must be identical across models (no touch = no touch
    # in both), and touched purchases split differently in general
    assert by.get(("last_touch", "direct"), 0) == by.get(
        ("first_touch", "direct"), 0
    )


def test_recommend_parts_excludes_owned(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    recs = QUERIES["recommend_parts"](spark, sf_dir)
    owned = (
        load_table(spark, sf_dir, "lineitem")
        .join(
            load_table(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("cust"),
            F.col("l_partkey").alias("rec_part"),
        )
        .distinct()
    )
    # no recommendation may already be owned
    assert recs.join(owned, ["cust", "rec_part"]).count() == 0
    rows = recs.collect()
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r.cust, []).append(r)
    for cust, rs in per_cust.items():
        assert len(rs) <= 3
        ranked = sorted(rs, key=lambda r: r.rnk)
        scores = [r.score for r in ranked]
        assert scores == sorted(scores, reverse=True)


def test_benford_chi_terms_consistent(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = QUERIES["benford_audit"](spark, sf_dir).collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    n = sum(r.n_obs for r in rows)
    assert abs(sum(r.expected for r in rows) - n) < 1e-6 * n
    for r in rows:
        assert r.chi_term >= 0


def test_value_band_pairs_matches_bruteforce(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    got = {
        (r.type_a, r.type_b): r.n_pairs
        for r in QUERIES["value_band_pairs"](spark, sf_dir).collect()
    }
    ev = [
        (r.event_id, r.event_type, round(r.value * 100))
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .collect()
    ]
    import collections

    by_cents = collections.defaultdict(list)
    for eid, et, c in ev:
        by_cents[c].append((eid, et))
    want = collections.Counter()
    for eid, et, c in ev:
        for cb in (c - 1, c, c + 1):
            for oid, ot in by_cents.get(cb, ()):
                if eid < oid:
                    want[(et, ot)] += 1
    assert got == dict(want)


def test_recsys_backtest_consistency(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    r = QUERIES["recsys_backtest_mrr"](spark, sf_dir).collect()[0]
    assert r.n_test_purchases > 0
    assert 0 <= r.n_hits_at_10 <= r.n_test_purchases
    # each hit contributes between 2520/10 and 2520/1
    assert 252 * r.n_hits_at_10 <= r.mrr_scaled_sum <= 2520 * r.n_hits_at_10


def test_pareto_abc_partitions_revenue(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = {r.abc_class: r for r in QUERIES["pareto_abc_classes"](
        spark, sf_dir
    ).collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r.class_rev_cents for r in rows.values())
    # A holds at most 80% of revenue mass (cross-multiplied edge), and
    # A+B at most 95%; both are non-empty on any non-degenerate corpus
    assert rows["A"].class_rev_cents * 100 <= total * 80
    assert (rows["A"].class_rev_cents + rows["B"].class_rev_cents) * 100 <= total * 95
    # fixture revenue is near-uniform across parts, so class sizes track
    # the revenue edges rather than a real-world Pareto tail — just
    # check the classes partition the catalog
    n_parts = (
        load_table(spark, sf_dir, "lineitem").select("l_partkey").distinct().count()
    )
    assert sum(r.n_parts for r in rows.values()) == n_parts


def test_markov_removal_effects_sane(spark):
    from amorphous_mapreduce_spark.queries.analytics_queries import (
        _MRK_SCALE,
        q_markov_removal_attribution,
    )

    rows = {
        r.variant: r
        for r in q_markov_removal_attribution(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    full = rows["full"]
    assert full.removal_effect is None
    assert full.conv_scaled > 0
    # mass conservation: absorbed mass never exceeds the START mass and
    # most of it is absorbed after 12 steps (truncation + transient loss)
    for v, r in rows.items():
        assert 0 <= r.conv_scaled + r.null_scaled <= _MRK_SCALE
        assert r.conv_scaled + r.null_scaled >= 0.9 * _MRK_SCALE
        if v != "full":
            # knocking out a channel can only lose conversion mass
            assert r.conv_scaled <= full.conv_scaled
            assert 0.0 <= r.removal_effect <= 1.0


def test_shapley_efficiency_axiom(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    r = QUERIES["shapley_channel_attribution"](
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    # efficiency: shares sum to v(grand coalition) - v(empty)
    total = r.shapley_click + r.shapley_view
    assert abs(total - (r.r11 - r.r00)) < 1e-12
    for v in (r.r00, r.r10, r.r01, r.r11):
        assert v is None or 0.0 <= v <= 1.0
