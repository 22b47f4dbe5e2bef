"""Invariants for the round-4 closing additions (statistical properties
a hash-match can't express). Registry import first — circular-chain
gotcha."""

from __future__ import annotations

import math

from amorphous_mapreduce_spark.queries_registry import QUERIES


def test_auc_in_unit_interval_and_gini_identity(spark, sf_dir):
    r = QUERIES["auc_dup_quality"](spark, sf_dir).collect()[0]
    if r["auc"] is not None:
        assert 0.0 <= r["auc"] <= 1.0
        assert math.isclose(r["gini"], 2 * r["auc"] - 1.0, rel_tol=1e-12)
    assert r["n_pos"] + r["n_neg"] > 0


def test_holt_first_day_state_and_forecast(spark, sf_dir):
    rows = QUERIES["holt_linear_daily"](spark, sf_dir).collect()
    assert rows
    first = {}
    for r in rows:
        if r["seg"] not in first or r["epoch_day"] < first[r["seg"]]["epoch_day"]:
            first[r["seg"]] = r
    for r in first.values():
        # level initializes at the first observation, trend at zero
        assert r["trend_q"] == 0
        assert r["level_q"] == r["day_cents"] * 1048576
        assert r["forecast_7d_cents"] == r["day_cents"]


def test_lindley_backlog_recursion(spark, sf_dir):
    rows = QUERIES["lindley_queue_backlog"](spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        series.sort(key=lambda r: r["epoch_day"])
        w = 0
        for r in series:
            w = max(0, w + r["arrivals"] - r["capacity"])
            assert r["backlog"] == w
            assert r["queued"] == (w > 0)


def test_bradley_terry_strengths_positive_and_ordered(spark, sf_dir):
    rows = QUERIES["bradley_terry_brands"](spark, sf_dir).collect()
    assert len(rows) == 25
    strengths = [r["strength_q"] for r in rows]
    assert all(s > 0 for s in strengths)
    assert strengths == sorted(strengths, reverse=True)


def test_ljung_box_autocorr_bounds(spark, sf_dir):
    rows = QUERIES["ljung_box_weekly"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.000001 <= r["autocorr"] <= 1.000001
        assert r["lb_q"] >= 0.0
    lags = sorted({r["lag"] for r in rows})
    assert lags == [1, 2, 3, 4, 5, 6, 7]


def test_sppmi_embedding_scale_bound(spark, sf_dir):
    rows = QUERIES["sppmi_rank1_embedding"](spark, sf_dir).collect()
    assert rows
    # rescale keeps max |v| within ~2x the fixed-point target
    assert max(abs(r["v_q"]) for r in rows) <= 4096 * 2
    assert all(r["pair_count"] > 0 for r in rows)


def test_dbscan_classes_partition_points(spark, sf_dir):
    rows = QUERIES["dbscan_point_classes"](spark, sf_dir).collect()
    labels = {r["label"] for r in rows}
    assert labels <= {"core", "border", "noise"}
    by = {r["label"]: r for r in rows}
    if "core" in by:
        # core points have at least minPts neighbors on average
        assert by["core"]["sum_degree"] >= 4 * by["core"]["n_points"]


def test_kdist_knee_consistent(spark, sf_dir):
    r = QUERIES["kdist_knee_eps"](spark, sf_dir).collect()[0]
    assert 1 <= r["knee_rank"] <= r["n"]
    assert r["eps_suggest"] == math.sqrt(r["knee_kd2"])
    assert r["score"] >= 0
