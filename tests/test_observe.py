"""Observation-API instrumentation: metrics arrive as a side effect of
the materializing action, with no extra scan."""

from __future__ import annotations

from amorphous_mapreduce_spark.plans.observe import observed_stage
from amorphous_mapreduce_spark.sources import load_table


def test_observed_stage_counts_match(spark, sf_dir):
    from amorphous_mapreduce_spark.operators.pipeline import quality_rules

    q = quality_rules(load_table(spark, sf_dir, "documents"))
    inst, obs = observed_stage(q, "quality", flag_col="rules_pass", mass_col="n_words")
    rows = inst.collect()  # the action that populates the observation
    got = obs.get
    assert got["n_rows"] == len(rows)
    assert got["n_flagged"] == sum(1 for r in rows if not r.rules_pass)
    assert got["total_mass"] == sum(r.n_words for r in rows)


def test_observation_is_single_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    inst, obs = observed_stage(df, "scan_probe")
    plan = inst._jdf.queryExecution().optimizedPlan().toString()
    # CollectMetrics rides the existing plan; no extra scan node appears
    assert plan.count("Relation") == df._jdf.queryExecution().optimizedPlan().toString().count("Relation")
    assert "CollectMetrics" in plan
    n = inst.count()
    assert obs.get["n_rows"] == n
