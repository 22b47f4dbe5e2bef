from __future__ import annotations

import json

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.plans import explain_str, plan_to_json
from amorphous_mapreduce_spark.sources import load_table


def test_plan_to_json_op_list(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_quantity") > 10).groupBy("l_returnflag").count()
    doc = json.loads(plan_to_json(df, plan="optimizedPlan"))
    ops = doc["op_list"]
    assert ops, "empty op list"
    names = {o["op"] for o in ops}
    assert "Aggregate" in names
    # dependency edges reference valid indices (the reference's op DAG
    # contract: deps point at already-emitted ops, src/op.rs:15-16)
    idxs = {o["index"] for o in ops}
    assert all(d in idxs for o in ops for d in o["dependency"])


def test_plan_pushdown_visible(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.filter(F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")).select(
        "l_orderkey", "l_quantity"
    )
    plan = explain_str(df)
    assert "PushedFilters" in plan
    # column pruning: the scan must not read all 11 lineitem columns
    assert "ReadSchema" in plan


def test_executed_plan_has_wholestage_codegen(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    df = li.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    df.collect()
    plan = explain_str(df, "simple")
    # '*(n)' marks whole-stage-codegen spans in the AQE final plan
    assert "*(" in plan or "WholeStageCodegen" in plan
