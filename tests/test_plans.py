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
    names = {o["op"]["class"] for o in ops}
    assert "Aggregate" in names
    # dependency edges reference valid indices (the reference's op DAG
    # contract: deps point at already-emitted ops, src/op.rs:15-16)
    idxs = {o["index"] for o in ops}
    assert all(d in idxs for o in ops for d in o["dependency"])


def test_trace_envelope_matches_reference_schema(spark, sf_dir):
    """Every exported node carries exactly the reference's envelope fields
    {index, module, dependency, op, op_content} (src/op.rs:50-63), deps
    point only at already-emitted indices (children-first emission,
    src/op.rs:15-16), and module is "global" iff the op is a movement op
    (TransOp envelopes hardcode module="global", src/op.rs:51)."""
    li = load_table(spark, sf_dir, "lineitem")
    ords = load_table(spark, sf_dir, "orders")
    df = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    df.collect()
    ops = json.loads(plan_to_json(df, plan="executedPlan"))["op_list"]
    for o in ops:
        assert set(o) == {"index", "module", "dependency", "op", "op_content"}
        assert all(d < o["index"] for d in o["dependency"])
        assert (o["module"] == "global") == (o["op"]["category"] == "TransOp")
        assert o["op_content"]["name"] == o["op"]["class"]


def test_trace_categories_cover_reference_ir(spark, sf_dir):
    """A scan->join->aggregate plan exercises all three reference IR
    classes (SURVEY.md §2.1): TransOp (scan/exchange movement), CrossPOp
    (the pairing fan-out), VecOp (elementwise/accumulate compute) — and
    the classifier puts the canonical Spark nodes in the right class."""
    from amorphous_mapreduce_spark.plans.trace import op_category

    li = load_table(spark, sf_dir, "lineitem")
    ords = load_table(spark, sf_dir, "orders")
    df = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    # sparkPlan: the pre-AQE physical plan serializes the whole tree
    # (AQE query stages hide their subtrees from toJSON).
    ops = json.loads(plan_to_json(df, plan="sparkPlan"))["op_list"]
    cats = {o["op"]["category"] for o in ops}
    assert cats == {"TransOp", "CrossPOp", "VecOp"}
    assert op_category("ShuffleExchangeExec") == "TransOp"
    assert op_category("BroadcastHashJoinExec") == "CrossPOp"
    assert op_category("SortMergeJoinExec") == "CrossPOp"
    assert op_category("HashAggregateExec") == "VecOp"
    assert op_category("ProjectExec") == "VecOp"


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
