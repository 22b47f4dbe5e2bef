"""Plan/trace export — the reference's op-trace artifact (G14), Spark-style."""

from amorphous_mapreduce_spark.plans.trace import explain_str, plan_to_json

__all__ = ["explain_str", "plan_to_json"]
