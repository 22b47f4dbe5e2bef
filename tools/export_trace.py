"""Export reference-style op traces for the flagship pipelines.

The reference's observable artifact is a dependency-ordered op DAG dumped
as pretty JSON to result/ (src/main.rs:17-25). This tool produces the
engine's analogue for the two flagship pipelines — word count and GEMM —
as {plan op_list} JSON plus an executed cost report (rows/shuffle bytes
per op, the len/complexity analog).

Usage: python tools/export_trace.py [out_dir=result]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "result")
    os.makedirs(out_dir, exist_ok=True)

    from amorphous_mapreduce_spark import get_spark
    from amorphous_mapreduce_spark.plans import plan_to_json
    from amorphous_mapreduce_spark.plans.metrics import cost_report, summarize_cost
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    spark = get_spark(app_name="trace-export")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    for name in ("wordcount", "gemm_coordinate", "gemm_block"):
        df = QUERIES[name](spark, sf_dir)
        with open(os.path.join(out_dir, f"{name}-plan.json"), "w") as f:
            f.write(plan_to_json(df, plan="optimizedPlan"))
        report = cost_report(df)
        with open(os.path.join(out_dir, f"{name}-cost.json"), "w") as f:
            json.dump(
                {"query": name, "totals": summarize_cost(report), "ops": report},
                f,
                indent=2,
            )
        print(f"{name}: {summarize_cost(report)}")
    spark.stop()


if __name__ == "__main__":
    main()
