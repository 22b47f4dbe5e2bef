"""Export a DataFrame's query plan as JSON — the engine's G14 analog.

The reference's observable artifact is a dependency-ordered op DAG dumped
to JSON (src/main.rs:17-25; envelope schema src/op.rs:50-63). Spark already
maintains that DAG — the analyzed/optimized/physical plans — so the export
here is a walk over ``df._jdf.queryExecution()`` rather than hand-built
dependency lists. Each node record carries {index, op, children, details},
mirroring the reference's {index, op, dependency, op_content} envelope.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame


def _walk(node: Any, out: list[dict[str, Any]], counter: list[int]) -> int:
    """DFS over a JVM TreeNode; returns this node's index in ``out``."""
    idx = counter[0]
    counter[0] += 1
    children = [node.apply(i) for i in range(node.numChildren())]
    child_ids = [_walk(c, out, counter) for c in children]
    out.append(
        {
            "index": idx,
            "op": node.nodeName(),
            "dependency": child_ids,
            "op_content": node.simpleStringWithNodeId()
            if hasattr(node, "simpleStringWithNodeId")
            else node.simpleString(100),
        }
    )
    return idx


def plan_to_json(df: DataFrame, plan: str = "executedPlan") -> str:
    """JSON op-list for one of the plan stages.

    ``plan``: 'logical' | 'analyzed' | 'optimizedPlan' | 'sparkPlan' |
    'executedPlan'. Falls back to Spark's own toJSON for full fidelity if
    the node walk hits a JVM surface change.
    """
    qe = df._jdf.queryExecution()
    node = {
        "logical": qe.logical,
        "analyzed": qe.analyzed,
        "optimizedPlan": qe.optimizedPlan,
        "sparkPlan": qe.sparkPlan,
        "executedPlan": qe.executedPlan,
    }[plan]()
    try:
        ops: list[dict[str, Any]] = []
        _walk(node, ops, [0])
        return json.dumps({"plan": plan, "op_list": ops}, indent=2)
    except Exception:
        return node.toJSON()


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain text as a string (explain() only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )
