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


def _build(
    arr: list[dict[str, Any]], pos: int, out: list[dict[str, Any]]
) -> tuple[int, int]:
    """Rebuild the tree from Spark's preorder toJSON array.

    Returns (index of this node in ``out``, next unconsumed position).
    """
    node = arr[pos]
    nxt = pos + 1
    child_ids = []
    for _ in range(int(node.get("num-children", 0))):
        cid, nxt = _build(arr, nxt, out)
        child_ids.append(cid)
    idx = len(out)
    cls = node.get("class", "?").rsplit(".", 1)[-1]
    content = {
        k: v
        for k, v in node.items()
        if k not in ("class", "num-children") and not isinstance(v, (list, dict))
    }
    out.append(
        {
            "index": idx,
            "op": cls,
            "dependency": child_ids,
            "op_content": content,
        }
    )
    return idx, nxt


def plan_to_json(df: DataFrame, plan: str = "executedPlan") -> str:
    """JSON op-list for one of the plan stages.

    ``plan``: 'logical' | 'analyzed' | 'optimizedPlan' | 'sparkPlan' |
    'executedPlan'. Nodes are emitted children-first with dependency
    edges, mirroring the reference's dependency-ordered op_list
    (src/op.rs:15-16: deps always point at already-emitted ops).
    """
    qe = df._jdf.queryExecution()
    node = {
        "logical": qe.logical,
        "analyzed": qe.analyzed,
        "optimizedPlan": qe.optimizedPlan,
        "sparkPlan": qe.sparkPlan,
        "executedPlan": qe.executedPlan,
    }[plan]()
    arr = json.loads(node.toJSON())
    ops: list[dict[str, Any]] = []
    _build(arr, 0, ops)
    return json.dumps({"plan": plan, "op_list": ops}, indent=2)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain text as a string (explain() only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )
