"""Post-execution cost report — the reference's per-op cost annotations.

The reference annotates every op with a cost: `len` for transfers
(src/op.rs:57), `complexity = k*m*n` for compute (src/op.rs:155). Spark
tracks the executed analogue in SQLMetrics (rows/bytes/spill per physical
node); this module surfaces them as the same kind of op-cost table.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

INTERESTING = (
    "numOutputRows",
    "numFiles",
    "filesSize",
    "dataSize",
    "shuffleBytesWritten",
    "shuffleRecordsWritten",
    "recordsRead",
    "remoteBytesRead",
    "localBytesRead",
    "spillSize",
    "peakMemory",
    "numPartitions",
)


def _walk(node: Any, out: list[dict[str, Any]], depth: int = 0) -> None:
    metrics: dict[str, int] = {}
    try:
        m = node.metrics()
        it = m.iterator()
        while it.hasNext():
            kv = it.next()
            name, metric = kv._1(), kv._2()
            if name in INTERESTING or metric.metricType() in ("size", "sum"):
                try:
                    metrics[name] = int(metric.value())
                except Exception:
                    pass
    except Exception:
        pass
    out.append(
        {
            "index": len(out),
            "op": node.nodeName(),
            "depth": depth,
            "metrics": metrics,
        }
    )
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), out, depth + 1)
    # AQE wrapper nodes hide the materialised plan behind non-child refs:
    # AdaptiveSparkPlan -> executedPlan(), *QueryStage -> plan(),
    # ReusedExchange/ReusedSubquery -> child() already covered by children.
    name = node.nodeName()
    wrapper_attrs: tuple[str, ...] = ()
    if name == "AdaptiveSparkPlan":
        wrapper_attrs = ("executedPlan", "finalPhysicalPlan")
    elif "QueryStage" in name:
        wrapper_attrs = ("plan",)
    for attr in wrapper_attrs:
        try:
            _walk(getattr(node, attr)(), out, depth + 1)
            break
        except Exception:
            continue


def cost_report(df: DataFrame, execute: bool = True) -> list[dict[str, Any]]:
    """Execute ``df`` (noop sink) and return per-op metric records.

    Each record: {index, op, depth, metrics{numOutputRows, bytes, spill...}}
    — the executed-plan analogue of the reference's op trace costs.
    """
    qe = df._jdf.queryExecution()
    if execute:
        # Run THIS QueryExecution's plan (a df.write would build a fresh
        # one and the metrics would land there instead). count() on the
        # InternalRow RDD materialises everything executor-side.
        qe.executedPlan().execute().count()
    out: list[dict[str, Any]] = []
    _walk(qe.executedPlan(), out)
    return out


def summarize_cost(report: list[dict[str, Any]]) -> dict[str, int]:
    """Aggregate totals: rows produced, shuffle bytes, spill bytes."""
    tot = {"output_rows": 0, "shuffle_bytes": 0, "spill_bytes": 0, "n_ops": 0}
    for rec in report:
        m = rec["metrics"]
        tot["n_ops"] += 1
        tot["output_rows"] += m.get("numOutputRows", 0)
        tot["shuffle_bytes"] += m.get("shuffleBytesWritten", 0)
        tot["spill_bytes"] += m.get("spillSize", 0)
    return tot
