"""Per-query optimization measurement harness (round 8).

For each named query: warm at sf0.001, then run N timed iterations at the
target SF through the noop sink (guide §1.4), report min/median, and dump
``.explain("formatted")`` to plans/r08/<query>_<tag>.txt so plan-shape
claims in OPTIMIZATION_r08.md are reproducible.

Usage: python tools/opt_measure.py <tag> <query> [query ...]
  tag: 'before' or 'after' (plan file suffix; 'none' skips the dump)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), OPT_RUNS (default 3),
     OPT_PLANS_DIR (default plans/r09 — round-9 deliverables)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("OPT_RUNS", "3"))

    from amorphous_mapreduce_spark import get_spark
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    spark = get_spark(
        app_name=f"opt-measure-{tag}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    plans_dir = os.path.join(REPO, os.environ.get("OPT_PLANS_DIR", "plans/r09"))
    os.makedirs(plans_dir, exist_ok=True)

    from bench import spin_rate

    out: dict[str, dict] = {}
    for name in names:
        if name not in QUERIES:
            print(f"!! {name}: not registered", flush=True)
            continue
        # Warm codegen/JIT at the smoke SF (same methodology as bench.py).
        try:
            QUERIES[name](spark, "/root/testdata/sf0.001").write.mode(
                "overwrite"
            ).format("noop").save()
        except Exception as e:  # noqa: BLE001
            print(f"!! {name}: warmup failed: {e}", flush=True)
            continue
        times = []
        spins = []
        for _ in range(runs):
            spins.append(spin_rate(0.2))
            # Isolate runs: drop caches accumulated by the previous run's
            # persist() calls so every timed run computes from parquet
            # (same cold-cache posture as one bench.py pass).
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"opt:{name}")
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        if tag != "none":
            import contextlib
            import io

            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        out[name] = {
            "min": min(times),
            "median": statistics.median(times),
            "runs": times,
            "spin_rate": round(statistics.median(spins)),
        }
        print(
            f"{name}: min={min(times)} median={statistics.median(times)} "
            f"{times} spin={round(statistics.median(spins) / 1e6, 2)}M",
            flush=True,
        )
    path = os.path.join(plans_dir, f"timings_{tag}.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing.update(out)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
