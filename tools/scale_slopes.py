"""Scale-slope evidence (VERDICT_r03 item 6): measure each heavy query's
sf0.01 -> sf0.1 wall-clock slope so the 100x-scale claims in SCALE.md
have committed data behind them.

For each query: warm at sf0.001 (plan/codegen compile), then two timed
noop-sink runs per SF taking the min (ambient-load shaving). Data ratio
between the SFs is 10x, so:

  slope = t(sf0.1) / t(sf0.01)

~10 or below = at-worst-linear in the data (scan-bound is ~linear;
bounded-state ops are far flatter). Queries whose slope exceeds
FLAG_RATIO * 10 are flagged — those grew superlinearly and need a plan
read.  Fixed per-query overhead (session/scheduling, ~0.5-1 s) deflates
slopes at these tiny SFs; flags, not the absolute values, are the
signal.

Usage: python tools/scale_slopes.py [query ...]   (default: heavy set)
Writes SLOPES.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The heaviest bench entries per VERDICT_r03's performance table, plus
# the round-4 reworked loops (one-kernel collapses, delta-frontier BF).
HEAVY = [
    "approx_quantile_audit",
    "cdc_net_effect_compaction",
    "recommend_parts",
    "ransac_price_fit",
    "embedding_power_iteration",
    "fellegi_sunter_weights",
    "markov_removal_attribution",
    "kmv_set_similarity",
    "phrase_search",
    "hard_negative_mining",
    "bellman_ford_delta_frontier",
    "similarity_topk",
    "lof_outliers",
    "rfm_cell_matrix",
    "sppmi_rank1_embedding",
]

DATA_RATIO = 10.0
FLAG_RATIO = 1.5  # flag when slope > FLAG_RATIO * DATA_RATIO


def main() -> int:
    names = sys.argv[1:] or HEAVY

    from amorphous_mapreduce_spark import get_spark
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    spark = get_spark(app_name="scale-slopes")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        t0 = time.time()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.time() - t0

    out = {}
    for name in names:
        if name not in QUERIES:
            print(f"skip {name}: not registered")
            continue
        run(name, "/root/testdata/sf0.001")  # warm
        t_small = min(run(name, "/root/testdata/sf0.01") for _ in range(2))
        t_big = min(run(name, "/root/testdata/sf0.1") for _ in range(2))
        slope = t_big / t_small if t_small > 0 else float("inf")
        flagged = slope > FLAG_RATIO * DATA_RATIO
        out[name] = {
            "sf0.01_s": round(t_small, 3),
            "sf0.1_s": round(t_big, 3),
            "slope": round(slope, 2),
            "flagged": flagged,
        }
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s  slope {slope:.2f}"
            + ("  ** FLAGGED **" if flagged else "")
        )

    doc = {
        "data_ratio": DATA_RATIO,
        "flag_above_slope": FLAG_RATIO * DATA_RATIO,
        "queries": out,
        "n_flagged": sum(1 for r in out.values() if r["flagged"]),
    }
    with open(os.path.join(REPO, "SLOPES.json"), "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"\nwrote SLOPES.json: {len(out)} queries, {doc['n_flagged']} flagged")
    spark.stop()
    return 1 if doc["n_flagged"] else 0


if __name__ == "__main__":
    sys.exit(main())
