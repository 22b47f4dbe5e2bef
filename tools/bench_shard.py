"""Rotating bench shard: round-stamped sf0.1 wall-clock for EVERY
registered query, not just the bench.py headline (VERDICT_r07 item 7).

bench.py times the curated headline (~150 queries); the other ~340
registered queries had no wall-clock regression tracking. This tool
times a deterministic shard of the NON-headline registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and merges the
results into BENCH_SHARD.json:

    {"<query>": {"sec": 1.23, "round": 8, "sf": 0.1}, ...}

Shard membership is stable (sorted names, index % n_shards), so running
shards 0..n-1 across consecutive rounds covers the whole registry; the
default n_shards=2 means every query gets a fresh timing at least once
every 2 rounds. tests/test_gates.py::test_bench_shard_coverage enforces
that no registered query's latest timing is older than 2 rounds.

Usage:
    python tools/bench_shard.py            # next shard in rotation
    python tools/bench_shard.py 0 2        # explicit shard 0 of 2
    python tools/bench_shard.py all        # every non-headline query

Timings are single-shot on a shared session (no per-query warmup —
plan compilation is included; these are regression trip-wires, not the
headline benchmark; compare like-for-like across rounds).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "BENCH_SHARD.json")
N_SHARDS_DEFAULT = 2


def current_round() -> int:
    """Driver round in progress = latest recorded BENCH_r{N} + 1."""
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from bench import HEADLINE

    from amorphous_mapreduce_spark import get_spark
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    names = sorted(n for n in QUERIES if n not in set(HEADLINE))

    prev: dict = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)

    if len(sys.argv) > 1 and sys.argv[1] == "all":
        shard, n_shards = None, 1
        todo = names
    elif len(sys.argv) > 2:
        shard, n_shards = int(sys.argv[1]), int(sys.argv[2])
        todo = [n for i, n in enumerate(names) if i % n_shards == shard]
    else:
        # rotation: the shard after the one most recently recorded
        n_shards = N_SHARDS_DEFAULT
        last = max(
            (v.get("shard", -1) for v in prev.values() if isinstance(v, dict)),
            default=-1,
        )
        shard = (last + 1) % n_shards
        todo = [n for i, n in enumerate(names) if i % n_shards == shard]

    rnd = current_round()
    spark = get_spark(app_name="amorphous-mapreduce-bench-shard")
    spark.sparkContext.setLogLevel("ERROR")

    ok, errs = 0, []
    for name in todo:
        t0 = time.time()
        try:
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            sec = round(time.time() - t0, 3)
            prev[name] = {"sec": sec, "round": rnd, "sf": sf}
            if shard is not None:
                prev[name]["shard"] = shard
            ok += 1
            print(f"  {name}: {sec}s", flush=True)
        except Exception as e:  # record the failure — a timing gap is data
            errs.append(name)
            print(f"  {name}: ERR {type(e).__name__}: {e}", flush=True)

    with open(OUT, "w") as f:
        json.dump(prev, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        json.dumps(
            {
                "metric": "bench_shard",
                "shard": shard,
                "n_shards": n_shards,
                "round": rnd,
                "n_timed": ok,
                "n_err": len(errs),
                "errs": errs[:10],
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
