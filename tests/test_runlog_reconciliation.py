"""run.log reconciliation — the reference's SECOND trace artifact
(VERDICT_r05 item 5; closes the last unverified reference artifact).

run.log (2,128 lines) predates the current reference code — its message
format ("load map unit {u} from memory.") differs from today's emission
(src/outer_product.rs:190, "load map workload of k {}") — so BASELINE.md
records only grep-counts for it. This module (1) PARSES the artifact and
pins every BASELINE.md number plus the full schedule as data, (2) infers
the config the trace encodes, and (3) replays the equivalent GEMM
through gemm_block + plans.trace.plan_to_json, reconciling instance
counts through the same documented mapping as the shipped-config test
(tests/test_trace_reconciliation.py).

Inferred config (every identity asserted below):
- 16 mappers (ids 0-15), 8 reducers (ids 16-23, matching the empty
  remote_hold dumps — amorph_sram OFF, as in the shipped
  "no-amorsram" run).
- reducer output 256 = 16x16 tiles; closest_factor(8) -> 2x4 reducer
  grid (src/outer_product.rs:162-166), so C = (2*16) x (4*16) = 32x64.
- per (mapper, reducer) pair volume 8192 = 2048 -> local SRAM
  (tile_sram_size = 2048, the min() at src/outer_product.rs:213) +
  6144 -> memory spill (:263): the same 1:3 local:spill split as the
  shipped config at half the SRAM.
- 16 distinct map units on the k axis; pair volume 8192 = k_unit * 256
  -> k_unit = 32, so the GEMM is m=32, n=64, k=16*32=512.
- LEGACY SCHEDULE ARTIFACT: the wave loop re-emits unit u for every
  mapper m <= u with m == u (mod 2) — mapper m loads units
  [m, m+2, ..., 15], wave w runs 16-2w mappers, total
  sum(16-2w, w=0..7) = 72 loads/cross-products over only 16 distinct
  units (4.5x duplication). The engine's declarative plan touches each
  (bi, bk, bj) block pair EXACTLY once — wave/mapper assignment is the
  scheduler's job (SURVEY G2/W2), which is precisely the difference
  this artifact demonstrates.
- ACCUMULATION ARTIFACT: "Reducer calc local/fetch from memory" sizes
  are cumulative across waves (map2red_local_ops `e.1 +=` is never
  reset, src/outer_product.rs:230-237 / 276-281) — asserted as data:
  sizes == 2048/6144 * cumsum(active mappers per wave).
"""

from __future__ import annotations

import json
import os
import re

import pytest
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.grid import reducer_grid
from amorphous_mapreduce_spark.operators.gemm import gemm_block
from amorphous_mapreduce_spark.plans.trace import plan_to_json

RUN_LOG = "/root/reference/run.log"

# Inferred GEMM (derivation in module docstring).
M, N, K = 32, 64, 512
BS = 16
N_MAPPERS, N_REDUCERS = 16, 8
N_UNITS, K_UNIT = 16, 32
TILE = 256  # 16x16 reducer output tile
LOCAL_SZ, MEM_SZ = 2048, 6144

pytestmark = pytest.mark.skipif(
    not os.path.exists(RUN_LOG), reason="reference run.log not available"
)


@pytest.fixture(scope="module")
def log():
    """Parsed run.log: loads, crossp, transfers, reducer ops, holds."""
    loads, crossp, transfers, red = [], [], [], []
    holds = 0
    with open(RUN_LOG) as f:
        for line in f:
            line = line.strip()
            if line.startswith("remote_hold:"):
                holds += 1
                # amorph_sram off -> every reducer's remote list is empty
                assert re.fullmatch(
                    r"remote_hold: \{(\d+: \[\](, )?)+\}", line
                ), line
                continue
            m = re.match(r"(\d+) load map unit (\d+) from memory\.", line)
            if m:
                loads.append((int(m.group(1)), int(m.group(2))))
                continue
            m = re.match(r"(\d+) performs cross-product of (\d+) x (\d+)", line)
            if m:
                crossp.append((int(m.group(1)), int(m.group(2)), int(m.group(3))))
                continue
            m = re.match(r"Transfer from (\d+) to local (\d+), data size (\d+)", line)
            if m:
                transfers.append((int(m.group(1)), int(m.group(2)), int(m.group(3))))
                continue
            m = re.match(r"Transfer from (\d+) to -1, data size (\d+)", line)
            if m:
                transfers.append((int(m.group(1)), -1, int(m.group(2))))
                continue
            m = re.match(r"Reducer (\d+) (calc local of size|fetch from memory of size|calc size|output of size) (\d+)", line)
            if m:
                red.append((int(m.group(1)), m.group(2), int(m.group(3))))
                continue
            raise AssertionError(f"unrecognized run.log line: {line!r}")
    return {"loads": loads, "crossp": crossp, "transfers": transfers,
            "red": red, "holds": holds}


def test_baseline_md_grep_counts_are_exact(log):
    """Every number in BASELINE.md's run.log table, re-derived by a real
    parser instead of grep."""
    assert len(log["loads"]) == 72
    assert len(log["crossp"]) == 72
    assert len(log["transfers"]) == 1152
    kinds = {}
    for _, kind, _ in log["red"]:
        kinds[kind] = kinds.get(kind, 0) + 1
    assert kinds == {
        "calc local of size": 64,
        "fetch from memory of size": 64,
        "calc size": 64,
        "output of size": 64,
    }
    # per-pair transfer split: 2,048 local + 6,144 memory, nothing else
    local = [t for t in log["transfers"] if t[1] >= 0]
    mem = [t for t in log["transfers"] if t[1] == -1]
    assert len(local) == len(mem) == 576  # 72 x 8 reducers
    assert {t[2] for t in local} == {LOCAL_SZ}
    assert {t[2] for t in mem} == {MEM_SZ}
    # every output is one 16x16 tile
    assert {s for r, k, s in log["red"] if k == "output of size"} == {TILE}
    # line accounting: 1,552 op lines + 576 remote_hold dumps = 2,128
    assert 72 + 72 + 1152 + 256 + log["holds"] == 2128


def test_legacy_stride2_schedule(log):
    """Mapper m loads units [m, m+2, ..., 15]: 72 loads over 16 distinct
    units — the legacy wave loop's 4.5x duplication, pinned as data."""
    per_mapper = {}
    for mid, unit in log["loads"]:
        per_mapper.setdefault(mid, []).append(unit)
    assert set(per_mapper) == set(range(N_MAPPERS))
    for mid, units in per_mapper.items():
        assert units == list(range(mid, N_UNITS, 2))
    units_loaded = [u for _, u in log["loads"]]
    assert len(set(units_loaded)) == N_UNITS
    # unit u is re-emitted floor(u/2) + 1 times
    for u in range(N_UNITS):
        assert units_loaded.count(u) == u // 2 + 1
    # wave w (mapper m's w-th load) runs 16 - 2w mappers
    active = [sum(1 for us in per_mapper.values() if len(us) > w) for w in range(8)]
    assert active == [16, 14, 12, 10, 8, 6, 4, 2]
    assert sum(active) == 72
    # cross-products mirror the loads 1:1, all "16 x 16"
    assert [c[0] for c in log["crossp"]] == [m for m, _ in log["loads"]]
    assert {(c[1], c[2]) for c in log["crossp"]} == {(16, 16)}


def test_reducer_accumulation_artifact(log):
    """Reducer calc/fetch sizes are CUMULATIVE across waves (the never-
    reset accumulators at src/outer_product.rs:230-237 / 276-281) —
    exactly 2048/6144 x cumsum(active mappers)."""
    active = [16, 14, 12, 10, 8, 6, 4, 2]
    cum = []
    tot = 0
    for a in active:
        tot += a
        cum.append(tot)
    for kind, unit_sz in (
        ("calc local of size", LOCAL_SZ),
        ("fetch from memory of size", MEM_SZ),
        ("calc size", MEM_SZ),
    ):
        per_red = {}
        for rid, k, s in log["red"]:
            if k == kind:
                per_red.setdefault(rid, []).append(s)
        assert set(per_red) == set(range(N_MAPPERS, N_MAPPERS + N_REDUCERS))
        for rid, sizes in per_red.items():
            assert sizes == [unit_sz * c for c in cum], (kind, rid)


def test_inferred_config_identities(log):
    """The config BASELINE.md infers (M=16, R=8, 16x16 tiles) pins a
    unique GEMM: C = 32x64 through the 2x4 reducer grid, k = 16 units x
    32 = 512 through the 8,192-element pair volume."""
    pm, pn = reducer_grid(N_REDUCERS)
    assert (pm, pn) == (2, 4)
    assert (M // pm, N // pn) == (16, 16)  # the observed tile
    assert pm * pn * TILE == M * N  # 8 reducers tile C exactly
    assert LOCAL_SZ + MEM_SZ == K_UNIT * TILE  # pair volume = k_unit x tile
    assert N_UNITS * K_UNIT == K
    # mapper ids 0..15, reducer ids 16..23 (rid_ofst = mapper_num)
    assert {m for m, _ in log["loads"]} == set(range(N_MAPPERS))
    assert {r for r, _, _ in log["red"]} == set(
        range(N_MAPPERS, N_MAPPERS + N_REDUCERS)
    )


@pytest.fixture(scope="module")
def gemm_df(spark):
    A = spark.range(M * K).selectExpr(
        f"id div {K} AS i", f"id % {K} AS k", "CAST(1.0 AS DOUBLE) AS a"
    )
    B = spark.range(K * N).selectExpr(
        f"id div {N} AS k", f"id % {N} AS j", "CAST(1.0 AS DOUBLE) AS b"
    )
    return A, B, gemm_block(A, B, block_size=BS)


def test_engine_replays_inferred_gemm(gemm_df):
    """ones(32,512) @ ones(512,64) = 512 everywhere; output cells = the
    64 reducer outputs x 256 tile elements run.log traced."""
    _, _, C = gemm_df
    row = C.agg(
        F.count("*").alias("cells"),
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
    ).first()
    assert row["cells"] == M * N == N_REDUCERS * TILE  # 2,048 C cells
    assert row["lo"] == row["hi"] == float(K)


def test_engine_touches_each_block_pair_once(gemm_df, spark):
    """The declarative plan's instance grid: 2 bi x 32 bk x 4 bj = 256
    block pairs, each consumed exactly once — vs run.log's 72 unit-loads
    over 16 units (4.5x re-emission). MAC identity: 256 x 16^3 =
    32*64*512 = 1,048,576 — the inferred GEMM's full MAC mass, once."""
    A, B, _ = gemm_df
    Ab = A.select(
        (F.col("i") / BS).cast("long").alias("bi"),
        (F.col("k") / BS).cast("long").alias("bk"),
    ).distinct()
    Bb = B.select(
        (F.col("k") / BS).cast("long").alias("bk"),
        (F.col("j") / BS).cast("long").alias("bj"),
    ).distinct()
    n_pairs = (M // BS) * (K // BS) * (N // BS)
    assert Ab.join(Bb, "bk").count() == n_pairs == 256
    assert n_pairs * BS**3 == M * N * K == 1_048_576
    # engine k-blocks: 32 = 16 map units x (32-deep unit / 16-wide block)
    assert Ab.select("bk").distinct().count() == K // BS == N_UNITS * (K_UNIT // BS)


def test_trace_categories_reconcile_runlog(gemm_df):
    """Same category mapping as the shipped-config reconciliation: ONE
    pairing node stands in for run.log's 72 unrolled cross-products, the
    aggregate pair + grouped kernel for its 192 reducer VecOps, O(1)
    exchange nodes for its 1,152 transfer instances; the whole plan is
    smaller than the 1,552 ops the log emits."""
    _, _, C = gemm_df
    C.write.mode("overwrite").format("noop").save()
    trace = json.loads(plan_to_json(C))
    ops = trace["op_list"]
    cats = {}
    classes = {}
    for op in ops:
        c = op["op"]["category"]
        cats[c] = cats.get(c, 0) + 1
        classes.setdefault(c, set()).add(op["op_content"]["name"])
    for op in ops:
        assert set(op) == {"index", "module", "dependency", "op", "op_content"}
        assert all(d < op["index"] for d in op["dependency"])
    assert cats.get("CrossPOp", 0) == 1, classes.get("CrossPOp")
    assert cats.get("VecOp", 0) >= 2, classes.get("VecOp")
    assert any("Aggregate" in c or "InPandas" in c for c in classes["VecOp"])
    assert 2 <= cats.get("TransOp", 0) <= 20, classes.get("TransOp")
    assert any("Exchange" in c for c in classes["TransOp"])
    assert len(ops) < 1552  # the op lines run.log actually emits
