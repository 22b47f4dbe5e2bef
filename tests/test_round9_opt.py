"""Round-9 optimization equivalence tests.

Round 8 shipped ``cosine_batch`` (functions/vectors.py) unbuildable and
untested; round 9 fixed the pandas_udf signature and A/B-measured it
against the expression form on the lsh_topk re-rank (the expression form
with precomputed norms won and was restored). These tests pin:

- cosine_batch BUILDS (the exact round-8 failure mode) and is
  bit-identical to the expression-form cosine_similarity on float32
  arrays, including the zero-norm NaN contract;
- lsh_topk's restored re-rank matches a from-scratch cosine re-rank of
  its own candidates (precomputed norms == per-pair norms, bit-exact).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import QUERIES  # noqa: F401  (import order)
from amorphous_mapreduce_spark.functions.vectors import (
    cosine_batch,
    cosine_similarity,
)


def _vec_frame(spark):
    rows = [
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (2, [0.1, -0.2, 0.3], [-0.4, 0.5, -0.6]),
        (3, [1e-3, 2e7, -3e-5], [7.0, -8.0, 9.0]),
        (4, [1.5, 2.5, 3.5], [1.5, 2.5, 3.5]),  # identical -> 1.0
        (5, [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),  # zero norm -> NaN
    ]
    return spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    )


def test_cosine_batch_builds_and_matches_expression(spark):
    df = _vec_frame(spark)
    out = df.filter("id < 5").select(
        "id",
        cosine_batch("a", "b").alias("batch"),
        cosine_similarity("a", "b").alias("expr"),
    ).collect()
    assert len(out) == 4
    for r in out:
        # bit-identical, not approx: both do per-dimension ordered
        # double accumulation then one multiply-then-divide
        assert r["batch"] == r["expr"], (r["id"], r["batch"], r["expr"])
    # zero-norm contract: batch yields NULL (numpy NaN is pandas' null
    # sentinel -> Arrow null; the ANSI expression form raises
    # DIVIDE_BY_ZERO instead — documented divergence)
    nan_row = (
        df.filter("id = 5").select(cosine_batch("a", "b").alias("s")).collect()
    )
    assert nan_row[0]["s"] is None


def test_cosine_batch_plan_is_arrow(spark):
    df = _vec_frame(spark).select(cosine_batch("a", "b").alias("s"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan


def test_lsh_topk_rerank_matches_fresh_cosine(spark, sf_dir):
    from amorphous_mapreduce_spark.operators.similarity import (
        lsh_candidate_pairs,
        lsh_topk,
    )
    from amorphous_mapreduce_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        (r["qid"], r["rnk"]): (r["nid"], r["sim"])
        for r in lsh_topk(emb, k=3, n_planes=32, band_bits=4).collect()
    }
    # reference: re-rank the same candidates with per-pair expression
    # cosine (no precomputed norms) — must agree bit-for-bit
    from pyspark.sql import Window

    cands = lsh_candidate_pairs(emb, 32, 4)
    sym = cands.unionByName(
        cands.select(F.col("nid").alias("qid"), F.col("qid").alias("nid"))
    )
    v = emb.select(F.col("vec_id").alias("_id"), F.col("embedding").alias("_v"))
    scored = (
        sym.join(v.toDF("qid", "qv"), "qid")
        .join(v.toDF("nid", "nv"), "nid")
        .select("qid", "nid", cosine_similarity("qv", "nv").alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("nid"))
    ref = {
        (r["qid"], r["rnk"]): (r["nid"], r["sim"])
        for r in scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .collect()
    }
    assert got == ref
