"""Similarity-search queries over ``embeddings`` (north-star extension).

Scores are E·Eᵀ — the reference's outer-product applied to real vectors.
Dot products are ordered double folds on both engines (verified bit-exact
against DuckDB's list_dot_product), so no rounding is needed and top-k
membership is deterministic (tie-break nid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.vectors import l2_norm
from amorphous_mapreduce_spark.operators.similarity import (
    cosine_pairs,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

_DOT = "list_dot_product({a}.embedding::DOUBLE[], {b}.embedding::DOUBLE[])"
_COS = (
    _DOT.format(a="a", b="b")
    + " / (sqrt("
    + _DOT.format(a="a", b="a")
    + ") * sqrt("
    + _DOT.format(a="b", b="b")
    + "))"
)

NORMS_ORACLE = """
SELECT vec_id,
       sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm,
       label
FROM embeddings
"""


@register("embedding_norms", NORMS_ORACLE)
def q_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms via ordered fold (VecOp analog, src/op.rs:66-106)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", l2_norm("embedding").alias("norm"), "label")


TOPK_ORACLE = f"""
WITH pairs AS (
    SELECT a.vec_id AS qid, b.vec_id AS nid, {_COS} AS sim
    FROM embeddings a, embeddings b
    WHERE a.vec_id <> b.vec_id
)
SELECT qid, nid, sim, rnk FROM (
    SELECT qid, nid, sim,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
    FROM pairs
)
WHERE rnk <= 5
"""


@register("similarity_topk", TOPK_ORACLE)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 per vector: the exact ANN baseline.
    O(n²·d) block cross join — at 100 TB swap in similarity_lsh_topk."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, k=5)


NEARDUP_ORACLE = f"""
SELECT a.vec_id AS qid, b.vec_id AS nid, {_COS} AS sim
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND {_COS} > 0.45
"""


@register("embedding_near_dup", NEARDUP_ORACLE)
def q_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above threshold (exact)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        cosine_pairs(emb)
        .filter((F.col("qid") < F.col("nid")) & (F.col("sim") > 0.45))
    )


@register("similarity_ivf_topk")  # no oracle: ANN result is approximate
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN top-5: deterministic coarse quantiser + cell-probe
    equi-join + exact re-rank (recall checked in pytest)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, k=5, n_cells=16, n_probe=4)


@register("similarity_lsh_topk")  # no oracle: ANN result is approximate
def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN top-5: sub-quadratic candidate generation + exact
    re-rank — the 100 TB scale path (recall checked in pytest)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # 8 bands × 4 bits: high recall even on near-isotropic vectors (the
    # fixture embeddings' top-neighbour cosines are only ~0.4-0.5).
    return lsh_topk(emb, k=5, n_planes=32, band_bits=4)
