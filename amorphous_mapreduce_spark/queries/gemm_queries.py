"""GEMM queries — the reference's flagship outer-product pipeline.

The test matrices are integer-valued and generated from ``range`` on both
engines (A[i,k] = (31i+17k) mod 97, B[k,j] = (13k+7j) mod 89, 96³ problem),
so sums are exact and the oracle hash-matches regardless of reduction
order — the float path is covered by pytest against numpy.

Reference parity: the shipped config runs one 128×128×512 GEMM
(src/main.rs:13-14) as 16 k-block waves (src/outer_product.rs:177); here
the same iteration space is rows and the wave loop is the join key
(SURVEY.md G4: "iteration over k-blocks is just rows in the join key").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.gemm import gemm_block, gemm_coordinate
from amorphous_mapreduce_spark.queries_registry import register

N = 96  # m = n = k: keeps the oracle cross joins cheap but multi-block


def _A(spark: SparkSession) -> DataFrame:
    i = spark.range(N).select(F.col("id").alias("i"))
    k = spark.range(N).select(F.col("id").alias("k"))
    return i.crossJoin(k).withColumn(
        "a", (F.col("i") * 31 + F.col("k") * 17) % 97
    )


def _B(spark: SparkSession) -> DataFrame:
    k = spark.range(N).select(F.col("id").alias("k"))
    j = spark.range(N).select(F.col("id").alias("j"))
    return k.crossJoin(j).withColumn(
        "b", (F.col("k") * 13 + F.col("j") * 7) % 89
    )


GEMM_SQL_BODY = f"""
WITH A AS (
    SELECT i.range AS i, k.range AS k,
           (i.range * 31 + k.range * 17) % 97 AS a
    FROM range({N}) i, range({N}) k
), B AS (
    SELECT k.range AS k, j.range AS j,
           (k.range * 13 + j.range * 7) % 89 AS b
    FROM range({N}) k, range({N}) j
)
"""

GEMM_COORD_ORACLE = (
    GEMM_SQL_BODY
    + """
SELECT A.i, B.j, CAST(SUM(A.a * B.b) AS BIGINT) AS val
FROM A JOIN B ON A.k = B.k
GROUP BY A.i, B.j
"""
)


@register("gemm_coordinate", GEMM_COORD_ORACLE)
def q_gemm_coordinate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coordinate GEMM: join on k + partial/final sum — the declarative
    form of CrossPOp (map) + VecOp (reduce), src/op.rs:108-163, :66-106."""
    return gemm_coordinate(_A(spark), _B(spark))


GEMM_BLOCK_ORACLE = (
    GEMM_SQL_BODY
    + """
SELECT A.i, B.j, CAST(SUM(A.a * B.b) AS DOUBLE) AS val
FROM A JOIN B ON A.k = B.k
GROUP BY A.i, B.j
"""
)


@register("gemm_block", GEMM_BLOCK_ORACLE)
def q_gemm_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked GEMM (applyInPandas + np.dot per output tile): the
    reference's tiled dataflow (G3 tiling, G6 rank-k update, G10 tile
    accumulate) with Arrow/BLAS doing the inner loops."""
    A = _A(spark).withColumn("a", F.col("a").cast("double"))
    B = _B(spark).withColumn("b", F.col("b").cast("double"))
    return gemm_block(A, B, block_size=32)
