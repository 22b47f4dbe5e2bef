"""K-means clustering query with an unrolled-iteration SQL oracle.

The oracle replays the exact algorithm (quantised vectors, md5 seeds,
argmax q·c − |c|²/2 assignment, integer-sum centroid means) for the same
fixed two Lloyd iterations — an iterative ML algorithm hash-matched
against pure SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.kmeans import cluster_sizes, kmeans_assign
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

K = 8

_QD = "list_transform(q.qv, x -> CAST(x AS DOUBLE))"


def _assign_cte(name: str, cents: str) -> str:
    return f"""
{name} AS (
    SELECT id, qv, cell FROM (
        SELECT q.id, q.qv, s.cell,
               ROW_NUMBER() OVER (
                   PARTITION BY q.id
                   ORDER BY (list_dot_product({_QD}, s.cv)
                             - list_dot_product(s.cv, s.cv) / 2) DESC,
                            s.cell
               ) AS rk
        FROM q, {cents} s
    ) WHERE rk = 1
)
"""


def _centroid_cte(name: str, assigns: str) -> str:
    return f"""
{name} AS (
    SELECT cell, list(m ORDER BY dim) AS cv FROM (
        SELECT cell, dim, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS m
        FROM (SELECT {assigns}.cell,
                     generate_subscripts({assigns}.qv, 1) AS dim,
                     unnest({assigns}.qv) AS v
              FROM {assigns})
        GROUP BY cell, dim
    ) GROUP BY cell
)
"""


KMEANS_ORACLE = (
    f"""
WITH q AS (
    SELECT vec_id AS id,
           list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                    AS BIGINT)) AS qv
    FROM embeddings
), seeds AS (
    SELECT id AS cell,
           list_transform(qv, x -> CAST(x AS DOUBLE)) AS cv
    FROM q
    ORDER BY CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15)
                  AS BIGINT), id
    LIMIT {K}
),"""
    + _assign_cte("a0", "seeds")
    + ","
    + _centroid_cte("cent1", "a0")
    + ","
    + _assign_cte("a1", "cent1")
    + ","
    + _centroid_cte("cent2", "a1")
    + ","
    + _assign_cte("a2", "cent2")
    + """
SELECT id, cell FROM a2
"""
)


@register("kmeans_clusters", KMEANS_ORACLE)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of quantised k-means (k=8) over embeddings —
    deterministic iterative clustering for diversity sampling."""
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=K, iters=2)


KMEANS_SIZES_ORACLE = KMEANS_ORACLE.replace(
    "SELECT id, cell FROM a2",
    "SELECT cell, COUNT(*) AS n_members FROM a2 GROUP BY cell",
)


@register("kmeans_cluster_sizes", KMEANS_SIZES_ORACLE)
def q_kmeans_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the k-means assignment (diversity view)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cluster_sizes(kmeans_assign(emb, k=K, iters=2))


DIVERSITY_ORACLE = KMEANS_ORACLE.replace(
    "SELECT id, cell FROM a2",
    """SELECT id, cell, rnk FROM (
    SELECT id, cell,
           ROW_NUMBER() OVER (PARTITION BY cell ORDER BY id) AS rnk
    FROM a2
) WHERE rnk <= 16""",
)


@register("diversity_sample", DIVERSITY_ORACLE)
def q_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced sampling: at most 16 vectors per k-means cell —
    the diversity-capping step of a curation pipeline (deterministic
    member order by id)."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_assign(emb, k=K, iters=2)
    w = Window.partitionBy("cell").orderBy("id")
    return (
        assigned.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 16)
    )
