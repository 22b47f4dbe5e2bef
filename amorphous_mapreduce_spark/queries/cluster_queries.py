"""Dedup clustering + array/map function coverage queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.dedup import minhash_lsh_pairs
from amorphous_mapreduce_spark.operators.graph import dedup_clusters
from amorphous_mapreduce_spark.queries.dedup_queries import SHINGLES_CTE
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

# Oracle: same minhash-LSH pairs CTE as dedup_queries, then transitive
# closure via WITH RECURSIVE; cluster = min reachable id; singletons self.
# (WITH RECURSIVE accepts the leading non-recursive CTEs too.)
CLUSTERS_ORACLE = (
    "WITH RECURSIVE "
    + SHINGLES_CTE.strip()
    + """
, minhash AS (
    SELECT s.id, h.range AS hid,
           MIN(((s.sh % 2147483647) * (h.range * 2 + 1) + h.range * 12345)
               % 2147483647) AS mh
    FROM shingles s, range(16) h
    GROUP BY s.id, h.range
), bands AS (
    SELECT id, hid // 4 AS band, string_agg(mh, '-' ORDER BY hid) AS sig
    FROM minhash GROUP BY id, hid // 4
), pairs AS (
    SELECT DISTINCT a.id AS qid, b.id AS nid
    FROM bands a JOIN bands b USING (band, sig)
    WHERE a.id < b.id
), edges AS (
    SELECT qid AS a, nid AS b FROM pairs
    UNION
    SELECT nid AS a, qid AS b FROM pairs
), reach(src, dst) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS id, MIN(dst) AS cluster,
       (src = MIN(dst)) AS is_keeper
FROM reach GROUP BY src
"""
)


@register("near_dup_clusters", CLUSTERS_ORACLE)
def q_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: minhash-LSH pairs -> connected components
    (iterative min-label propagation) -> canonical keeper per cluster.
    Oracle: transitive closure via WITH RECURSIVE."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=16, band_bits=4)
    return dedup_clusters(docs, pairs)


ARRAY_OPS_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       embedding[1]::DOUBLE AS first_val,
       list_sum(embedding[1:8]::DOUBLE[]) AS head_sum,
       list_max(embedding::DOUBLE[]) AS max_val,
       list_min(embedding::DOUBLE[]) AS min_val
FROM embeddings
"""


@register("embedding_array_ops", ARRAY_OPS_ORACLE)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar-function coverage: size/index/slice/fold/max/min over
    array<float> (left-fold head_sum matches DuckDB's list_sum order)."""
    emb = load_table(spark, sf_dir, "embeddings")
    head = F.slice(F.col("embedding"), 1, 8)
    head_sum = F.aggregate(
        head, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        head_sum.alias("head_sum"),
        F.array_max("embedding").cast("double").alias("max_val"),
        F.array_min("embedding").cast("double").alias("min_val"),
    )


MAP_OPS_ORACLE = """
WITH kv AS (
    SELECT unnest(json_keys(props)) AS prop_key, props FROM events
)
SELECT prop_key,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$."' || prop_key || '"')
                     AS BIGINT)) AS BIGINT) AS sum_value
FROM kv GROUP BY prop_key
"""


@register("events_props_map", MAP_OPS_ORACLE)
def q_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType coverage: props JSON parsed to map<string,long>, exploded
    to (key, value) rows, aggregated per key."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        F.explode(F.from_json("props", "map<string,bigint>")).alias(
            "prop_key", "v"
        )
    )
    return parsed.groupBy("prop_key").agg(
        F.count("*").alias("n_events"), F.sum("v").alias("sum_value")
    )
