"""Sketch queries: count-min heavy hitters (operators/sketches.py).

The sketch state and estimates are MD5-derived integer arithmetic, so
DuckDB replays the ENTIRE sketch bit-identically — estimates included.
Both engines' `%` agree here because hex_hash64 is a positive 60-bit
integer (pmod == % for non-negative operands).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amorphous_mapreduce_spark.operators.sketches import cms_heavy_hitters
from amorphous_mapreduce_spark.queries.dedup_queries import TOKS_CTE
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

_BUCKET = (
    "CAST('0x' || substr(md5('cms' || depth || '_' || word), 1, 15) AS BIGINT)"
    " % 256"
)

CMS_ORACLE = (
    "WITH "
    + TOKS_CTE
    + f"""
, tf AS (SELECT word, COUNT(*) AS exact_count FROM toks GROUP BY word),
wb AS (
    SELECT word, exact_count, depth, {_BUCKET} AS bucket
    FROM tf CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(depth)
),
cells AS (
    SELECT depth, bucket, CAST(SUM(exact_count) AS BIGINT) AS cell
    FROM wb GROUP BY depth, bucket
),
est AS (
    SELECT word, exact_count, MIN(cell) AS cms_est
    FROM wb JOIN cells USING (depth, bucket)
    GROUP BY word, exact_count
)
SELECT word, exact_count, cms_est FROM est
ORDER BY exact_count DESC, word
LIMIT 20
"""
)


@register("cms_heavy_hitters", CMS_ORACLE)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters: top-20 words with exact count and
    CMS estimate side by side (overestimate bound visible in-row). The
    d x m counter grid is corpus-size independent and mergeable — the
    sublinear-state form of the reference's per-key count (W7,
    src/word_count.rs:121-123)."""
    return cms_heavy_hitters(load_table(spark, sf_dir, "documents"))
