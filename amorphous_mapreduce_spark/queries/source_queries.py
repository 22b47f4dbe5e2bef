"""Queries over the custom Python Data Source (sources/generator.py).

Even the non-file scan path is value-hash-checked: the generator's LCG
rows are replayed in DuckDB with HUGEINT mod-2^64 arithmetic, so the
oracle covers the source itself, not just downstream operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.agg import dec
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources.generator import register_synthetic_source

SYNTH_ROLLUP_ORACLE = """
WITH ids AS (SELECT range AS i FROM range(60000)),
h AS (SELECT i, (CAST(i AS HUGEINT) * 6364136223846793005 + 1442695040888963407)
             % 18446744073709551616 AS hv FROM ids),
rows_ AS (
    SELECT CAST(i AS BIGINT) AS event_id,
           CAST(hv % 1000 AS BIGINT) AS user_id,
           ['view','click','purchase','scroll'][CAST((hv // 1000) % 4 AS INT) + 1]
               AS event_type,
           CAST((hv // 4000) % 100000 AS DOUBLE) / 100.0 AS value
    FROM h
)
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM rows_ WHERE event_id < 50000
GROUP BY event_type
"""


@register("synthetic_source_rollup", SYNTH_ROLLUP_ORACLE)
def q_synthetic_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-layer coverage for the custom Python Data Source: 60k
    generated rows across 8 planned partitions, a range predicate the
    reader consumes via pushFilters (generator-side pruning — the
    row-group-skip analogue), then a keyed rollup. The sf_dir is unused
    by design: this source materialises nothing anywhere."""
    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 60000)
        .option("numPartitions", 8)
        .load()
    )
    return (
        df.filter(F.col("event_id") < 50000)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(dec("value", "decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )
