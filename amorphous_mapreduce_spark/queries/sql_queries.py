"""SQL-front-end queries: the same ANSI SQL text runs through BOTH
engines — ``spark.sql`` over temp views on one side, the DuckDB oracle
on the other.

This is the engine's second entry point (SURVEY.md §3.5): everything
else in queries/ exercises the DataFrame API; these prove a user can
hand the engine raw SQL and get plan-for-plan the same Catalyst
treatment (the views are plain parquet scans, so pushdown/pruning work
identically). Keeping ONE SQL string for both engines also removes a
whole class of Spark-vs-oracle transcription drift — the dialect subset
used here (decimal casts, window row_number/count, case) is common to
both.

Determinism follows the repo conventions: revenue accumulates in
DECIMAL (cast before multiply), the final cast to DOUBLE is one
correctly-rounded conversion, and the per-nation ranking has a
total-order tie-break (revenue desc, custkey).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

# Revenue concentration: what share of each nation's revenue comes from
# its top-20% customers (by revenue). rnk*5 <= n is the integer form of
# rnk <= 0.2*n.
CONCENTRATION_SQL = """
WITH rev AS (
    SELECT c.c_nationkey AS nationkey, o.o_custkey AS custkey,
           SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS r
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey, o.o_custkey
), ranked AS (
    SELECT nationkey, custkey, r,
           ROW_NUMBER() OVER (PARTITION BY nationkey
                              ORDER BY r DESC, custkey) AS rnk,
           COUNT(*) OVER (PARTITION BY nationkey) AS n
    FROM rev
)
SELECT nationkey,
       COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN rnk * 5 <= n THEN r
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           AS top20_revenue,
       CAST(SUM(r) AS DOUBLE) AS total_revenue
FROM ranked
GROUP BY nationkey
"""


@register("sql_revenue_concentration", CONCENTRATION_SQL)
def q_sql_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration per nation via the raw-SQL entry point: the
    registered oracle string IS the executed Spark query (temp views
    over the parquet tables). Windows are partitioned by nation; joins
    are key joins Catalyst plans exactly as the DataFrame equivalents."""
    for t in ("customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(CONCENTRATION_SQL)


# EXISTS through the SQL front door: Catalyst decorrelates to a left-semi
# join (same plan the DataFrame .join(..., "leftsemi") battery produces).
RETURNED_SUPPLIERS_SQL = """
SELECT s.s_nationkey AS nationkey, COUNT(*) AS n_suppliers
FROM supplier s
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_suppkey = s.s_suppkey
                AND l.l_returnflag = 'R' AND l.l_quantity > 45)
GROUP BY s.s_nationkey
"""


@register("sql_returned_supplier_counts", RETURNED_SUPPLIERS_SQL)
def q_sql_returned_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with heavy returned shipments, per nation — raw-SQL
    EXISTS subquery, decorrelated by Catalyst to a semi join with the
    returnflag/quantity filters pushed to the lineitem scan."""
    for t in ("supplier", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(RETURNED_SUPPLIERS_SQL)
