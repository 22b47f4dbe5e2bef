"""Remaining operator-class coverage: array aggregation, pivot, rank
statistics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

ARRAYAGG_ORACLE = """
SELECT o_custkey,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',')
           AS priorities,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
"""


@register("customer_order_priorities", ARRAYAGG_ORACLE)
def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set -> sorted array -> string (deterministic set agg)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count("*").alias("n_orders"),
    )


PIVOT_ORACLE = """
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE l_returnflag = 'A') AS flag_a,
       COUNT(*) FILTER (WHERE l_returnflag = 'N') AS flag_n,
       COUNT(*) FILTER (WHERE l_returnflag = 'R') AS flag_r
FROM lineitem
GROUP BY l_linestatus
"""


@register("returnflag_pivot", PIVOT_ORACLE)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list (no extra pass to
    discover pivot values — required at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .count()
        .na.fill(0)
    )
    return out.select(
        "l_linestatus",
        F.col("A").alias("flag_a"),
        F.col("N").alias("flag_n"),
        F.col("R").alias("flag_r"),
    )


NTILE_ORACLE = """
SELECT c_custkey, c_acctbal,
       CAST(NTILE(10) OVER w AS INT) AS decile,
       PERCENT_RANK() OVER w AS pct_rank
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
"""


@register("customer_acctbal_deciles", NTILE_ORACLE)
def q_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank over a total order (tie-break on custkey)."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
    )


FUZZY_ORACLE = """
WITH n AS (SELECT DISTINCT p_name AS v FROM part)
SELECT a.v AS a, b.v AS b, levenshtein(a.v, b.v) AS dist
FROM n a JOIN n b ON a.v < b.v
WHERE levenshtein(a.v, b.v) <= 2
"""


@register("fuzzy_part_names", FUZZY_ORACLE)
def q_fuzzy_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance <= 2 part-name pairs via lossless q-gram blocking
    (inverted-index candidates + Levenshtein verify — never the O(n^2)
    distance matrix the brute-force oracle computes)."""
    from amorphous_mapreduce_spark.operators.fuzzy import fuzzy_pairs

    return fuzzy_pairs(load_table(spark, sf_dir, "part"), "p_name")


# --- search-suggest (autocomplete) ranking ---------------------------------

AUTOCOMPLETE_ORACLE = """
WITH counted AS (
    SELECT substr(p_name, 1, 2) AS prefix, p_name AS suggestion,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM part
    GROUP BY prefix, suggestion
),
ranked AS (
    SELECT prefix, suggestion, cnt,
           ROW_NUMBER() OVER (PARTITION BY prefix
                              ORDER BY cnt DESC, suggestion) AS rank
    FROM counted
)
SELECT prefix, rank, suggestion, cnt
FROM ranked WHERE rank <= 3
"""


@register("part_name_autocomplete", AUTOCOMPLETE_ORACLE)
def q_part_name_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-suggest table: the top-3 most frequent part names per
    2-char typed prefix — the precomputed autocomplete index shape
    (prefix -> ranked completions). One hash aggregate on (prefix,
    name) + a grouped top-k window keyed by prefix (candidate rows are
    the DISTINCT name counts, far below the part table)."""
    part = load_table(spark, sf_dir, "part")
    counted = (
        part.select(
            F.substring("p_name", 1, 2).alias("prefix"),
            F.col("p_name").alias("suggestion"),
        )
        .groupBy("prefix", "suggestion")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("prefix").orderBy(
        F.desc("cnt"), F.asc("suggestion")
    )
    return (
        counted.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("prefix", "rank", "suggestion", "cnt")
    )
