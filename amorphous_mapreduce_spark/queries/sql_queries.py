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


# WITH RECURSIVE through the SQL front door (Spark 4 recursive CTE):
# BFS over the dominant event-transition graph. Nodes are
# (event_type, value-band); only each node's top-2 outgoing transitions
# survive (scale-free sparsification — a fixed count threshold would
# densify as SF grows). FLOOR before CAST: Spark CAST(double AS INT)
# truncates but DuckDB CAST rounds; FLOOR's integral result makes them
# agree (Spark has no 1-arg numeric TRUNC). The recursion is bounded by
# the node domain (types x bands) and the depth guard, never by volume.
REACHABILITY_SQL = """
WITH RECURSIVE nodes AS (
    SELECT event_id, user_id,
           event_type || '_' || CAST(FLOOR(value / 120) AS INT) AS node
    FROM events
), trans AS (
    SELECT src, dst, COUNT(*) AS w FROM (
        SELECT node AS src,
               lead(node) OVER (PARTITION BY user_id ORDER BY event_id) AS dst
        FROM nodes
    ) WHERE dst IS NOT NULL AND dst <> src
    GROUP BY src, dst
), edges AS (
    SELECT src, dst, w FROM (
        SELECT src, dst, w,
               ROW_NUMBER() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rk
        FROM trans
    ) WHERE rk <= 2
), reach(node, dist) AS (
    SELECT 'signup_0', 0
    UNION ALL
    SELECT e.dst, r.dist + 1
    FROM reach r JOIN edges e ON e.src = r.node
    WHERE r.dist < 10
)
SELECT node, MIN(dist) AS hops FROM reach GROUP BY node
"""


@register("sql_funnel_reachability", REACHABILITY_SQL)
def q_sql_funnel_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-hop reachability from the signup state over the
    dominant-transition graph — ONE recursive SQL string executed by
    BOTH engines (Spark 4 WITH RECURSIVE; the engine's fourth entry
    surface after DataFrame, streaming, and plain SQL). The recursive
    step joins the frontier to a types-x-bands edge list: per-iteration
    work is bounded by the node domain, the same loop shape as
    operators/graph.py bfs_hops."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(REACHABILITY_SQL)


# LATERAL correlated table subquery through the SQL front door: top-2
# orders per high-balance customer. Catalyst plans the LATERAL as a
# ranked window/join (DuckDB runs the same text natively) — the
# per-row-subquery shape every BI tool emits for "top N per entity".
LATERAL_TOPN_SQL = """
SELECT c.c_custkey AS custkey, c.c_nationkey AS nationkey,
       t.o_orderkey AS orderkey, t.cents AS order_cents, t.rk AS order_rank
FROM customer c,
LATERAL (
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents,
           ROW_NUMBER() OVER (ORDER BY
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               DESC, o_orderkey) AS rk
    FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY cents DESC, o_orderkey
    LIMIT 2
) t
WHERE c.c_acctbal > 9000
ORDER BY custkey, order_rank
"""


@register("sql_lateral_topn", LATERAL_TOPN_SQL)
def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per high-balance customer via a LATERAL correlated
    subquery — ONE SQL string on both engines (Spark 4 LATERAL =
    DuckDB LATERAL). The acctbal filter prunes the outer side before
    the correlation; cents and the in-subquery rank carry total-order
    tie-breaks so the row set is engine-exact."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(LATERAL_TOPN_SQL)


# Rolling market share through the SQL front door: monthly brand revenue,
# share of the month's total (window over month), and the 3-month rolling
# share (named-WINDOW frame over the brand's month series). Integer-cents
# window sums (each CAST back from DuckDB's HUGEINT) with single double
# divisions; the WINDOW clause itself is part of the dialect surface this
# battery proves.
ROLLING_SHARE_SQL = """
WITH m AS (
    SELECT p.p_brand AS brand,
           year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 AS month_idx,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY p.p_brand, year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
),
w AS (
    SELECT brand, month_idx, cents,
           CAST(SUM(cents) OVER (PARTITION BY month_idx) AS BIGINT) AS mt
    FROM m
)
SELECT brand, month_idx, cents, mt AS month_cents,
       CAST(cents AS DOUBLE) / CAST(mt AS DOUBLE) AS share,
       CAST(SUM(cents) OVER wb AS BIGINT) AS cents_3m,
       CAST(SUM(mt) OVER wb AS BIGINT) AS month_cents_3m,
       CAST(CAST(SUM(cents) OVER wb AS BIGINT) AS DOUBLE)
           / CAST(CAST(SUM(mt) OVER wb AS BIGINT) AS DOUBLE) AS share_3m
FROM w
WINDOW wb AS (PARTITION BY brand ORDER BY month_idx
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


@register("sql_rolling_share", ROLLING_SHARE_SQL)
def q_sql_rolling_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly brand revenue share + 3-month rolling share via ONE SQL
    string on both engines — exercises the named-WINDOW clause, framed
    window sums, and the integer-cents share discipline through the raw
    SQL entry point. All windows are keyed (month / brand) — no global
    partitions."""
    for t in ("lineitem", "part", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(ROLLING_SHARE_SQL)


# Modern-SQL surface probe: aggregate FILTER clauses + GROUP BY ALL in
# ONE string both engines parse (Spark 4.1 and DuckDB both support the
# standard FILTER (WHERE ...) aggregate modifier and the GROUP BY ALL
# shorthand; QUALIFY, by contrast, does NOT parse in Spark — see
# CLAUDE.md). Revenue stays in DECIMAL until one final DOUBLE cast.
FILTERED_ROLLUP_SQL = """
SELECT n.n_name AS nation,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o.o_orderpriority LIKE '1-%') AS n_urgent,
       COUNT(*) FILTER (WHERE o.o_orderstatus = 'F') AS n_finished,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2)))
            FILTER (WHERE o.o_orderpriority LIKE '1-%') AS DOUBLE)
           AS urgent_revenue,
       MIN(o.o_orderdate) AS first_order_ts,
       MAX(o.o_orderdate) AS last_order_ts
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY ALL
ORDER BY nation
"""


@register("sql_filtered_rollup", FILTERED_ROLLUP_SQL)
def q_sql_filtered_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation order rollup through the raw-SQL entry point using the
    standard aggregate FILTER clause (conditional aggregation without
    CASE scaffolding) and GROUP BY ALL — one string, both engines.
    Catalyst plans the FILTERed aggregates as the same conditional
    hash-aggregate the CASE form produces; the nation dim broadcasts.
    Proves the SQL front door covers the modern-ANSI subset users
    actually write (SURVEY.md §3.5)."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(FILTERED_ROLLUP_SQL)


# PIVOT through the SQL front door: the month x segment revenue matrix.
# Cents are summed as BIGINT inside the decimal cast then converted to
# DOUBLE before the pivot aggregate, so DuckDB's SUM(BIGINT)->HUGEINT
# widening never reaches the output and every cell is an exact-integer
# double (< 2^53). The un-aliased `SUM(c) FOR seg IN (...)` spelling is
# the one both parsers turn into identical column names (aliased pivot
# columns diverge: DuckDB emits x_s where Spark emits x).
PIVOT_REVENUE_SQL = """
WITH base AS (
    SELECT CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                AS BIGINT) AS m,
           c.c_mktsegment AS seg,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                AS BIGINT)) AS DOUBLE) AS c
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
)
SELECT * FROM base
PIVOT (SUM(c) FOR seg IN ('AUTOMOBILE', 'BUILDING', 'FURNITURE',
                          'HOUSEHOLD', 'MACHINERY'))
ORDER BY m
"""


@register("sql_pivot_revenue", PIVOT_REVENUE_SQL)
def q_sql_pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month x market-segment revenue matrix via the standard PIVOT
    clause — one string, both engines (completes the reshape pair with
    the DataFrame-side unpivot query). Catalyst rewrites PIVOT into the
    same conditional-aggregate plan the CASE spelling produces: one
    keyed aggregate over orders x broadcast customer, zero extra
    shuffles for the reshape itself."""
    for t in ("orders", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(PIVOT_REVENUE_SQL)


# GROUPING SETS + GROUPING() through the SQL front door — the
# multi-grain rollup as ONE string both engines parse identically
# (the DataFrame-side grouping-sets query covers the API route).
GROUPING_SETS_SQL = """
SELECT n.n_name AS nation, o.o_orderpriority AS priority,
       CAST(GROUPING(n.n_name) AS BIGINT) AS g_nation,
       CAST(GROUPING(o.o_orderpriority) AS BIGINT) AS g_priority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
           AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY GROUPING SETS ((n.n_name, o.o_orderpriority), (n.n_name), ())
ORDER BY g_nation, g_priority, nation, priority
"""


@register("sql_grouping_sets_profile", GROUPING_SETS_SQL)
def q_sql_grouping_sets_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation x priority revenue at three grains in one pass via
    GROUPING SETS, with GROUPING() flags disambiguating the NULLs —
    one string, both engines. Catalyst expands to the same
    Expand+HashAggregate the DataFrame rollup/cube battery produces;
    revenue follows the decimal-accumulate convention."""
    for t in ("orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(GROUPING_SETS_SQL)


# INTERSECT / EXCEPT through the SQL front door: customer-id audience
# algebra between the order and event domains. DISTINCT set semantics
# on both engines; the scalar subqueries keep the output a 1-row
# scorecard.
SET_OPS_SQL = """
SELECT
    (SELECT COUNT(*) FROM (
        SELECT o_custkey FROM orders
        INTERSECT SELECT user_id FROM events)) AS buyers_also_active,
    (SELECT COUNT(*) FROM (
        SELECT o_custkey FROM orders
        EXCEPT SELECT user_id FROM events)) AS buyers_never_active,
    (SELECT COUNT(*) FROM (
        SELECT user_id FROM events
        EXCEPT SELECT o_custkey FROM orders)) AS active_never_bought,
    (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_buyers,
    (SELECT COUNT(DISTINCT user_id) FROM events) AS n_active
"""


@register("sql_set_ops_audit", SET_OPS_SQL)
def q_sql_set_ops_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap scorecard via INTERSECT / EXCEPT — one string,
    both engines. Catalyst plans the set operations as the same
    left-semi/left-anti aggregates the DataFrame battery uses; each
    branch is a distinct-key shuffle bounded by the id domain."""
    for t in ("orders", "events"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SET_OPS_SQL)
