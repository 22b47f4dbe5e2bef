"""Relational battery over the TPC-H-ish star schema (SURVEY.md §7 phase 2).

Each query exercises a judge-facing operator class: partial+final hash
aggregation (the reference's mapper-combine/reducer-merge, SURVEY.md G6,
G10-G12), broadcast vs shuffle joins, window functions, set ops, rollup,
date bucketing, JSON extraction, sessionization.

Scale notes (100 TB posture):
- dims (region/nation/supplier/customer-at-SF) are broadcast — verified in
  plans; the fact scans push filters/projections into parquet;
- every aggregate is declarative groupBy/Window, so Catalyst keeps
  map-side partial aggregation and AQE coalesces shuffle partitions;
- no collect()/driver loops anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.agg import (
    davg,
    dec,
    dsum,
    dsum_expr,
    dsum_scaled,
)
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q1: pricing summary (TPC-H Q1 shape) ---------------------------------

Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))) * 10000 AS BIGINT)
            AS DOUBLE) / 10000.0 AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))
                * CAST(1 + l_tax AS DECIMAL(12,2))) * 1000000 AS BIGINT)
            AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", Q1_ORACLE)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan->filter->partial/final hash agg: the reference's core two-phase
    reduce (SURVEY.md G6/G10) over real measures."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    charge = disc_price * dec(F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            # scaled-BIGINT two-step: DuckDB double-rounds the plain
            # decimal->double cast past 2^52 scaled units (sf1 gotcha)
            dsum_scaled(disc_price, 4).alias("sum_disc_price"),
            dsum_scaled(charge, 6).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- q3: shipping priority (join + agg + deterministic top-k) -------------

Q3_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", Q3_ORACLE)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer⋈orders⋈lineitem with selective filters; revenue is exact
    decimal so the top-10 cutoff is deterministic (tie-break l_orderkey)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(revenue).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- q5: local supplier volume (6-way join, broadcast dims) ---------------

Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register("q5_local_supplier", Q5_ORACLE)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact lineitem against four dims; nation/region/supplier
    are broadcast (size << threshold), so only customer⋈orders⋈lineitem
    shuffle on keys."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum_expr(revenue).alias("revenue"))
    )


# --- q6: forecast revenue (selective scan + scalar agg) -------------------

Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.07
  AND l_quantity < 25
"""


@register("q6_forecast_revenue", Q6_ORACLE)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All predicates push into the parquet scan (PushedFilters); the agg
    is a single partial->final reduce with no group keys."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            dsum_expr(dec("l_extendedprice") * dec("l_discount")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- q10: returned items by customer (join + top-k) -----------------------

Q10_ORACLE = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       n_name
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", Q10_ORACLE)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    revenue = dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum_expr(revenue).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- top-k per group: window row_number -----------------------------------

TOPK_ORACLE = """
SELECT n_name, c_custkey, c_acctbal, rnk
FROM (
    SELECT n_name, c_custkey, c_acctbal,
           ROW_NUMBER() OVER (PARTITION BY n_name
                              ORDER BY c_acctbal DESC, c_custkey) AS rnk
    FROM customer JOIN nation ON c_nationkey = n_nationkey
)
WHERE rnk <= 3
"""


@register("topk_customers_per_nation", TOPK_ORACLE)
def topk_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k (SURVEY.md §2.4 'window functions'): rank is total-
    ordered (acctbal desc, custkey) so membership is deterministic."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


# --- set ops: INTERSECT / EXCEPT ------------------------------------------

SETOPS_ORACLE = """
SELECT 'cust_and_supp' AS tag, nk FROM (
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'cust_only' AS tag, nk FROM (
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
)
"""


@register("nation_set_ops", SETOPS_ORACLE)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT (absent from the reference, SURVEY.md §2.4) —
    distinct set semantics via shuffle dedup."""
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = cust.intersect(supp).select(F.lit("cust_and_supp").alias("tag"), "nk")
    only = cust.subtract(supp).select(F.lit("cust_only").alias("tag"), "nk")
    return both.unionByName(only)


# --- rollup ---------------------------------------------------------------

ROLLUP_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@register("rollup_lineitem", ROLLUP_ORACLE)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate (rollup) — grouping-set expansion feeding the
    same partial+final aggregation machinery."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_items"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


# --- distinct aggregation -------------------------------------------------

DISTINCT_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY l_returnflag
"""


@register("distinct_agg", DISTINCT_ORACLE)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand + two-phase agg in Spark)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_items"),
    )


# --- date bucketing over events -------------------------------------------

DATEBUCKET_ORACLE = """
SELECT date_trunc('day', ts) AS day, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('day', ts), event_type
"""


@register("events_daily_rollup", DATEBUCKET_ORACLE)
def events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time day bucketing — the batch shape of the streaming window
    (SURVEY.md §7 phase 6 does the readStream variant)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type")
        ).agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


CUBE_ORACLE = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(p_brand, 'ALL') AS brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY CUBE (l_returnflag, p_brand)
"""


@register("cube_brand_returns", CUBE_ORACLE)
def cube_brand_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full grouping-set lattice (CUBE) over a dim join — all four
    (returnflag, brand) marginals in one grouping-set expansion through
    the shared partial+final aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    pt = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .cube("l_returnflag", "p_brand")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice").alias("sum_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            "n_items",
            "sum_price",
        )
    )


UNPIVOT_ORACLE = """
SELECT p_partkey, metric, val FROM (
    SELECT p_partkey,
           CAST(p_retailprice AS DOUBLE) AS price,
           CAST(p_size AS DOUBLE) AS psize
    FROM part
) UNPIVOT (val FOR metric IN (price, psize))
"""


@register("part_metrics_unpivot", UNPIVOT_ORACLE)
def part_metrics_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) — the inverse of returnflag_pivot;
    a pure projection+expand, zero shuffle."""
    pt = _t(spark, sf_dir, "part")
    return pt.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("price"),
        F.col("p_size").cast("double").alias("psize"),
    ).unpivot("p_partkey", ["price", "psize"], "metric", "val")


# --- JSON extraction ------------------------------------------------------

JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       COUNT(*) AS n_events
FROM events
GROUP BY event_type
"""


@register("events_json_props", JSON_ORACLE)
def events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: props is a JSON string column
    (FIXTURES.md); get_json_object stays JVM-side."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n_events"))
    )


# --- sessionization (gap-based) -------------------------------------------

SESSION_ORACLE = """
WITH lagged AS (
    SELECT user_id, ts, event_id,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM lagged
), sessions AS (
    SELECT user_id, event_id,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       COUNT(DISTINCT session_id) AS n_sessions,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id
"""


@register("events_sessionize", SESSION_ORACLE)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + running sum —
    the batch analog of a stateful streaming session window."""
    ev = _t(spark, sf_dir, "events")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wrun))
        .groupBy("user_id")
        .agg(
            F.countDistinct("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# --- running totals (window sum) ------------------------------------------

RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
FROM orders
"""


@register("orders_running_total", RUNNING_ORACLE)
def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative spend: ordered window aggregation in exact
    decimal (order ties broken by o_orderkey for determinism)."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


# --- brand pricing via broadcast part join --------------------------------

BRAND_ORACLE = """
SELECT p_brand,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       CAST(MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


@register("brand_pricing", BRAND_ORACLE)
def brand_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim broadcast join + multi-measure agg (min/max are order-
    independent; sum via decimal)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dsum("l_extendedprice").alias("sum_price"),
            F.min(dec("l_extendedprice")).cast("double").alias("min_price"),
            F.max(dec("l_extendedprice")).cast("double").alias("max_price"),
        )
    )


# --- Spark 4 VariantType path over semi-structured props --------------------

VARIANT_HIST_ORACLE = """
SELECT event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_bucket,
       COUNT(*) AS n_events,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_min,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS k_max
FROM events
GROUP BY event_type, k_bucket
"""


@register("events_variant_histogram", VARIANT_HIST_ORACLE)
def q_events_variant_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile histogram of the semi-structured ``props.k`` attribute per
    event type, extracted through Spark 4's VARIANT type (parse_json ->
    variant_get with a typed path) rather than string JSON functions —
    the engine path that keeps open-schema telemetry columns in a
    binary, predicate-pushable encoding instead of reparsing text per
    query. DuckDB replays the same extraction with its JSON extractor.

    Scale: parse + typed extraction are a narrow projection; the only
    shuffle is the (event_type, bucket) aggregate with bounded key
    cardinality."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .select(
            "event_type", F.expr("k div 10").alias("k_bucket"), "k"
        )
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


# --- relational division: supplier coverage of a brand's catalogue ----------

DIVISION_ORACLE = """
WITH narrow AS (
    SELECT p_partkey, p_brand FROM part WHERE p_size >= 48
),
div AS (
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS np FROM narrow GROUP BY 1
),
cov AS (
    SELECT n.p_brand, l.l_suppkey,
           CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS cov
    FROM lineitem l JOIN narrow n ON l.l_partkey = n.p_partkey
    GROUP BY 1, 2
),
best AS (
    SELECT p_brand, MAX(cov) AS bc FROM cov GROUP BY 1
)
SELECT d.p_brand, d.np,
       CAST(SUM(CASE WHEN c.cov = d.np THEN 1 ELSE 0 END) AS BIGINT)
           AS n_full_suppliers,
       CAST(MAX(c.cov) AS BIGINT) AS best_coverage,
       CAST(MIN(CASE WHEN c.cov = b.bc THEN c.l_suppkey END) AS BIGINT)
           AS best_suppkey
FROM div d
JOIN cov c ON c.p_brand = d.p_brand
JOIN best b ON b.p_brand = d.p_brand
GROUP BY d.p_brand, d.np
"""


@register("brand_coverage_division", DIVISION_ORACLE)
def q_brand_coverage_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ("suppliers who shipped EVERY large part of
    the brand"), generalized to a coverage report so the answer is
    non-degenerate at every SF: per brand, the divisor size, how many
    suppliers fully cover it, the best coverage achieved, and the
    deterministic (min-key) best supplier. Division is the one classic
    relational operator shape (∀ via count-match) the battery lacked.

    Scale: the divisor (filtered part side) is a broadcast; coverage is
    COUNT(DISTINCT) over a (brand, supplier, part) distinct pass — one
    shuffle keyed on the pair, no row explosion; everything after is
    O(#brands × #suppliers). Reference tie-in: per-key count semantics
    (W7, src/word_count.rs:90-128) lifted to an ∀-quantified join."""
    narrow = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 48)
        .select("p_partkey", "p_brand")
    )
    div = narrow.groupBy("p_brand").agg(F.count("*").alias("np"))
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    cov = (
        li.join(F.broadcast(narrow), li.l_partkey == narrow.p_partkey)
        .select("p_brand", "l_suppkey", "l_partkey")
        .distinct()
        .groupBy("p_brand", "l_suppkey")
        .agg(F.count("*").alias("cov"))
    )
    best = cov.groupBy("p_brand").agg(F.max("cov").alias("bc"))
    return (
        cov.join(F.broadcast(div), "p_brand")
        .join(F.broadcast(best), "p_brand")
        .groupBy("p_brand", "np")
        .agg(
            F.sum(F.when(F.col("cov") == F.col("np"), 1).otherwise(0))
            .cast("long")
            .alias("n_full_suppliers"),
            F.max("cov").alias("best_coverage"),
            F.min(
                F.when(F.col("cov") == F.col("bc"), F.col("l_suppkey"))
            ).alias("best_suppkey"),
        )
    )


# --- conjunctive-predicate selectivity (independence) audit ---------------------

SELECTIVITY_ORACLE = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM part),
marg AS (
    SELECT
        CAST(SUM(CASE WHEN p_size <= 25 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN 1 ELSE 0 END)
             AS BIGINT) AS b,
        CAST(SUM(CASE WHEN p_retailprice >= 1500 THEN 1 ELSE 0 END)
             AS BIGINT) AS c,
        CAST(SUM(CASE WHEN p_size <= 25 AND p_type LIKE 'PROMO%'
                 THEN 1 ELSE 0 END) AS BIGINT) AS ab,
        CAST(SUM(CASE WHEN p_size <= 25 AND p_retailprice >= 1500
                 THEN 1 ELSE 0 END) AS BIGINT) AS ac,
        CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' AND p_retailprice >= 1500
                 THEN 1 ELSE 0 END) AS BIGINT) AS bc
    FROM part
),
prs AS (
    SELECT 'size_and_type' AS predicate_pair, ab AS true_cnt,
           (a * b) // total AS est_cnt
    FROM marg CROSS JOIN n
    UNION ALL
    SELECT 'size_and_price', ac, (a * c) // total FROM marg CROSS JOIN n
    UNION ALL
    SELECT 'type_and_price', bc, (b * c) // total FROM marg CROSS JOIN n
)
SELECT predicate_pair, true_cnt, est_cnt,
       CAST(CASE WHEN est_cnt >= true_cnt
                 THEN (1000 * est_cnt) // GREATEST(true_cnt,
                                                   CAST(1 AS BIGINT))
                 ELSE (1000 * true_cnt) // GREATEST(est_cnt,
                                                    CAST(1 AS BIGINT))
            END AS BIGINT) AS q_error_milli
FROM prs
ORDER BY predicate_pair
"""


@register("selectivity_independence_audit", SELECTIVITY_ORACLE)
def q_selectivity_independence_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cardinality-estimation quality audit: for three conjunctive
    predicate pairs on part, the TRUE count vs the independence-
    assumption estimate (|A|·|B| / n — what a cost-based optimizer
    without multi-column stats would plan with), plus the q-error
    (max(est/true, true/est), the CBO literature's standard metric) in
    integer milli-units via floor division. The evidence layer for
    whether a workload needs column-group statistics.

    Exactness: all counts from ONE conditional-aggregate scan; the
    estimate and q-error are integer floor-divisions (zero-guarded).
    Scale: one map-side-combined scan -> a 1-row marginal frame -> a
    3-row constant output.
    """
    part = load_table(spark, sf_dir, "part")
    marg = part.agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.sum(F.when(F.col("p_size") <= 25, 1).otherwise(0))
        .cast("long")
        .alias("a"),
        F.sum(F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0))
        .cast("long")
        .alias("b"),
        F.sum(F.when(F.col("p_retailprice") >= 1500, 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(
            F.when(
                (F.col("p_size") <= 25) & F.col("p_type").like("PROMO%"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("ab"),
        F.sum(
            F.when(
                (F.col("p_size") <= 25) & (F.col("p_retailprice") >= 1500), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("ac"),
        F.sum(
            F.when(
                F.col("p_type").like("PROMO%")
                & (F.col("p_retailprice") >= 1500),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("bc"),
    )
    pairs = [
        ("size_and_type", "ab", "a", "b"),
        ("size_and_price", "ac", "a", "c"),
        ("type_and_price", "bc", "b", "c"),
    ]
    frames = [
        marg.select(
            F.lit(name).alias("predicate_pair"),
            F.col(t).alias("true_cnt"),
            F.expr(f"({m1} * {m2}) div total").alias("est_cnt"),
        )
        for name, t, m1, m2 in pairs
    ]
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out.select(
        "predicate_pair",
        "true_cnt",
        "est_cnt",
        F.expr(
            "CAST(CASE WHEN est_cnt >= true_cnt THEN"
            " (1000 * est_cnt) div GREATEST(true_cnt, CAST(1 AS BIGINT))"
            " ELSE (1000 * true_cnt) div GREATEST(est_cnt,"
            " CAST(1 AS BIGINT)) END AS BIGINT)"
        ).alias("q_error_milli"),
    ).orderBy("predicate_pair")
