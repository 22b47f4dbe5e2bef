"""Compliance battery: PII redaction audit + right-to-be-forgotten cascade.

Training-data pipelines at 100 TB carry two recurring legal obligations:
(1) scan free text for personally-identifying patterns and prove the
redacted output is what shipped, and (2) when a user exercises deletion
rights, propagate the tombstone through every table that references them
and prove how much survived. Both are narrow-map + keyed-aggregate
shapes — embarrassingly parallel, no driver loops, no UDFs.

Reference tie-in: the scan/transform stage is the reference's file-scan +
per-record map (W1/W3, src/word_count.rs:90-118) with a regex transform in
place of tokenization; the audit rollups are its per-key count (W7).

Cross-engine determinism: regex classes here ([0-9]{4,}) behave
identically under Java regex (Spark) and RE2 (DuckDB); content proofs use
bit_xor of functions.hashing.hex_hash64 values — order-independent,
overflow-free, replayable in DuckDB as the same md5-substring arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.hashing import hex_hash64
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

# --- PII redaction audit ----------------------------------------------------

# Digit runs of >= 4 characters: account numbers, phone fragments, the
# customer ordinal in c_name. The pattern list is pluggable; each pattern
# is one more regexp_replace in the same narrow projection (no extra pass).
_PII_RE = "[0-9]{4,}"
_MASK = "<ID>"

_SQL_RED = f"regexp_replace(c_name, '{_PII_RE}', '{_MASK}', 'g')"

PII_ORACLE = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_rows,
       CAST(SUM(len(regexp_extract_all(c_name, '{_PII_RE}'))) AS BIGINT)
           AS ids_found,
       CAST(COUNT(DISTINCT {_SQL_RED}) AS BIGINT) AS n_distinct_redacted,
       bit_xor(CAST('0x' || substr(md5({_SQL_RED}), 1, 15) AS BIGINT))
           AS redacted_xor
FROM customer
GROUP BY c_mktsegment
"""


@register("pii_redaction", PII_ORACLE)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction audit over customer names: per market segment, how
    many identifier tokens were found, how many distinct masked forms
    remain, and an order-independent content proof (bit_xor of 60-bit
    hashes) of the exact redacted bytes — the evidence row a compliance
    reviewer signs off on.

    Scale: regexp_replace/extract_all are JVM-side whole-stage-codegen
    per-row maps; the only shuffle is the final segment rollup (map-side
    combined). At 100 TB the scan cost IS the cost — there is no
    quadratic term and no skew (segments are few, partials are tiny)."""
    red = F.regexp_replace(F.col("c_name"), _PII_RE, _MASK)
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            F.size(F.regexp_extract_all(F.col("c_name"), F.lit(_PII_RE), F.lit(0)))
            .alias("n_ids"),
            hex_hash64(red).alias("h"),
            red.alias("red"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_ids").alias("ids_found"),
            F.countDistinct("red").alias("n_distinct_redacted"),
            F.expr("bit_xor(h)").alias("redacted_xor"),
        )
    )


# --- right-to-be-forgotten cascade ------------------------------------------

# Deterministic 5% tombstone cohort: the same hash both engines compute.
_TOMB_SQL = (
    "CAST('0x' || substr(md5('forget_' || CAST(c_custkey AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 20 = 0"
)

FORGET_ORACLE = f"""
WITH tomb AS (
    SELECT c_custkey FROM customer WHERE {_TOMB_SQL}
),
del_orders AS (
    SELECT o_orderkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM tomb)
),
cust AS (
    SELECT 'customer' AS tbl,
           CAST(COUNT(CASE WHEN d THEN 1 END) AS BIGINT) AS n_deleted,
           CAST(COUNT(CASE WHEN NOT d THEN 1 END) AS BIGINT) AS n_surviving,
           CAST(SUM(CASE WHEN NOT d THEN CAST(c_acctbal AS DECIMAL(12,2))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               AS surviving_value
    FROM (SELECT c_acctbal, {_TOMB_SQL} AS d FROM customer)
),
ords AS (
    SELECT 'orders' AS tbl,
           CAST(COUNT(CASE WHEN d THEN 1 END) AS BIGINT) AS n_deleted,
           CAST(COUNT(CASE WHEN NOT d THEN 1 END) AS BIGINT) AS n_surviving,
           CAST(SUM(CASE WHEN NOT d THEN CAST(o_totalprice AS DECIMAL(12,2))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               AS surviving_value
    FROM (SELECT o_totalprice,
                 o_custkey IN (SELECT c_custkey FROM tomb) AS d
          FROM orders)
),
li AS (
    SELECT 'lineitem' AS tbl,
           CAST(COUNT(CASE WHEN d THEN 1 END) AS BIGINT) AS n_deleted,
           CAST(COUNT(CASE WHEN NOT d THEN 1 END) AS BIGINT) AS n_surviving,
           CAST(SUM(CASE WHEN NOT d
                    THEN CAST(l_extendedprice AS DECIMAL(12,2))
                    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
               AS surviving_value
    FROM (SELECT l_extendedprice,
                 l_orderkey IN (SELECT o_orderkey FROM del_orders) AS d
          FROM lineitem)
)
SELECT * FROM cust UNION ALL SELECT * FROM ords UNION ALL SELECT * FROM li
"""


def _audit_row(df: DataFrame, tbl: str, deleted: Column, value: Column) -> DataFrame:
    """One (tbl, n_deleted, n_surviving, surviving_value) evidence row."""
    zero = F.lit(0).cast("decimal(12,2)")
    agg = df.select(
        deleted.alias("d"), value.cast("decimal(12,2)").alias("v")
    ).agg(
        F.sum(F.when(F.col("d"), 1).otherwise(0)).alias("n_deleted"),
        F.sum(F.when(~F.col("d"), 1).otherwise(0)).alias("n_surviving"),
        F.sum(F.when(~F.col("d"), F.col("v")).otherwise(zero))
        .cast("double")
        .alias("surviving_value"),
    )
    return agg.select(
        F.lit(tbl).alias("tbl"), "n_deleted", "n_surviving", "surviving_value"
    )


@register("forget_audit", FORGET_ORACLE)
def q_forget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: a deterministic 5% customer
    tombstone cohort propagated customer -> orders -> lineitem, with
    per-table deleted/surviving counts and the exact (decimal) value mass
    that remains — the proof sheet a deletion job emits before the
    physical rewrite (sources/merge.py applies the actual MERGE).

    Scale: each table is scanned once; membership is a left join against
    the tombstone key set, which is a fixed small fraction of the dim
    table, so AQE broadcasts it at any realistic SF. The order-key set
    for lineitem is derived, keyed, and uniform — no skew. Counts and
    sums ride one map-side-combined aggregate per table."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    tomb_pred = (
        F.pmod(
            hex_hash64(F.concat(F.lit("forget_"), F.col("c_custkey").cast("string"))),
            F.lit(20),
        )
        == 0
    )
    tomb = cust.filter(tomb_pred).select("c_custkey")

    o_flag = orders.join(
        tomb, orders.o_custkey == tomb.c_custkey, "left"
    ).select(
        "o_orderkey",
        "o_totalprice",
        F.col("c_custkey").isNotNull().alias("d"),
    )
    del_orders = o_flag.filter("d").select(
        F.col("o_orderkey").alias("l_orderkey"), F.lit(1).alias("hit")
    )
    l_flag = li.join(del_orders, "l_orderkey", "left").select(
        "l_extendedprice", F.col("hit").isNotNull().alias("d")
    )

    c_row = _audit_row(cust, "customer", tomb_pred, F.col("c_acctbal"))
    o_row = _audit_row(o_flag, "orders", F.col("d"), F.col("o_totalprice"))
    l_row = _audit_row(l_flag, "lineitem", F.col("d"), F.col("l_extendedprice"))
    return c_row.unionAll(o_row).unionAll(l_row)
