"""Economic-inequality / distribution-shape battery.

``revenue_gini`` (analytics_queries) covers the rank-based concentration
number; this module adds the *entropy-based* inequality family — Theil-T,
mean-log-deviation (Theil-L) and the Atkinson index — which decompose
additively across groups and therefore matter for a 100 TB engine: each
index is ONE keyed aggregation (no global sort/rank at all), so the whole
battery is a single shuffle on the group key.

Cross-engine determinism: logs go through functions/intlog (2^20-scaled
integer log2, shared 256-entry LUT) and the inverse 2^x through
functions/intexp — libm never touches the data path.  Per-row products
``cents * log`` are summed in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
and converted to double via the hi/lo int64 split (the
rolling_correlation_14d gotcha: DuckDB mis-rounds int128 -> double by
1 ulp past 2^63).

Reference tie-in: VecOp reduce semantics (src/op.rs:18-35) — a grouped
sum of per-row transformed values.

Bounds (documented, loud on overflow under Spark ANSI): per-customer
cents < 2^63 / 2^26 (~$1.4B) keeps the per-row product in int64; the
centered Theil numerator stays under 2^63 for any realistic spread at
sf <= 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.intexp import exp2_scaled, exp2_scaled_sql
from amorphous_mapreduce_spark.functions.intlog import log2_scaled, log2_scaled_sql
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

INEQUALITY_ORACLE = f"""
WITH cust AS (
    SELECT c_mktsegment AS segment, o_custkey AS c,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1, 2
), lg AS (
    SELECT segment, cents, {log2_scaled_sql('cents')} AS l FROM cust
), agg AS (
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(SUM(l) AS BIGINT) AS suml,
           SUM(CAST(cents * l AS HUGEINT)) AS a
    FROM lg GROUP BY 1
), m AS (
    SELECT segment, n, total_cents, suml, a,
           ({log2_scaled_sql('total_cents')} - {log2_scaled_sql('n')}) AS lmu
    FROM agg
), d AS (
    SELECT segment, n, total_cents, suml, lmu,
           greatest(a - CAST(total_cents AS HUGEINT) * lmu, 0) AS dt,
           greatest(n * lmu - suml, CAST(0 AS BIGINT)) AS dl
    FROM m
)
SELECT segment, n, total_cents,
       CAST(total_cents AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
       (CAST((dt // 1048576) AS DOUBLE) * 1048576.0
        + CAST((dt % 1048576) AS DOUBLE))
         / (CAST(total_cents AS DOUBLE) * 1048576.0) AS theil_t_bits,
       CAST(dl AS DOUBLE) / (CAST(n AS DOUBLE) * 1048576.0) AS mld_bits,
       1.0 - {exp2_scaled_sql('-(dl // n)')} AS atkinson_eps1,
       {exp2_scaled_sql('suml // n')} AS geomean_cents
FROM d
ORDER BY segment
"""


@register("inequality_indices", INEQUALITY_ORACLE)
def q_inequality_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T / mean-log-deviation / Atkinson(eps=1) revenue inequality
    per market segment.

    Unlike the Gini (which needs a global rank), the entropy family is a
    pure grouped aggregation: per-customer revenue -> one agg per
    segment.  At 100 TB that is two shuffles total (customer rollup,
    segment rollup), no sort.  Logs are 2^20-scaled integer log2
    (intlog); the Atkinson index re-exponentiates the mean log deviation
    through intexp, so every value is bit-identical across engines.
    Theil-T numerator Sum(x*L) - T*Lmu accumulates in DECIMAL(38,0) and
    crosses to double via the hi/lo split.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cust = (
        orders.join(
            customer.select("c_custkey", "c_mktsegment"),
            orders.o_custkey == customer.c_custkey,
        )
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_custkey").alias("c"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("segment", "c")
        .agg(F.sum("cents").alias("cents"))
    )
    lg = cust.select("segment", "cents", log2_scaled("cents").alias("l"))
    agg = lg.groupBy("segment").agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("total_cents"),
        F.sum("l").alias("suml"),
        F.sum((F.col("cents") * F.col("l")).cast("decimal(38,0)")).alias("a"),
    )
    m = agg.select(
        "segment",
        "n",
        "total_cents",
        "suml",
        "a",
        (log2_scaled("total_cents") - log2_scaled("n")).alias("lmu"),
    )
    d = m.select(
        "segment",
        "n",
        "total_cents",
        "suml",
        "lmu",
        F.greatest(
            F.col("a")
            - F.col("total_cents").cast("decimal(38,0)") * F.col("lmu"),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("dt"),
        F.greatest(
            F.col("n") * F.col("lmu") - F.col("suml"), F.lit(0).cast("long")
        ).alias("dl"),
    )
    dt_lo = F.pmod(F.col("dt"), F.lit(1048576)).cast("long")
    dt_hi = (
        (F.col("dt") - F.pmod(F.col("dt"), F.lit(1048576))) / F.lit(1048576)
    ).cast("long")
    return d.select(
        "segment",
        "n",
        "total_cents",
        (F.col("total_cents").cast("double") / F.col("n").cast("double")).alias(
            "mean_cents"
        ),
        (
            (dt_hi.cast("double") * F.lit(1048576.0) + dt_lo.cast("double"))
            / (F.col("total_cents").cast("double") * F.lit(1048576.0))
        ).alias("theil_t_bits"),
        (
            F.col("dl").cast("double")
            / (F.col("n").cast("double") * F.lit(1048576.0))
        ).alias("mld_bits"),
        (F.lit(1.0) - exp2_scaled("-(dl div n)")).alias("atkinson_eps1"),
        exp2_scaled("suml div n").alias("geomean_cents"),
    ).orderBy("segment")
