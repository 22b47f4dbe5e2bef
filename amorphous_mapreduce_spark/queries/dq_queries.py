"""Data-quality expectation suite (Deequ-style) over the star schema.

One registered query evaluates every expectation — row presence, primary
key uniqueness, null-free keys, domain ranges, and internal consistency
(n_chars == length(text), fixed embedding dimensionality) — and emits one
row per check: [table_name, check_name, observed, passed].

`observed` is always the VIOLATION count (0 = healthy) except for the
row_count checks, where it is the row count itself; `passed` is an int
flag. Every check is a scalar aggregate over one table scan — at 100 TB
each check is a single pushed-down column scan + partial agg, and the
union of 1-row frames is free. A platform runs this after every load;
registering it makes the whole suite one oracle-checked artifact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

# (table, check, duckdb observed-expression); observed is a BIGINT.
_CHECKS: list[tuple[str, str, str]] = [
    ("region", "row_count", "SELECT COUNT(*) FROM region"),
    (
        "region",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT r_regionkey) FROM region",
    ),
    ("nation", "row_count", "SELECT COUNT(*) FROM nation"),
    (
        "nation",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT n_nationkey) FROM nation",
    ),
    (
        "nation",
        "fk_not_null",
        "SELECT COUNT(*) FILTER (n_regionkey IS NULL) FROM nation",
    ),
    ("customer", "row_count", "SELECT COUNT(*) FROM customer"),
    (
        "customer",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT c_custkey) FROM customer",
    ),
    ("supplier", "row_count", "SELECT COUNT(*) FROM supplier"),
    (
        "supplier",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT s_suppkey) FROM supplier",
    ),
    ("part", "row_count", "SELECT COUNT(*) FROM part"),
    (
        "part",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT p_partkey) FROM part",
    ),
    (
        "part",
        "price_positive",
        "SELECT COUNT(*) FILTER (p_retailprice <= 0) FROM part",
    ),
    ("orders", "row_count", "SELECT COUNT(*) FROM orders"),
    (
        "orders",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders",
    ),
    (
        "orders",
        "date_not_null",
        "SELECT COUNT(*) FILTER (o_orderdate IS NULL) FROM orders",
    ),
    ("lineitem", "row_count", "SELECT COUNT(*) FROM lineitem"),
    (
        "lineitem",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) "
        "FROM lineitem",
    ),
    (
        "lineitem",
        "quantity_positive",
        "SELECT COUNT(*) FILTER (l_quantity <= 0) FROM lineitem",
    ),
    (
        "lineitem",
        "discount_in_unit_range",
        "SELECT COUNT(*) FILTER (l_discount < 0 OR l_discount > 1) "
        "FROM lineitem",
    ),
    ("events", "row_count", "SELECT COUNT(*) FROM events"),
    (
        "events",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT event_id) FROM events",
    ),
    ("events", "ts_not_null", "SELECT COUNT(*) FILTER (ts IS NULL) FROM events"),
    ("documents", "row_count", "SELECT COUNT(*) FROM documents"),
    (
        "documents",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents",
    ),
    (
        "documents",
        "n_chars_consistent",
        "SELECT COUNT(*) FILTER (n_chars <> length(text)) FROM documents",
    ),
    ("embeddings", "row_count", "SELECT COUNT(*) FROM embeddings"),
    (
        "embeddings",
        "pk_unique",
        "SELECT COUNT(*) - COUNT(DISTINCT vec_id) FROM embeddings",
    ),
    (
        "embeddings",
        "fixed_dim",
        "SELECT COUNT(DISTINCT len(embedding)) - 1 FROM embeddings",
    ),
]

DQ_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS table_name, '{c}' AS check_name, "
    f"CAST(({sql}) AS BIGINT) AS observed, "
    f"CASE WHEN ({sql}) {'> 0' if c == 'row_count' else '= 0'} "
    f"THEN 1 ELSE 0 END AS passed"
    for t, c, sql in _CHECKS
)


def _check_frame(
    spark: SparkSession, sf_dir: str, table: str, check: str
) -> DataFrame:
    df = load_table(spark, sf_dir, table)
    if check == "row_count":
        obs = df.agg(F.count("*").cast("long").alias("observed"))
    elif check == "pk_unique":
        pk = {
            "region": ["r_regionkey"],
            "nation": ["n_nationkey"],
            "customer": ["c_custkey"],
            "supplier": ["s_suppkey"],
            "part": ["p_partkey"],
            "orders": ["o_orderkey"],
            "lineitem": ["l_orderkey", "l_linenumber"],
            "events": ["event_id"],
            "documents": ["doc_id"],
            "embeddings": ["vec_id"],
        }[table]
        obs = df.agg(
            (F.count("*") - F.count_distinct(*[F.col(c) for c in pk]))
            .cast("long")
            .alias("observed")
        )
    elif check == "fk_not_null":
        obs = df.agg(
            F.count(F.when(F.col("n_regionkey").isNull(), 1))
            .cast("long")
            .alias("observed")
        )
    elif check == "price_positive":
        obs = df.agg(
            F.count(F.when(F.col("p_retailprice") <= 0, 1))
            .cast("long")
            .alias("observed")
        )
    elif check == "date_not_null":
        obs = df.agg(
            F.count(F.when(F.col("o_orderdate").isNull(), 1))
            .cast("long")
            .alias("observed")
        )
    elif check == "quantity_positive":
        obs = df.agg(
            F.count(F.when(F.col("l_quantity") <= 0, 1))
            .cast("long")
            .alias("observed")
        )
    elif check == "discount_in_unit_range":
        obs = df.agg(
            F.count(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            )
            .cast("long")
            .alias("observed")
        )
    elif check == "ts_not_null":
        obs = df.agg(
            F.count(F.when(F.col("ts").isNull(), 1)).cast("long").alias("observed")
        )
    elif check == "n_chars_consistent":
        obs = df.agg(
            F.count(F.when(F.col("n_chars") != F.length("text"), 1))
            .cast("long")
            .alias("observed")
        )
    elif check == "fixed_dim":
        obs = df.agg(
            (F.count_distinct(F.size("embedding")) - F.lit(1))
            .cast("long")
            .alias("observed")
        )
    else:  # pragma: no cover
        raise ValueError(check)
    passed = (
        (F.col("observed") > 0) if check == "row_count" else (F.col("observed") == 0)
    )
    return obs.select(
        F.lit(table).alias("table_name"),
        F.lit(check).alias("check_name"),
        "observed",
        F.when(passed, 1).otherwise(0).alias("passed"),
    )


@register("dq_expectations", DQ_ORACLE)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full expectation suite: 28 checks over 10 tables, one row
    each. Every check compiles to a pushed-down scalar aggregate; the
    suite is their union — the post-load verification a warehouse runs
    unconditionally."""
    frames = [_check_frame(spark, sf_dir, t, c) for t, c, _ in _CHECKS]
    return reduce(DataFrame.unionByName, frames)


# --- distribution-drift monitor (two-sample chi-square scorecard) -----------

_DRIFT_SPLIT = "2024-01-16 00:00:00"

DRIFT_ORACLE = f"""
WITH e AS (
    SELECT event_type,
           LEAST(CAST(FLOOR(value / 50.0) AS BIGINT), 9) AS bucket,
           CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 1 ELSE 0 END AS ref
    FROM events
),
per AS (
    SELECT event_type, bucket,
           CAST(SUM(ref) AS BIGINT) AS n_ref,
           CAST(SUM(1 - ref) AS BIGINT) AS n_cur
    FROM e GROUP BY event_type, bucket
),
tot AS (
    SELECT event_type,
           CAST(SUM(n_ref) AS BIGINT) AS tot_ref,
           CAST(SUM(n_cur) AS BIGINT) AS tot_cur
    FROM per GROUP BY event_type
)
SELECT p.event_type, p.bucket, p.n_ref, p.n_cur,
       CAST(p.n_ref AS DOUBLE) / CAST(t.tot_ref AS DOUBLE) AS share_ref,
       CAST(p.n_cur AS DOUBLE) / CAST(t.tot_cur AS DOUBLE) AS share_cur,
       (CAST(p.n_ref AS DOUBLE)
        - CAST(t.tot_ref AS DOUBLE) * CAST(p.n_ref + p.n_cur AS DOUBLE)
          / CAST(t.tot_ref + t.tot_cur AS DOUBLE))
       * (CAST(p.n_ref AS DOUBLE)
          - CAST(t.tot_ref AS DOUBLE) * CAST(p.n_ref + p.n_cur AS DOUBLE)
            / CAST(t.tot_ref + t.tot_cur AS DOUBLE))
       / (CAST(t.tot_ref AS DOUBLE) * CAST(p.n_ref + p.n_cur AS DOUBLE)
          / CAST(t.tot_ref + t.tot_cur AS DOUBLE))
       + (CAST(p.n_cur AS DOUBLE)
          - CAST(t.tot_cur AS DOUBLE) * CAST(p.n_ref + p.n_cur AS DOUBLE)
            / CAST(t.tot_ref + t.tot_cur AS DOUBLE))
         * (CAST(p.n_cur AS DOUBLE)
            - CAST(t.tot_cur AS DOUBLE) * CAST(p.n_ref + p.n_cur AS DOUBLE)
              / CAST(t.tot_ref + t.tot_cur AS DOUBLE))
         / (CAST(t.tot_cur AS DOUBLE) * CAST(p.n_ref + p.n_cur AS DOUBLE)
            / CAST(t.tot_ref + t.tot_cur AS DOUBLE)) AS chi2_term,
       (ABS(p.n_ref * t.tot_cur - p.n_cur * t.tot_ref) * 50
        > t.tot_ref * t.tot_cur) AS drifted
FROM per p JOIN tot t ON p.event_type = t.event_type
"""


@register("feature_drift_buckets", DRIFT_ORACLE)
def q_feature_drift_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift scorecard between a reference window (first
    half of the event stream) and the current window: per (event_type,
    value-bucket), the two-sample chi-square contribution and a
    drift flag — the monitor a feature platform runs before every
    retrain to catch covariate shift.

    Numeric discipline: counts are exact integers; each chi-square
    contribution is ONE fixed double expression per row (never a float
    sum across rows — the per-bucket terms ARE the output); the drift
    verdict |p_ref − p_cur| > 1/50 is a cross-multiplied INTEGER
    comparison, so the flag can never flip on a rounding ulp.

    Scale: one scan, one (event_type, bucket) aggregate with bounded
    key cardinality, and a broadcast join of the per-type totals."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.least(
            F.floor(F.col("value") / 50.0).cast("long"), F.lit(9).cast("long")
        ).alias("bucket"),
        F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 1)
        .otherwise(0)
        .alias("ref"),
    )
    per = ev.groupBy("event_type", "bucket").agg(
        F.sum("ref").alias("n_ref"),
        F.sum(1 - F.col("ref")).alias("n_cur"),
    )
    tot = per.groupBy("event_type").agg(
        F.sum("n_ref").alias("tot_ref"),
        F.sum("n_cur").alias("tot_cur"),
    )
    nr = F.col("n_ref").cast("double")
    nc = F.col("n_cur").cast("double")
    tr = F.col("tot_ref").cast("double")
    tc = F.col("tot_cur").cast("double")
    pooled = (F.col("n_ref") + F.col("n_cur")).cast("double")
    e_ref = tr * pooled / (F.col("tot_ref") + F.col("tot_cur")).cast("double")
    e_cur = tc * pooled / (F.col("tot_ref") + F.col("tot_cur")).cast("double")
    return per.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bucket",
        "n_ref",
        "n_cur",
        (nr / tr).alias("share_ref"),
        (nc / tc).alias("share_cur"),
        (
            (nr - e_ref) * (nr - e_ref) / e_ref
            + (nc - e_cur) * (nc - e_cur) / e_cur
        ).alias("chi2_term"),
        (
            F.abs(
                F.col("n_ref") * F.col("tot_cur")
                - F.col("n_cur") * F.col("tot_ref")
            )
            * 50
            > F.col("tot_ref") * F.col("tot_cur")
        ).alias("drifted"),
    )


# --- functional-dependency profiling ----------------------------------------

FD_ORACLE = """
WITH pn AS (
    SELECT 'p_name->p_brand' AS fd, p_name AS lhs_s, p_brand AS rhs
    FROM part
),
ck AS (
    SELECT 'c_custkey->c_nationkey' AS fd, CAST(c_custkey AS VARCHAR) AS lhs_s,
           CAST(c_nationkey AS VARCHAR) AS rhs
    FROM customer
),
oc AS (
    SELECT 'o_custkey->o_orderpriority' AS fd,
           CAST(o_custkey AS VARCHAR) AS lhs_s, o_orderpriority AS rhs
    FROM orders
),
lp AS (
    SELECT 'l_partkey->l_suppkey' AS fd, CAST(l_partkey AS VARCHAR) AS lhs_s,
           CAST(l_suppkey AS VARCHAR) AS rhs
    FROM lineitem
),
ue AS (
    SELECT 'user_id->event_type' AS fd, CAST(user_id AS VARCHAR) AS lhs_s,
           event_type AS rhs
    FROM events
),
unioned AS (
    SELECT * FROM pn UNION ALL SELECT * FROM ck UNION ALL
    SELECT * FROM oc UNION ALL SELECT * FROM lp UNION ALL SELECT * FROM ue
),
per_lhs AS (
    SELECT fd, lhs_s, COUNT(DISTINCT rhs) AS ndv
    FROM unioned GROUP BY fd, lhs_s
)
SELECT fd,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
       CAST(SUM(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS violation_share,
       CAST(MAX(ndv) AS BIGINT) AS max_rhs_ndv
FROM per_lhs
GROUP BY fd
"""


@register("fd_profile", FD_ORACLE)
def q_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery scorecard: for five candidate
    FDs across four tables, how many left-hand-side groups map to more
    than one right-hand value — the dependency-profiling pass schema
    tools run to find keys, denormalization opportunities, and data
    bugs (c_custkey->c_nationkey should HOLD; behavioural FDs like
    user_id->event_type should fail almost everywhere).

    Scale: each FD is one hash aggregate on its lhs (countDistinct
    rhs); the verdict rollup is per-FD. The union is of per-FD
    aggregate LINEAGES, not raw tables — Spark runs the five scans
    independently; nothing is shuffled twice."""
    tables = {
        "customer": load_table(spark, sf_dir, "customer"),
        "part": load_table(spark, sf_dir, "part"),
        "orders": load_table(spark, sf_dir, "orders"),
        "lineitem": load_table(spark, sf_dir, "lineitem"),
        "events": load_table(spark, sf_dir, "events"),
    }
    fds = [
        ("p_name->p_brand", "part", "p_name", "p_brand"),
        ("c_custkey->c_nationkey", "customer", "c_custkey", "c_nationkey"),
        ("o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
        ("l_partkey->l_suppkey", "lineitem", "l_partkey", "l_suppkey"),
        ("user_id->event_type", "events", "user_id", "event_type"),
    ]
    parts = []
    for fd, tbl, lhs, rhs in fds:
        per_lhs = (
            tables[tbl]
            .select(
                F.col(lhs).cast("string").alias("lhs_s"),
                F.col(rhs).cast("string").alias("rhs"),
            )
            .groupBy("lhs_s")
            .agg(F.countDistinct("rhs").alias("ndv"))
        )
        viol = F.sum(F.when(F.col("ndv") > 1, 1).otherwise(0))
        parts.append(
            per_lhs.agg(
                F.count("*").alias("n_groups"),
                viol.alias("n_violating"),
                (viol.cast("double") / F.count("*").cast("double")).alias(
                    "violation_share"
                ),
                F.max("ndv").alias("max_rhs_ndv"),
            ).select(F.lit(fd).alias("fd"), "*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
