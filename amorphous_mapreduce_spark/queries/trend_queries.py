"""Trend & spectral diagnostics over the order/lineitem time series.

Two classical series diagnostics a forecasting stack runs before it
trusts a model: a distribution-free monotone-trend test (Mann-Kendall
with tie-corrected variance), a fixed-frequency periodogram (weekly vs
~monthly cycle power) via integer cosine LUTs.

Cross-engine discipline (see CLAUDE.md conventions):
- money is exact integer centi-cents (cents x (100 - discount_pct));
- products that exceed int64 accumulate in DECIMAL(38,0)/HUGEINT and
  are reconstructed in double through hi/lo integer splits (the
  rolling_correlation_14d trick, 2^40 split here because Σy² reaches
  ~1e23 at sf1);
- the ACF/periodogram series is centered at the FLOOR mean (T div n) —
  an integer, so deviations stay exact; the floor-centering is the spec
  (same stance as functions/intlog.py's truncated mantissa);
- trig constants are 2^20-scaled integer LUTs computed once in Python
  and embedded as identical literals in the Spark plan and the oracle
  SQL, so both engines sum the exact same integers.

Reference tie-in: VecOp elementwise + per-key reduce semantics
(src/op.rs:18-35, src/word_count.rs:121-123) applied to calendar keys.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

# --- shared fragments --------------------------------------------------------

_REV_CC_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
    " * (100 - CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT))"
)


def _rev_cc_col():
    """Exact lineitem net revenue in centi-cents (int64)."""
    cents = (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
    disc = (F.col("l_discount").cast("decimal(12,2)") * 100).cast("long")
    return cents * (F.lit(100) - disc)


_DAILY_CTE = """
daily AS (
    SELECT CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                AS BIGINT) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_c
    FROM orders GROUP BY 1
),
mu AS (
    SELECT CAST(SUM(rev_c) AS BIGINT) // COUNT(*) AS mu FROM daily
),
dev AS (
    SELECT day, rev_c - mu AS y FROM daily CROSS JOIN mu
)
"""


def _daily_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[day, y]: daily order revenue cents, centered at the floor mean."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp")
            )
            .cast("long")
            .alias("day"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("rev_c"))
    )
    mu = daily.agg(
        F.sum("rev_c").alias("_t"), F.count("*").alias("_n")
    ).select(F.expr("_t div _n").cast("long").alias("mu"))
    return daily.crossJoin(F.broadcast(mu)).select(
        "day", (F.col("rev_c") - F.col("mu")).alias("y")
    )


# --- Mann-Kendall monotone trend per brand ----------------------------------

MANN_KENDALL_ORACLE = f"""
WITH monthly AS (
    SELECT p.p_brand AS brand,
           CAST(date_part('year', l.l_shipdate) * 12
                + date_part('month', l.l_shipdate) AS BIGINT) AS mi,
           CAST(SUM({_REV_CC_SQL}) AS BIGINT) AS x
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1, 2
),
pairs AS (
    SELECT a.brand,
           CAST(SUM(CASE WHEN b.x > a.x THEN 1
                         WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
    FROM monthly a JOIN monthly b
      ON a.brand = b.brand AND a.mi < b.mi
    GROUP BY a.brand
),
nn AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n FROM monthly GROUP BY brand
),
ties AS (
    SELECT brand,
           CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
               AS tie_term
    FROM (SELECT brand, x, CAST(COUNT(*) AS BIGINT) AS t
          FROM monthly GROUP BY brand, x)
    GROUP BY brand
)
SELECT nn.brand, nn.n AS n_months, p.s AS s_stat,
       CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - t.tie_term AS BIGINT)
           AS var18,
       CASE WHEN p.s > 0 THEN (CAST(p.s AS DOUBLE) - 1.0)
                 / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - t.tie_term AS DOUBLE) / 18.0)
            WHEN p.s < 0 THEN (CAST(p.s AS DOUBLE) + 1.0)
                 / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - t.tie_term AS DOUBLE) / 18.0)
            ELSE 0.0 END AS z_stat,
       CASE WHEN p.s > 0 AND (CAST(p.s AS DOUBLE) - 1.0)
                 / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - t.tie_term AS DOUBLE) / 18.0) > 1.96
                THEN 'increasing'
            WHEN p.s < 0 AND (CAST(p.s AS DOUBLE) + 1.0)
                 / sqrt(CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
                             - t.tie_term AS DOUBLE) / 18.0) < -1.96
                THEN 'decreasing'
            ELSE 'none' END AS trend
FROM nn JOIN pairs p USING (brand) JOIN ties t USING (brand)
ORDER BY brand
"""


@register("mann_kendall_trend", MANN_KENDALL_ORACLE)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test on each brand's monthly net
    revenue: S = Σ_{i<j} sign(x_j - x_i), tie-corrected variance
    18·Var = n(n-1)(2n+5) - Σ t(t-1)(2t+5), continuity-corrected
    z = (S ∓ 1)/√Var. Distribution-free — the trend screen that needs
    no model of the series.

    All-integer S and Var; z is one division + sqrt over exact ints
    (IEEE-identical cross-engine). Scale: the pair join runs on the
    brand-month aggregate (|brands| x |months| rows — thousands, not
    the lineitem table), self-joined per brand; months-per-brand is
    calendar-bounded (~84), so the quadratic blowup is capped at
    n_months² per brand regardless of data volume."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    monthly = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            F.col("p_brand").alias("brand"),
            (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
            .cast("long")
            .alias("mi"),
            _rev_cc_col().alias("cc"),
        )
        .groupBy("brand", "mi")
        .agg(F.sum("cc").alias("x"))
        .persist()
    )
    a, b = monthly.alias("a"), monthly.alias("b")
    pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.brand") == F.col("b.brand")) & (F.col("a.mi") < F.col("b.mi")),
        )
        .groupBy(F.col("a.brand").alias("brand"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    nn = monthly.groupBy("brand").agg(F.count("*").alias("n_months"))
    ties = (
        monthly.groupBy("brand", "x")
        .agg(F.count("*").alias("t"))
        .groupBy("brand")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).alias("tie_term")
        )
    )
    n = F.col("n_months")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).cast("long")
    joined = nn.join(pairs, "brand").join(ties, "brand").withColumn(
        "var18", var18
    )
    s = F.col("s_stat")
    denom = F.sqrt(F.col("var18").cast("double") / F.lit(18.0))
    z = (
        F.when(s > 0, (s.cast("double") - 1.0) / denom)
        .when(s < 0, (s.cast("double") + 1.0) / denom)
        .otherwise(F.lit(0.0))
    )
    return (
        joined.select(
            "brand",
            "n_months",
            "s_stat",
            "var18",
            z.alias("z_stat"),
            F.when(z > 1.96, F.lit("increasing"))
            .when(z < -1.96, F.lit("decreasing"))
            .otherwise(F.lit("none"))
            .alias("trend"),
        )
        .orderBy("brand")
    )


# --- fixed-frequency periodogram (weekly vs ~monthly power) -------------------

_PERIODS = (7, 30)
_TRIG_SCALE = 1 << 20
_COS_LUT = {
    p: [
        int(math.floor(_TRIG_SCALE * math.cos(2 * math.pi * j / p) + 0.5))
        for j in range(p)
    ]
    for p in _PERIODS
}
_SIN_LUT = {
    p: [
        int(math.floor(_TRIG_SCALE * math.sin(2 * math.pi * j / p) + 0.5))
        for j in range(p)
    ]
    for p in _PERIODS
}


def _lut_sql(vals: list[int], idx: str) -> str:
    return f"list_extract([{', '.join(str(v) for v in vals)}], {idx} + 1)"


_PG_ARM = """
    SELECT {p} AS period,
           CAST(SUM(y * {cos_lut}) AS BIGINT) AS a_i,
           CAST(SUM(y * {sin_lut}) AS BIGINT) AS b_i,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM dev
"""

PERIODOGRAM_ORACLE = (
    "WITH "
    + _DAILY_CTE
    + ", arms AS ("
    + "\nUNION ALL\n".join(
        _PG_ARM.format(
            p=p,
            cos_lut=_lut_sql(_COS_LUT[p], f"(day % {p})"),
            sin_lut=_lut_sql(_SIN_LUT[p], f"(day % {p})"),
        )
        for p in _PERIODS
    )
    + f"""
),
pw AS (
    SELECT period, n_days, a_i, b_i,
           (CAST(a_i AS DOUBLE) / {float(_TRIG_SCALE)!r})
             * (CAST(a_i AS DOUBLE) / {float(_TRIG_SCALE)!r})
           + (CAST(b_i AS DOUBLE) / {float(_TRIG_SCALE)!r})
             * (CAST(b_i AS DOUBLE) / {float(_TRIG_SCALE)!r}) AS power
    FROM arms
)
SELECT period, n_days, a_i, b_i, power,
       power / (SELECT SUM(power) FROM pw) AS power_share
FROM pw ORDER BY period
"""
)


@register("periodogram_weekly_power", PERIODOGRAM_ORACLE)
def q_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goertzel-style periodogram of daily revenue at the two calendar
    frequencies that matter (period 7 = weekly, period 30 = ~monthly):
    power_p = (Σ y_d·cos(2πd/p))² + (Σ y_d·sin(2πd/p))², centered
    series. The weekly line dwarfing the monthly one is the numeric
    form of 'this series has a day-of-week cycle'.

    Trig is a 2^20-scaled integer LUT (identical literals in plan and
    oracle — the intlog stance: the quantized constant IS the spec), so
    A/B are exact int64 sums; the squares happen in double after ONE
    identical descale division per term. Scale: two passes over the
    calendar-bounded daily frame; the LUT lookup is element_at on a
    literal array — no shuffle beyond the daily groupBy."""
    dev = _daily_dev(spark, sf_dir).persist()
    arms = []
    for p in _PERIODS:
        cos_arr = F.array(*[F.lit(v) for v in _COS_LUT[p]])
        sin_arr = F.array(*[F.lit(v) for v in _SIN_LUT[p]])
        idx = (F.pmod(F.col("day"), F.lit(p)) + 1).cast("int")
        arms.append(
            dev.select(
                F.lit(p).alias("period"),
                (F.col("y") * F.element_at(cos_arr, idx)).alias("ac"),
                (F.col("y") * F.element_at(sin_arr, idx)).alias("bc"),
            )
            .groupBy("period")
            .agg(
                # Accumulate in DECIMAL(38,0): per-term |y|*2^20 fits int64
                # to absurd SF, but the PARTIAL sums can exceed int64 at
                # sf>=10, where Spark (ANSI) would raise mid-aggregate while
                # DuckDB silently rides HUGEINT. Wide accumulation on both
                # engines + one final int64 cast = identical behaviour
                # (both succeed, or both raise on the final cast).
                F.sum(F.col("ac").cast("decimal(38,0)"))
                .cast("long")
                .alias("a_i"),
                F.sum(F.col("bc").cast("decimal(38,0)"))
                .cast("long")
                .alias("b_i"),
                F.count("*").alias("n_days"),
            )
        )
    armdf = arms[0].unionAll(arms[1])
    scale = F.lit(float(_TRIG_SCALE))
    power = (F.col("a_i").cast("double") / scale) * (
        F.col("a_i").cast("double") / scale
    ) + (F.col("b_i").cast("double") / scale) * (
        F.col("b_i").cast("double") / scale
    )
    pw = armdf.select("period", "n_days", "a_i", "b_i", power.alias("power"))
    tot = pw.agg(F.sum("power").alias("_tot"))
    return (
        pw.crossJoin(F.broadcast(tot))
        .select(
            "period",
            "n_days",
            "a_i",
            "b_i",
            "power",
            (F.col("power") / F.col("_tot")).alias("power_share"),
        )
        .orderBy("period")
    )


# --- Kendall tau at scale: bucketed inversion counting -----------------------

KENDALL_INV_ORACLE = """
WITH items AS (
    SELECT p_partkey AS pk,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
           CAST(p_size AS BIGINT) AS y,
           LEAST(63, GREATEST(0,
               (CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                - 90000) // 157)) AS b
    FROM part
),
cells AS (
    SELECT b, x, y, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM items GROUP BY b, x, y
),
within AS (
    SELECT CAST(COALESCE(SUM(c1.cnt * c2.cnt
               * CASE WHEN c2.y > c1.y THEN 1
                      WHEN c2.y < c1.y THEN -1 ELSE 0 END), 0) AS BIGINT)
        AS cd
    FROM cells c1 JOIN cells c2 ON c1.b = c2.b AND c1.x < c2.x
),
ml AS (
    SELECT b, y, CAST(SUM(cnt) AS BIGINT) AS m
    FROM cells GROUP BY b, y
),
crossb AS (
    SELECT CAST(COALESCE(SUM(m1.m * m2.m
               * CASE WHEN m2.y > m1.y THEN 1
                      WHEN m2.y < m1.y THEN -1 ELSE 0 END), 0) AS BIGINT)
        AS cd
    FROM ml m1 JOIN ml m2 ON m1.b < m2.b
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM items),
xt AS (
    SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS x_tie_pairs
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY x)
),
yt AS (
    SELECT CAST(SUM(c * (c - 1) / 2) AS BIGINT) AS y_tie_pairs
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM items GROUP BY y)
)
SELECT n, CAST(n * (n - 1) / 2 AS BIGINT) AS n_pairs,
       CAST(w.cd + c.cd AS BIGINT) AS c_minus_d,
       x_tie_pairs, y_tie_pairs,
       CAST(w.cd + c.cd AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0) AS tau_a,
       CAST(w.cd + c.cd AS DOUBLE)
           / sqrt((CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0
                   - CAST(x_tie_pairs AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0
                     - CAST(y_tie_pairs AS DOUBLE))) AS tau_b
FROM nn CROSS JOIN within w CROSS JOIN crossb c
CROSS JOIN xt CROSS JOIN yt
"""


@register("kendall_inversions_parts", KENDALL_INV_ORACLE)
def q_kendall_inversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall tau (a and b) between part price and part size over
    the WHOLE part table via bucketed inversion counting — the
    scale-path sibling of kendall_tau_brands (which pairwises a 25-row
    aggregate). Concordant-minus-discordant decomposes exactly:
    cross-bucket pairs (price buckets are order-preserving, so
    sign(Δx) is known from the bucket pair) reduce to products of
    per-(bucket, y) level counts — a CONSTANT 64x|y-domain| table —
    and within-bucket pairs pairwise only the (x, y) cells inside one
    bucket. Nothing ever pairwises raw rows.

    All counts integer; tau_a/tau_b are fixed double expressions over
    exact int64 sufficient statistics (sqrt is IEEE-identical).
    Scale: work is O(cells_per_bucket² x buckets + (buckets x
    levels)²), independent of row count once cells saturate; widen to
    256+ buckets and a second bucketing level when per-bucket
    cardinality grows."""
    part = load_table(spark, sf_dir, "part")
    items = part.select(
        F.col("p_partkey").alias("pk"),
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("x"),
        F.col("p_size").cast("long").alias("y"),
    ).withColumn(
        "b", F.expr("LEAST(63, GREATEST(0, (x - 90000) div 157))")
    )
    cells = (
        items.groupBy("b", "x", "y").agg(F.count("*").alias("cnt")).persist()
    )
    c1, c2 = cells.alias("c1"), cells.alias("c2")
    sign_y = (
        F.when(F.col("c2.y") > F.col("c1.y"), 1)
        .when(F.col("c2.y") < F.col("c1.y"), -1)
        .otherwise(0)
    )
    within = (
        c1.join(
            F.broadcast(c2),
            (F.col("c1.b") == F.col("c2.b")) & (F.col("c1.x") < F.col("c2.x")),
        )
        .agg(
            F.coalesce(
                F.sum(F.col("c1.cnt") * F.col("c2.cnt") * sign_y), F.lit(0)
            ).alias("w_cd")
        )
    )
    ml = cells.groupBy("b", "y").agg(F.sum("cnt").alias("m")).persist()
    m1, m2 = ml.alias("m1"), ml.alias("m2")
    sign_my = (
        F.when(F.col("m2.y") > F.col("m1.y"), 1)
        .when(F.col("m2.y") < F.col("m1.y"), -1)
        .otherwise(0)
    )
    crossb = m1.join(F.broadcast(m2), F.col("m1.b") < F.col("m2.b")).agg(
        F.coalesce(F.sum(F.col("m1.m") * F.col("m2.m") * sign_my), F.lit(0)).alias(
            "c_cd"
        )
    )
    nn = items.agg(F.count("*").alias("n"))
    xt = (
        items.groupBy("x")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2)
            .cast("long")
            .alias("x_tie_pairs")
        )
    )
    yt = (
        items.groupBy("y")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2)
            .cast("long")
            .alias("y_tie_pairs")
        )
    )
    joined = (
        nn.crossJoin(F.broadcast(within))
        .crossJoin(F.broadcast(crossb))
        .crossJoin(F.broadcast(xt))
        .crossJoin(F.broadcast(yt))
    )
    nd = F.col("n").cast("double")
    n_pairs_d = nd * (nd - 1) / F.lit(2.0)
    cd = (F.col("w_cd") + F.col("c_cd")).cast("long")
    return joined.select(
        "n",
        F.expr("CAST(n * (n - 1) / 2 AS BIGINT)").alias("n_pairs"),
        cd.alias("c_minus_d"),
        "x_tie_pairs",
        "y_tie_pairs",
        (cd.cast("double") / n_pairs_d).alias("tau_a"),
        (
            cd.cast("double")
            / F.sqrt(
                (n_pairs_d - F.col("x_tie_pairs").cast("double"))
                * (n_pairs_d - F.col("y_tie_pairs").cast("double"))
            )
        ).alias("tau_b"),
    )
