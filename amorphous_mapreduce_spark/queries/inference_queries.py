"""Statistical-inference battery: distribution drift (two-sample KS),
serial dependence (autocorrelation function), structural breaks (binary
segmentation changepoint), and rank agreement (Kendall tau).

These are the classical inference primitives a data platform runs on
its own telemetry: "did the purchase-value distribution shift vs the
click baseline?" (KS), "is daily revenue serially correlated, and at
which lag?" (ACF), "where did the revenue regime change?" (binary
segmentation), "do two business rankings agree?" (Kendall).

Cross-engine discipline (CLAUDE.md conventions):
- Every cumulative/comparison quantity is an exact integer until one
  final fixed double expression, so argmax/sup choices can never flap
  between engines.
- KS packs both samples' per-value counts into ONE prefix-sum integer
  (c1*2^32 + c2 — totals < 2^31 so the low half never carries) and the
  sup statistic compares c1*n2 vs c2*n1 cross-multiplied, no division
  until the final report.
- ACF sufficient statistics accumulate in DECIMAL(38,0); sums past
  int64 reconstruct in double via the hi/lo 2^20 split
  (rolling_correlation_14d precedent — DuckDB's int128->double cast
  mis-rounds past 2^63).
- The global cumulative sums ride operators.corpus_stats.
  distributed_prefix_sum (range sort + partition partials + bounded
  offset merge), never a single-partition window.

Reference tie-in: these extend the aggregate family (VecOp reduce,
src/op.rs:18-35) with order-statistics semantics the reference's
trace model cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.agg import dec
from amorphous_mapreduce_spark.operators.corpus_stats import (
    distributed_prefix_sum,
)
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table


# --- two-sample Kolmogorov–Smirnov ------------------------------------------

KS_ORACLE = """
WITH per_value AS (
    SELECT value,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               * 4294967296
           + SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS packed
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY value
),
cum AS (
    SELECT value,
           SUM(packed) OVER (ORDER BY value
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS c
    FROM per_value
),
tot AS (
    SELECT CAST(SUM(packed) // 4294967296 AS BIGINT) AS n1,
           CAST(SUM(packed) % 4294967296 AS BIGINT) AS n2
    FROM per_value
),
diffs AS (
    SELECT value,
           ABS(CAST(c // 4294967296 AS BIGINT) * n2
               - CAST(c % 4294967296 AS BIGINT) * n1) AS d_scaled
    FROM cum CROSS JOIN tot
),
best AS (SELECT MAX(d_scaled) AS d_scaled FROM diffs)
SELECT t.n1, t.n2, b.d_scaled,
       CAST(b.d_scaled AS DOUBLE)
           / (CAST(t.n1 AS DOUBLE) * CAST(t.n2 AS DOUBLE)) AS ks_d,
       (SELECT MIN(value) FROM diffs d WHERE d.d_scaled = b.d_scaled)
           AS at_value
FROM tot t CROSS JOIN best b
"""


@register("ks_two_sample", KS_ORACLE)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance between the
    purchase-value and click-value distributions.

    Both empirical CDFs come from ONE distributed prefix sum: each
    distinct value's (purchase, click) counts pack into a single
    BIGINT (hi*2^32 + lo — cumulative totals stay < 2^31 so the low
    half cannot carry), so the global cumulative scan runs once. The
    sup statistic max |F1 - F2| is the max of the cross-multiplied
    integer |c1*n2 - c2*n1| — exact, division-free, with a min-value
    tie-break, so both engines pick the identical sup point.

    Scale: the per-value table is the only unbounded dimension and it
    flows through the two-phase prefix scan (no single-partition
    window); totals and the 1-row max are broadcast back.
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .select("event_type", "value")
    )
    per_value = ev.groupBy("value").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("long"))
            * F.lit(4294967296)
            + F.sum((F.col("event_type") == "click").cast("long"))
        ).alias("packed")
    )
    cum = distributed_prefix_sum(per_value, "packed", ["value"]).persist()
    tot = per_value.agg(
        F.expr("sum(packed) div 4294967296").cast("long").alias("n1"),
        F.expr("sum(packed) % 4294967296").cast("long").alias("n2"),
    )
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        "value",
        "n1",
        "n2",
        F.abs(
            F.expr("cum div 4294967296") * F.col("n2")
            - F.expr("cum % 4294967296") * F.col("n1")
        ).alias("d_scaled"),
    )
    best = diffs.agg(F.max("d_scaled").alias("d_scaled"))
    return (
        diffs.join(F.broadcast(best), "d_scaled")
        .groupBy("n1", "n2", "d_scaled")
        .agg(F.min("value").alias("at_value"))
        .select(
            "n1",
            "n2",
            "d_scaled",
            (
                F.col("d_scaled").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double"))
            ).alias("ks_d"),
            "at_value",
        )
    )


# --- autocorrelation function (lags 1..7) of daily revenue ------------------

ACF_ORACLE = """
WITH daily AS (
    SELECT CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                AS BIGINT) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_c
    FROM orders GROUP BY 1
),
pairs AS (
    SELECT k.range AS lag, a.rev_c AS x, b.rev_c AS y
    FROM range(1, 8) k
    JOIN daily a ON TRUE
    JOIN daily b ON b.day = a.day + k.range
),
mom AS (
    SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx_i,
           CAST(SUM(y) AS BIGINT) AS sy_i,
           CAST((SUM(CAST(x AS HUGEINT) * y) // 1048576) AS BIGINT) AS sxy_hi,
           CAST((SUM(CAST(x AS HUGEINT) * y) % 1048576) AS BIGINT) AS sxy_lo,
           CAST((SUM(CAST(x AS HUGEINT) * x) // 1048576) AS BIGINT) AS sxx_hi,
           CAST((SUM(CAST(x AS HUGEINT) * x) % 1048576) AS BIGINT) AS sxx_lo,
           CAST((SUM(CAST(y AS HUGEINT) * y) // 1048576) AS BIGINT) AS syy_hi,
           CAST((SUM(CAST(y AS HUGEINT) * y) % 1048576) AS BIGINT) AS syy_lo
    FROM pairs GROUP BY lag
)
SELECT lag, n,
       (CAST(n AS DOUBLE)
          * (CAST(sxy_hi AS DOUBLE) * 1048576.0 + CAST(sxy_lo AS DOUBLE))
        - CAST(sx_i AS DOUBLE) * CAST(sy_i AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE)
                 * (CAST(sxx_hi AS DOUBLE) * 1048576.0
                    + CAST(sxx_lo AS DOUBLE))
               - CAST(sx_i AS DOUBLE) * CAST(sx_i AS DOUBLE))
              * (CAST(n AS DOUBLE)
                   * (CAST(syy_hi AS DOUBLE) * 1048576.0
                      + CAST(syy_lo AS DOUBLE))
                 - CAST(sy_i AS DOUBLE) * CAST(sy_i AS DOUBLE)))
           AS acf
FROM mom
ORDER BY lag
"""


def _hilo(col: str, hi: str, lo: str) -> list:
    """Split an exact DECIMAL(38,0) into (hi, lo) int64 halves at 2^20.

    DuckDB's int128->double cast mis-rounds by 1 ulp past 2^63; the
    halves reconstruct hi*1048576.0 + lo in double with one identical
    IEEE rounding on both engines (rolling_correlation_14d precedent).
    """
    return [
        ((F.col(col) - F.pmod(F.col(col), F.lit(1048576))) / F.lit(1048576))
        .cast("long")
        .alias(hi),
        F.pmod(F.col(col), F.lit(1048576)).cast("long").alias(lo),
    ]


def _rebuild(hi: str, lo: str) -> F.Column:
    return F.col(hi).cast("double") * F.lit(1048576.0) + F.col(lo).cast(
        "double"
    )


@register("acf_daily_revenue", ACF_ORACLE)
def q_acf_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of daily revenue at lags 1..7 — the serial-
    dependence profile behind every forecasting/backtest choice
    (seasonal_naive_backtest picks lag 7 because this curve peaks
    there).

    Each lag's Pearson correlation comes from exact sufficient
    statistics over the (t, t+k) pair table: a 7-way bounded explode of
    the tiny daily grid joined back onto itself (equi-join on day — no
    window over the full series). Products exceed int64, so Σxy/Σx²/Σy²
    accumulate in DECIMAL(38,0) and reconstruct in double via the hi/lo
    2^20 split; the final correlation is one fixed double expression.

    Scale: the pair table is |days| x 7 regardless of row volume; the
    heavy reduction (orders -> daily cents) is one keyed hash aggregate.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp")
            )
            .cast("long")
            .alias("day"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("rev_c"),
        )
        .groupBy("day")
        .agg(F.sum("rev_c").alias("rev_c"))
        .persist()
    )
    lagged = daily.select(
        "day",
        F.col("rev_c").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(7))).alias("lag"),
    ).select((F.col("day") + F.col("lag")).alias("day"), "lag", "x")
    pairs = lagged.join(
        daily.select("day", F.col("rev_c").alias("y")), "day"
    )
    mom = (
        pairs.groupBy("lag")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx_i"),
            F.sum("y").alias("sy_i"),
            F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
            .cast("decimal(38,0)")
            .alias("_sxy"),
            F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
            .cast("decimal(38,0)")
            .alias("_sxx"),
            F.sum(F.col("y").cast("decimal(19,0)") * F.col("y"))
            .cast("decimal(38,0)")
            .alias("_syy"),
        )
        .select(
            "lag",
            "n",
            "sx_i",
            "sy_i",
            *_hilo("_sxy", "sxy_hi", "sxy_lo"),
            *_hilo("_sxx", "sxx_hi", "sxx_lo"),
            *_hilo("_syy", "syy_hi", "syy_lo"),
        )
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx_i").cast("double")
    sy = F.col("sy_i").cast("double")
    acf = (nd * _rebuild("sxy_hi", "sxy_lo") - sx * sy) / F.sqrt(
        (nd * _rebuild("sxx_hi", "sxx_lo") - sx * sx)
        * (nd * _rebuild("syy_hi", "syy_lo") - sy * sy)
    )
    return mom.select("lag", "n", acf.alias("acf")).orderBy("lag")


# --- binary-segmentation changepoint ----------------------------------------

CHANGEPOINT_ORACLE = """
WITH daily AS (
    SELECT CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                AS BIGINT) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_c
    FROM orders GROUP BY 1
),
cum AS (
    SELECT day,
           CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
           CAST(SUM(rev_c) OVER (ORDER BY day
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS s
    FROM daily
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev_c) AS BIGINT) AS tt
    FROM daily
),
scored AS (
    SELECT day, t, s, n, tt,
           CAST(n * s - t * tt AS DOUBLE) * CAST(n * s - t * tt AS DOUBLE)
             / CAST(t * (n - t) AS DOUBLE) AS score
    FROM cum CROSS JOIN tot
    WHERE t < n
),
best AS (SELECT MAX(score) AS score FROM scored)
SELECT s.n AS n_days, MIN(s.day) AS best_day, b.score,
       CAST(MIN(s.s) AS DOUBLE) / CAST(MIN(s.t) AS DOUBLE) / 100.0
           AS left_mean,
       CAST(MIN(s.tt) - MIN(s.s) AS DOUBLE)
           / CAST(MIN(s.n) - MIN(s.t) AS DOUBLE) / 100.0 AS right_mean
FROM scored s JOIN best b ON s.score = b.score
GROUP BY s.n, b.score
"""


@register("revenue_changepoint", CHANGEPOINT_ORACLE)
def q_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single best structural break in the daily-revenue series by
    binary segmentation: the split day maximizing the between-segment
    sum of squares (n*S_t - t*T)^2 / (t*(n-t)).

    The argmax is deterministic cross-engine because the score's inputs
    (prefix sum S_t, rank t, total T) are exact BIGINTs — each below
    2^53 at fixture scale, so the double conversion is exact and the
    two roundings (square, divide) are identical IEEE on both engines;
    ties break to the earliest day. The prefix scan is the distributed
    two-phase version (no single-partition window); the 1-row total and
    1-row max broadcast back.

    At 100 TB the daily grid stays small (cardinality = #days) but the
    same plan holds for fine-grained series; past 2^53 cents the score
    needs the hi/lo split (see acf_daily_revenue).
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.datediff(
                F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp")
            )
            .cast("long")
            .alias("day"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("rev_c"),
        )
        .groupBy("day")
        .agg(F.sum("rev_c").alias("rev_c"))
        .persist()
    )
    cum = distributed_prefix_sum(
        daily, "rev_c", ["day"], cum_col="s", rank_col="t"
    )
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("rev_c").alias("tt")
    )
    a = F.col("n") * F.col("s") - F.col("t") * F.col("tt")
    scored = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("t") < F.col("n"))
        .select(
            "day",
            "t",
            "s",
            "n",
            "tt",
            (
                a.cast("double")
                * a.cast("double")
                / (F.col("t") * (F.col("n") - F.col("t"))).cast("double")
            ).alias("score"),
        )
        .persist()
    )
    best = scored.agg(F.max("score").alias("score"))
    return (
        scored.join(F.broadcast(best), "score")
        .groupBy("n", "score")
        .agg(
            F.min("day").alias("best_day"),
            F.min("s").alias("_s"),
            F.min("t").alias("_t"),
            F.min("tt").alias("_tt"),
        )
        .select(
            F.col("n").alias("n_days"),
            "best_day",
            "score",
            (
                F.col("_s").cast("double")
                / F.col("_t").cast("double")
                / F.lit(100.0)
            ).alias("left_mean"),
            (
                (F.col("_tt") - F.col("_s")).cast("double")
                / (F.col("n") - F.col("_t")).cast("double")
                / F.lit(100.0)
            ).alias("right_mean"),
        )
    )


# --- Kendall tau between two brand rankings ---------------------------------

KENDALL_ORACLE = """
WITH brand AS (
    SELECT p.p_brand AS brand,
           SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - l.l_discount AS DECIMAL(12,2))) AS rev,
           SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
),
pairs AS (
    SELECT CASE WHEN (a.rev > b.rev OR (a.rev = b.rev AND a.brand < b.brand))
                   = (a.qty > b.qty OR (a.qty = b.qty AND a.brand < b.brand))
                THEN 1 ELSE 0 END AS conc
    FROM brand a JOIN brand b ON a.brand < b.brand
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM brand) AS n_brands,
       CAST(SUM(conc) AS BIGINT) AS concordant,
       CAST(COUNT(*) - SUM(conc) AS BIGINT) AS discordant,
       CAST(2 * SUM(conc) - COUNT(*) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS tau
FROM pairs
"""


@register("kendall_tau_brands", KENDALL_ORACLE)
def q_kendall_tau_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau rank agreement between brands-by-revenue and
    brands-by-quantity — "do our two headline leaderboards tell the
    same story?".

    Concordance is counted pairwise over the brand aggregate (bounded
    by the brand dimension, ~25 rows, broadcast inequality join — never
    over line items); revenue and quantity stay exact DECIMAL so the
    strict-order comparisons can't flap, and equal measures fall back
    to the brand name giving both engines the same total order. tau is
    one integer-ratio double at the end.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.sum(
                dec("l_extendedprice") * dec(F.lit(1) - F.col("l_discount"))
            ).alias("rev"),
            F.sum(dec("l_quantity")).alias("qty"),
        )
        .persist()
    )
    a = brand.select(
        F.col("brand").alias("a_brand"),
        F.col("rev").alias("a_rev"),
        F.col("qty").alias("a_qty"),
    )
    b = brand.select(
        F.col("brand").alias("b_brand"),
        F.col("rev").alias("b_rev"),
        F.col("qty").alias("b_qty"),
    )
    rev_gt = (F.col("a_rev") > F.col("b_rev")) | (
        (F.col("a_rev") == F.col("b_rev"))
        & (F.col("a_brand") < F.col("b_brand"))
    )
    qty_gt = (F.col("a_qty") > F.col("b_qty")) | (
        (F.col("a_qty") == F.col("b_qty"))
        & (F.col("a_brand") < F.col("b_brand"))
    )
    pairs = a.join(
        F.broadcast(b), F.col("a_brand") < F.col("b_brand")
    ).select((rev_gt == qty_gt).cast("long").alias("conc"))
    counts = pairs.agg(
        F.sum("conc").alias("concordant"),
        (F.count("*") - F.sum("conc")).alias("discordant"),
        (
            (F.lit(2) * F.sum("conc") - F.count("*")).cast("double")
            / F.count("*").cast("double")
        ).alias("tau"),
    )
    n_brands = brand.agg(F.count("*").alias("n_brands"))
    return F.broadcast(n_brands).crossJoin(counts).select(
        "n_brands", "concordant", "discordant", "tau"
    )
