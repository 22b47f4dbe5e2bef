"""Production-monitoring battery: control charts, sequential monitoring,
parametric goodness-of-fit.

Three ops every always-on data platform runs against its own telemetry:

- error_rate_pchart — the Shewhart p-chart: per-day error share vs
  3-sigma binomial control limits around the grand rate (variable
  per-day n, so limits are per-day);
- group_sequential_obf — O'Brien-Fleming group-sequential monitoring of
  an A/B metric at five calendar looks: cumulative Welch z against the
  spend-almost-nothing-early OBF boundary (the reason peeking five
  times doesn't cost you your alpha — completes the sequential family
  next to sprt_ab_boundary's fully-sequential test);
- interarrival_exp_ks — Kolmogorov-Smirnov distance between observed
  per-user inter-event gaps and the fitted exponential, evaluated on an
  hour-quantized grid: "is arrival really memoryless" — the assumption
  behind every Little's-law capacity calc (cf. littles_law_sweep).

Cross-engine determinism: p-chart and OBF are sqrt-only / fixed double
expressions over exact integer or decimal moments; the KS exponential
CDF uses the libm-free exp2 primitive (functions/intexp.py), making
1 - e^(-lambda*x) a deterministic double both engines agree on
bit-for-bit. The hour grid and the 5-look calendar are part of the
spec.

Reference tie-in: scan -> keyed aggregate (VecOp reduce,
src/op.rs:66-106) with bounded monitoring heads; nothing after the
aggregates scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.intexp import (
    exp2_scaled,
    exp2_scaled_sql,
)
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

# --- Shewhart p-chart on daily error rate -----------------------------------

PCHART_ORACLE = """
WITH daily AS (
    SELECT epoch_us(ts) // 86400000000 AS d,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS errs
    FROM events GROUP BY 1
),
grand AS (
    SELECT CAST(SUM(errs) AS BIGINT) AS tot_errs,
           CAST(SUM(n) AS BIGINT) AS tot_n
    FROM daily
)
SELECT d AS epoch_day, n, errs,
       CAST(errs AS DOUBLE) / CAST(n AS DOUBLE) AS p_day,
       CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE) AS p_bar,
       CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE)
           + 3.0 * sqrt(CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE)
               * (1.0 - CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE))
               / CAST(n AS DOUBLE)) AS ucl,
       CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE)
           - 3.0 * sqrt(CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE)
               * (1.0 - CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE))
               / CAST(n AS DOUBLE)) AS lcl,
       CAST(errs AS DOUBLE) / CAST(n AS DOUBLE)
           > CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE)
             + 3.0 * sqrt(CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE)
                 * (1.0 - CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE))
                 / CAST(n AS DOUBLE))
       OR CAST(errs AS DOUBLE) / CAST(n AS DOUBLE)
           < CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE)
             - 3.0 * sqrt(CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE)
                 * (1.0 - CAST(tot_errs AS DOUBLE) / CAST(tot_n AS DOUBLE))
                 / CAST(n AS DOUBLE)) AS out_of_control
FROM daily CROSS JOIN grand
ORDER BY epoch_day
"""


@register("error_rate_pchart", PCHART_ORACLE)
def q_error_rate_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart of the daily error-event share: per-day rate
    against 3-sigma binomial limits around the grand rate, with
    per-day limits because n varies by day — the first chart an SRE
    pins to a dashboard.

    Determinism: counts are exact integers; the limits are a sqrt-only
    double expression (engine-safe like return_rate_wilson_ci).
    Scale: one (day) aggregate + a 1-row grand total broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("unix_micros(ts) div 86400000000").alias("d")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("errs"),
    )
    grand = daily.agg(
        F.sum("errs").cast("long").alias("tot_errs"),
        F.sum("n").cast("long").alias("tot_n"),
    )
    p_day = F.col("errs").cast("double") / F.col("n").cast("double")
    p_bar = F.col("tot_errs").cast("double") / F.col("tot_n").cast("double")
    half = 3.0 * F.sqrt(p_bar * (1.0 - p_bar) / F.col("n").cast("double"))
    return (
        daily.crossJoin(F.broadcast(grand))
        .select(
            F.col("d").alias("epoch_day"),
            "n",
            "errs",
            p_day.alias("p_day"),
            p_bar.alias("p_bar"),
            (p_bar + half).alias("ucl"),
            (p_bar - half).alias("lcl"),
            ((p_day > p_bar + half) | (p_day < p_bar - half)).alias(
                "out_of_control"
            ),
        )
        .orderBy("epoch_day")
    )


# --- O'Brien-Fleming group-sequential monitor -------------------------------

# Five calendar looks over the order history; the OBF two-sided 0.05
# boundary for K=5 equal-information looks (Lan-DeMets OBF spending,
# standard tables) — literal constants, part of the spec.
_OBF_LOOKS = (
    ("1996-07-01", 4.877),
    ("1998-01-01", 3.357),
    ("1999-07-01", 2.680),
    ("2001-01-01", 2.290),
    ("2002-01-01", 2.031),
)

_OBF_LOOK_ROWS = ", ".join(
    # CAST: DuckDB otherwise types the literal DECIMAL(4,3) and squares
    # it exactly, where Spark squares the double
    f"(TIMESTAMP '{cut}', {i + 1}, CAST({z} AS DOUBLE))"
    for i, (cut, z) in enumerate(_OBF_LOOKS)
)

OBF_ORACLE = f"""
WITH looks(cut, k, zbound) AS (VALUES {_OBF_LOOK_ROWS}),
cents AS (
    SELECT CAST('0x' || substr(md5('ab_' || CAST(o_custkey AS VARCHAR)),
                1, 15) AS BIGINT) % 2 AS arm,
           o_orderdate AS od,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
    FROM orders
),
cum AS (
    SELECT l.k, l.zbound, c.arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(c.x) AS BIGINT) AS s,
           CAST(SUM(CAST(c.x AS DECIMAL(12,0)) * CAST(c.x AS DECIMAL(12,0)))
                AS DECIMAL(38,0)) AS q
    FROM cents c JOIN looks l ON c.od < l.cut
    GROUP BY l.k, l.zbound, c.arm
),
z AS (
    SELECT a.k, a.zbound, a.n AS n_a, b.n AS n_b,
           (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
            - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
           * (CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
            - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
           / (((CAST(a.q AS DOUBLE) - CAST(a.s AS DOUBLE)
                * CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
               / (CAST(a.n AS DOUBLE) - 1) / CAST(a.n AS DOUBLE))
              + ((CAST(b.q AS DOUBLE) - CAST(b.s AS DOUBLE)
                * CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE))
               / (CAST(b.n AS DOUBLE) - 1) / CAST(b.n AS DOUBLE)))
           AS z2
    FROM cum a JOIN cum b ON a.k = b.k AND a.arm = 0 AND b.arm = 1
)
SELECT k AS look, n_a, n_b, z2, zbound,
       zbound * zbound AS z2_bound,
       z2 > zbound * zbound AS crossed
FROM z ORDER BY look
"""


@register("group_sequential_obf", OBF_ORACLE)
def q_group_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'Brien-Fleming group-sequential monitor: the cumulative Welch z²
    of the hash-assigned order-value A/B metric at five calendar looks,
    against the K=5 OBF two-sided 5% boundary (4.877 down to 2.031) —
    why a team can peek five times and still spend one alpha.

    Determinism: cumulative decimal moments per look (the constant-level
    explode: each order joins every look it precedes — a bounded x5
    fanout), then the welch z² fixed double expression per look and a
    literal boundary comparison. Scale: the only corpus-sized stage is
    the looks-join aggregate; everything after is 10 rows."""
    orders = load_table(spark, sf_dir, "orders")
    looks = spark.createDataFrame(
        [(cut, i + 1, z) for i, (cut, z) in enumerate(_OBF_LOOKS)],
        "cut string, k int, zbound double",
    ).select(F.col("cut").cast("timestamp").alias("cut"), "k", "zbound")
    from amorphous_mapreduce_spark.functions.hashing import hex_hash64

    cents = orders.select(
        F.pmod(
            hex_hash64(
                F.concat(F.lit("ab_"), F.col("o_custkey").cast("string"))
            ),
            F.lit(2),
        ).alias("arm"),
        F.col("o_orderdate").alias("od"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    cum = (
        cents.join(F.broadcast(looks), cents["od"] < looks["cut"])
        .groupBy("k", "zbound", "arm")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("x").cast("decimal(38,0)")).cast("long").alias("s"),
            F.sum(
                F.col("x").cast("decimal(12,0)")
                * F.col("x").cast("decimal(12,0)")
            )
            .cast("decimal(38,0)")
            .alias("q"),
        )
    )
    a = cum.filter(F.col("arm") == 0).select(
        "k",
        "zbound",
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("q").alias("q_a"),
    )
    b = cum.filter(F.col("arm") == 1).select(
        F.col("k").alias("kb"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("q").alias("q_b"),
    )
    na, sa, qa = (
        F.col("n_a").cast("double"),
        F.col("s_a").cast("double"),
        F.col("q_a").cast("double"),
    )
    nb, sb, qb = (
        F.col("n_b").cast("double"),
        F.col("s_b").cast("double"),
        F.col("q_b").cast("double"),
    )
    md = sa / na - sb / nb
    va = (qa - sa * sa / na) / (na - 1) / na
    vb = (qb - sb * sb / nb) / (nb - 1) / nb
    return (
        a.join(b, a["k"] == b["kb"])
        .select(
            F.col("k").alias("look"),
            "n_a",
            "n_b",
            ((md * md) / (va + vb)).alias("z2"),
            "zbound",
            (F.col("zbound") * F.col("zbound")).alias("z2_bound"),
            (
                (md * md) / (va + vb) > F.col("zbound") * F.col("zbound")
            ).alias("crossed"),
        )
        .orderBy("look")
    )


# --- KS goodness-of-fit: inter-event gaps vs fitted exponential -------------

_KS_BUCKET_S = 3600  # hour-quantized evaluation grid
_KS_MAX_BUCKET = 95  # cap the grid at 96 hours
_LOG2E_20 = 1.4426950408889634


def _ks_f_sql(lamx: str) -> str:
    """1 - 2^(-lamx*log2e), engine-portable via exp2_scaled."""
    s_exp = (
        f"GREATEST(CAST(-66060288 AS BIGINT), "
        f"CAST(floor(-({lamx}) * {_LOG2E_20} * 1048576) AS BIGINT))"
    )
    return f"(1.0 - {exp2_scaled_sql(s_exp)})"


KS_EXP_ORACLE = f"""
WITH ts AS (
    SELECT user_id, event_type AS et, epoch_us(ts) AS t, event_id
    FROM events
),
gaps AS (
    SELECT et,
           (t - LAG(t) OVER (PARTITION BY user_id, et ORDER BY t, event_id)) AS g_us
    FROM ts
),
gb AS (
    SELECT et,
           LEAST({_KS_MAX_BUCKET},
                 g_us // (CAST({_KS_BUCKET_S} AS BIGINT) * 1000000)) AS b,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(g_us) AS BIGINT) AS sum_us
    FROM gaps WHERE g_us IS NOT NULL
    GROUP BY 1, 2
),
tot AS (
    SELECT et, CAST(SUM(cnt) AS BIGINT) AS n,
           CAST(SUM(sum_us) AS BIGINT) AS s_us
    FROM gb GROUP BY et
),
cum AS (
    SELECT gb.et, gb.b, tot.n, tot.s_us,
           SUM(gb.cnt) OVER (PARTITION BY gb.et ORDER BY gb.b) AS cum_cnt
    FROM gb JOIN tot ON tot.et = gb.et
),
dd AS (
    SELECT et, b, n, cum_cnt,
           CAST(cum_cnt AS DOUBLE) / CAST(n AS DOUBLE) AS f_hat,
           {_ks_f_sql(
               f"CAST((b + 1) * {_KS_BUCKET_S} AS DOUBLE) * CAST(n AS DOUBLE)"
               f" / (CAST(s_us AS DOUBLE) / 1000000.0)"
           )} AS f_exp
    FROM cum
),
ks AS (
    SELECT et, b, f_hat, f_exp, abs(f_hat - f_exp) AS d,
           ROW_NUMBER() OVER (PARTITION BY et
                              ORDER BY abs(f_hat - f_exp) DESC, b) AS r
    FROM dd
)
SELECT t.et AS event_type, t.n AS n_gaps,
       CAST(t.s_us AS DOUBLE) / 1000000.0 / CAST(t.n AS DOUBLE)
           AS mean_gap_s,
       k.d AS ks_d, k.b AS ks_bucket, k.f_hat, k.f_exp
FROM tot t JOIN ks k ON k.et = t.et AND k.r = 1
ORDER BY event_type
"""


@register("interarrival_exp_ks", KS_EXP_ORACLE)
def q_interarrival_exp_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is user arrival memoryless? Kolmogorov-Smirnov distance between
    each event type's per-user inter-arrival gaps and the exponential
    fitted by its mean, evaluated on the hour grid (96 buckets, part of
    the spec) — the assumption check behind Little's-law capacity math
    and every Poisson-based alert threshold.

    Determinism: empirical CDF values are exact rationals (integer
    bucket counts / n); the exponential CDF 1 - e^(-lambda*x) goes
    through the libm-free exp2 primitive so both engines produce the
    identical double; the argmax bucket has a total-order tie-break.

    Scale: gaps are one partitioned LAG (keyed by user, no global
    window); the grid is bounded at 96 rows per event type, so the CDF
    sweep and argmax are constant-size work."""
    ev = load_table(spark, sf_dir, "events")
    ts = ev.select(
        "user_id",
        F.col("event_type").alias("et"),
        F.unix_micros("ts").alias("t"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "et").orderBy("t", "event_id")
    gaps = ts.select(
        "et", (F.col("t") - F.lag("t").over(w)).alias("g_us")
    ).filter(F.col("g_us").isNotNull())
    gb = gaps.groupBy(
        "et",
        F.least(
            F.lit(_KS_MAX_BUCKET).cast("long"),
            # the bucket width literal must be BIGINT: 3600 * 1000000
            # overflows Spark's INT literal multiply under ANSI
            F.expr(
                f"g_us div (CAST({_KS_BUCKET_S} AS BIGINT) * 1000000)"
            ),
        ).alias("b"),
    ).agg(
        F.count("*").alias("cnt"),
        F.sum("g_us").cast("long").alias("sum_us"),
    )
    tot = gb.groupBy("et").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("sum_us").cast("long").alias("s_us"),
    )
    wc = Window.partitionBy("et").orderBy("b")
    cum = (
        gb.join(F.broadcast(tot), "et")
        .select(
            "et", "b", "n", "s_us", F.sum("cnt").over(wc).alias("cum_cnt")
        )
    )
    lamx = (
        (F.col("b").cast("double") + 1.0)
        * float(_KS_BUCKET_S)
        * F.col("n").cast("double")
        / (F.col("s_us").cast("double") / 1000000.0)
    )
    dd = cum.select(
        "et",
        "b",
        "n",
        (F.col("cum_cnt").cast("double") / F.col("n").cast("double")).alias(
            "f_hat"
        ),
        F.greatest(
            F.lit(-66060288).cast("long"),
            F.floor(-lamx * F.lit(_LOG2E_20) * 1048576).cast("long"),
        ).alias("s_exp"),
    ).select(
        "et",
        "b",
        "n",
        "f_hat",
        (1.0 - exp2_scaled("s_exp")).alias("f_exp"),
    )
    wr = Window.partitionBy("et").orderBy(
        F.abs(F.col("f_hat") - F.col("f_exp")).desc(), F.col("b")
    )
    ks = dd.select(
        "et",
        "b",
        "f_hat",
        "f_exp",
        F.abs(F.col("f_hat") - F.col("f_exp")).alias("d"),
        F.row_number().over(wr).alias("r"),
    ).filter(F.col("r") == 1)
    return (
        tot.join(ks, "et")
        .select(
            F.col("et").alias("event_type"),
            F.col("n").alias("n_gaps"),
            (
                F.col("s_us").cast("double")
                / 1000000.0
                / F.col("n").cast("double")
            ).alias("mean_gap_s"),
            F.col("d").alias("ks_d"),
            F.col("b").alias("ks_bucket"),
            "f_hat",
            "f_exp",
        )
        .orderBy("event_type")
    )


# --- max-min fair-share allocation (water-filling) --------------------------

# Resource-governor math: give every tenant min(demand, level) where the
# water level is the unique lambda making allocations sum to capacity.
# Exact and sort-based: rank tenants by demand ascending (prefix sums
# via the two-phase distributed scan — no single-partition window),
# k = the largest rank whose full demand fits under the level
# (prefix_k + (n-k)*d_k <= C), lambda = (C - prefix_k)/(n - k) held as
# an integer numerator/denominator pair. Capacity is half the total
# demand, so the level is always binding.

FAIRSHARE_ORACLE = """
WITH dem AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS d
    FROM events GROUP BY user_id
),
tot AS (
    SELECT CAST(SUM(d) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(d) AS BIGINT) // 2 AS cap
    FROM dem
),
rk AS (
    SELECT user_id, d,
           CAST(ROW_NUMBER() OVER (ORDER BY d, user_id) AS BIGINT) AS r,
           CAST(SUM(d) OVER (ORDER BY d, user_id) AS BIGINT) AS pfx
    FROM dem
),
kk AS (
    SELECT COALESCE(MAX(CASE WHEN pfx + (t.n - r) * d <= t.cap
                             THEN r END), 0) AS k
    FROM rk CROSS JOIN tot t
),
lvl AS (
    SELECT t.n, t.cap, t.total, k.k,
           t.cap - COALESCE((SELECT pfx FROM rk WHERE r = k.k), 0) AS lam_num,
           t.n - k.k AS lam_den
    FROM tot t CROSS JOIN kk k
)
SELECT rk.user_id, rk.d AS demand, rk.r AS rank,
       rk.r <= l.k AS fully_served,
       l.lam_num, l.lam_den, l.cap AS capacity,
       CASE WHEN rk.r <= l.k THEN CAST(rk.d AS DOUBLE)
            ELSE CAST(l.lam_num AS DOUBLE) / CAST(l.lam_den AS DOUBLE)
       END AS allocated
FROM rk CROSS JOIN lvl l
ORDER BY rk.r
"""


@register("fair_share_allocation", FAIRSHARE_ORACLE)
def q_fair_share_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min fair (water-filling) allocation of half the event budget
    across users: small tenants keep their full demand, heavy tenants
    are clipped at the exact water level lambda = (C - prefix_k)/(n-k),
    carried as an integer rational so both engines agree bit-for-bit
    (one double division at output).

    Scale: demands are one keyed aggregate; ranks and prefix sums ride
    operators.corpus_stats.distributed_prefix_sum (range sort +
    partition partials + O(#partitions) offset merge — never a
    single-partition window over tenants); the level selection is a
    1-row scalar crossed back."""
    from amorphous_mapreduce_spark.operators.corpus_stats import (
        distributed_prefix_sum,
    )

    ev = load_table(spark, sf_dir, "events")
    dem = ev.groupBy("user_id").agg(F.count("*").alias("d"))
    tot = dem.agg(
        F.sum("d").cast("long").alias("total"),
        F.count("*").cast("long").alias("n"),
        F.expr("CAST(SUM(d) AS BIGINT) div 2").alias("cap"),
    )
    rk = distributed_prefix_sum(
        dem, "d", ["d", "user_id"], cum_col="pfx", rank_col="r"
    ).persist()  # feeds the level pick, the pfx lookup, and the output
    with_tot = rk.crossJoin(F.broadcast(tot))
    kk = with_tot.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("pfx") + (F.col("n") - F.col("r")) * F.col("d")
                    <= F.col("cap"),
                    F.col("r"),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("k")
    )
    pfx_at_k = (
        rk.join(F.broadcast(kk), rk["r"] == kk["k"])
        .select(F.col("pfx").alias("pfx_k"))
    )
    lvl = (
        tot.crossJoin(F.broadcast(kk))
        .crossJoin(
            F.broadcast(
                pfx_at_k.agg(
                    F.coalesce(F.max("pfx_k"), F.lit(0).cast("long")).alias(
                        "pfx_k"
                    )
                )
            )
        )
        .select(
            "k",
            "cap",
            (F.col("cap") - F.col("pfx_k")).alias("lam_num"),
            (F.col("n") - F.col("k")).alias("lam_den"),
        )
    )
    return (
        rk.crossJoin(F.broadcast(lvl))
        .select(
            "user_id",
            F.col("d").alias("demand"),
            F.col("r").alias("rank"),
            (F.col("r") <= F.col("k")).alias("fully_served"),
            "lam_num",
            "lam_den",
            F.col("cap").alias("capacity"),
            F.when(F.col("r") <= F.col("k"), F.col("d").cast("double"))
            .otherwise(
                F.col("lam_num").cast("double")
                / F.col("lam_den").cast("double")
            )
            .alias("allocated"),
        )
        .orderBy("rank")
    )


# --- Lindley backlog recursion (queueing capacity check) --------------------

# The single-server queue recursion W_t = max(0, W_{t-1} + A_t - C):
# feed each day's event arrivals against a fixed capacity of 9/8 the
# mean daily rate and watch the backlog process — the discrete
# companion to littles_law_sweep's steady-state identity, and the
# direct answer to "how much headroom does 12.5% over mean buy us".
# Pure integer max-plus recursion, so the WITH RECURSIVE oracle replays
# it exactly; capacity is (9*N) div (8*T) by truncating division.

LINDLEY_ORACLE = """
WITH RECURSIVE daily AS MATERIALIZED (
    SELECT event_type AS et, epoch_us(ts) // 86400000000 AS d,
           CAST(COUNT(*) AS BIGINT) AS a
    FROM events GROUP BY 1, 2
),
cap AS MATERIALIZED (
    SELECT et, (9 * CAST(SUM(a) AS BIGINT)) // (8 * CAST(COUNT(*) AS BIGINT))
               AS c
    FROM daily GROUP BY et
),
em AS MATERIALIZED (
    SELECT daily.et, d, a, cap.c,
           ROW_NUMBER() OVER (PARTITION BY daily.et ORDER BY d) AS i
    FROM daily JOIN cap ON cap.et = daily.et
),
dp AS (
    SELECT et, i, d, a, c,
           GREATEST(CAST(0 AS BIGINT), a - c) AS w FROM em WHERE i = 1
    UNION ALL
    SELECT e.et, e.i, e.d, e.a, e.c,
           GREATEST(CAST(0 AS BIGINT), dp.w + e.a - e.c) AS w
    FROM dp JOIN em e ON e.et = dp.et AND e.i = dp.i + 1
)
SELECT et AS event_type, d AS epoch_day, a AS arrivals, c AS capacity,
       w AS backlog, w > 0 AS queued
FROM dp ORDER BY event_type, epoch_day
"""


@register("lindley_queue_backlog", LINDLEY_ORACLE)
def q_lindley_queue_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lindley backlog walk per event type: daily arrivals against a
    fixed capacity of 9/8 the mean rate, W_t = max(0, W_{t-1} + A_t - C)
    — which days queue, and how deep, under 12.5% headroom.

    Determinism: integer max-plus recursion with truncating-division
    capacity; the oracle replays it with WITH RECURSIVE per event type.
    Scale: one (type, day) aggregate; each series' walk is a single
    integer of state inside the grouped Arrow kernel."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"),
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
    ).agg(F.count("*").alias("a"))
    cap = daily.groupBy("et").agg(
        F.expr(
            "(9 * CAST(SUM(a) AS BIGINT)) div (8 * CAST(COUNT(*) AS BIGINT))"
        ).alias("c")
    )
    em = daily.join(F.broadcast(cap), "et")

    def _walk(pdf):
        import pandas as pd

        et = str(pdf["et"].iloc[0])
        c = int(pdf["c"].iloc[0])
        rows = sorted(zip(pdf["d"], pdf["a"]), key=lambda r: r[0])
        out, w = [], 0
        for d_, a_ in rows:
            w = max(0, w + int(a_) - c)
            out.append((et, int(d_), int(a_), c, w, w > 0))
        return pd.DataFrame(
            out,
            columns=[
                "event_type",
                "epoch_day",
                "arrivals",
                "capacity",
                "backlog",
                "queued",
            ],
        )

    return (
        em.groupBy("et")
        .applyInPandas(
            _walk,
            "event_type string, epoch_day long, arrivals long,"
            " capacity long, backlog long, queued boolean",
        )
        .orderBy("event_type", "epoch_day")
    )


# --- exact per-type value percentiles (SLO table) ----------------------------

# Exact p50/p90/p99 of events.value per event_type WITHOUT a global
# sort: value is cents-exact (2 decimals), so the cent bucket IS the
# value — per-(type, cents) counts, a cumulative over the value-domain
# frame (bounded by the ~56k distinct cents, not the event count), and
# the type-1 order statistic k = ceil(p * n) picked as the smallest
# cents with cum >= k. The two-phase exact-selection pattern of the
# histogram-median family, at the per-group SLO grain.
_PCTL_SPECS = ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))

PCTL_ORACLE = f"""
WITH cents AS (
    SELECT event_type,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY 1, 2
),
cum AS (
    SELECT event_type, c, cnt,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cumcnt
    FROM cents
),
tot AS (
    SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n FROM cents GROUP BY 1
),
specs AS (
    SELECT * FROM (VALUES {", ".join(f"({pn}, {pd}, '{lbl}')" for pn, pd, lbl in _PCTL_SPECS)})
        AS v(pn, pd, lbl)
)
SELECT cu.event_type, s.lbl AS pct,
       MAX(t.n) AS n,
       CAST(MIN(cu.c) AS BIGINT) AS value_cents,
       CAST(MIN(cu.c) AS DOUBLE) / 100.0 AS value
FROM cum cu
JOIN tot t ON t.event_type = cu.event_type
CROSS JOIN specs s
WHERE cu.cumcnt >= (s.pn * t.n + s.pd - 1) // s.pd
GROUP BY cu.event_type, s.lbl
ORDER BY cu.event_type, s.lbl
"""


@register("events_value_percentiles", PCTL_ORACLE)
def q_events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of event value per event_type — the SLO
    percentile table, computed as exact order statistics over the
    cent-bucket histogram (two-phase selection; the cumulative window
    runs over the VALUE DOMAIN per type, never the event count, so the
    shuffle is bounded at any scale). ceil(p*n) is the integer
    (pn*n + pd - 1) div pd on both engines."""
    ev = load_table(spark, sf_dir, "events")
    cents = ev.groupBy(
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("c"),
    ).agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("c")
    cum = cents.select(
        "event_type", "c", "cnt", F.sum("cnt").over(w).alias("cumcnt")
    )
    tot = cents.groupBy("event_type").agg(
        F.sum("cnt").cast("long").alias("n")
    )
    specs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(pn).alias("pn"),
                    F.lit(pd).alias("pd"),
                    F.lit(lbl).alias("lbl"),
                )
                for pn, pd, lbl in _PCTL_SPECS
            ]
        )
    )
    joined = (
        cum.join(tot, "event_type")
        .select("event_type", "c", "cumcnt", "n", specs.alias("s"))
        .select(
            "event_type",
            "c",
            "cumcnt",
            "n",
            F.col("s.pn").alias("pn"),
            F.col("s.pd").alias("pd"),
            F.col("s.lbl").alias("lbl"),
        )
        .filter(
            F.col("cumcnt")
            >= F.expr("CAST((pn * n + pd - 1) div pd AS BIGINT)")
        )
    )
    return (
        joined.groupBy("event_type", F.col("lbl").alias("pct"))
        .agg(
            F.max("n").alias("n"),
            F.min("c").cast("long").alias("value_cents"),
            (F.min("c").cast("double") / F.lit(100.0)).alias("value"),
        )
        .orderBy("event_type", "pct")
    )
