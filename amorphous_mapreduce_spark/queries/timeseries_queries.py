"""Hypertable-style time-series queries: OHLC bars and TWAP.

Both are keyed-window shapes (the only windows are PARTITION BY a data
key), so they scale as one shuffle on the key:
- OHLC uses the struct-extremum trick for open/close: MIN/MAX over a
  (ts, event_id, value) tuple is lexicographic on BOTH engines, so the
  bar's opening/closing trade is total-order deterministic even with
  simultaneous events — no arg_min tie ambiguity.
- TWAP holds each observation until the next one (keyed LEAD), the last
  until the bucket edge; value x duration accumulates in DECIMAL
  (integer microsecond durations, CLAUDE.md convention 1). The operand
  precisions are chosen so the product lands EXACTLY at (38,6) —
  (17,6) x (20,0) -> 17+20+1 = 38 — because a 39-wide product would be
  silently rescaled to (38,5) by Spark. The decimal SUMS are identical
  on both engines, but a (38,6) sum above 2^53 x 10^-6 double-rounds in
  DuckDB's int128->double cast (Spark's BigDecimal cast is correctly
  rounded), so the final ratio is ROUNDed to 6 dp — the ulp noise is
  ~1e-15 relative, twelve orders below the rounding grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

OHLC_ORACLE = """
WITH e AS (
    SELECT date_trunc('hour', ts) AS bar_start, epoch_us(ts) AS us,
           event_id, event_type, value
    FROM events
)
SELECT bar_start, event_type,
       (MIN({'u': us, 'i': event_id, 'v': value})).v AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       (MAX({'u': us, 'i': event_id, 'v': value})).v AS close,
       COUNT(*) AS n_events
FROM e
GROUP BY bar_start, event_type
"""


@register("ohlc_hourly_bars", OHLC_ORACLE)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the candlestick rollup of a
    metrics hypertable. Open/close via lexicographic struct extrema
    over (ts, event_id, value): deterministic under simultaneous
    events, one keyed aggregate, no window at all."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("bar_start"),
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        "event_type",
        "value",
    )
    tup = F.struct(
        F.col("us").alias("u"), F.col("event_id").alias("i"), F.col("value").alias("v")
    )
    return ev.groupBy("bar_start", "event_type").agg(
        F.min(tup)["v"].alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(tup)["v"].alias("close"),
        F.count("*").alias("n_events"),
    )


TWAP_ORACLE = """
WITH e AS (
    SELECT user_id, epoch_us(ts) AS us, event_id, value,
           epoch_us(ts) // 86400000000 AS day_idx
    FROM events
), held AS (
    SELECT user_id, day_idx, value,
           COALESCE(
               LEAD(us) OVER (PARTITION BY user_id, day_idx
                              ORDER BY us, event_id),
               (day_idx + 1) * 86400000000) - us AS dur_us
    FROM e
)
SELECT user_id, day_idx,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(17,6))
                      * CAST(dur_us AS DECIMAL(20,0))) AS DOUBLE)
             / CAST(CAST(SUM(dur_us) AS BIGINT) AS DOUBLE), 6) AS twap,
       COUNT(*) AS n_events,
       CAST(SUM(dur_us) AS BIGINT) AS held_us
FROM held
GROUP BY user_id, day_idx
"""


@register("twap_user_daily", TWAP_ORACLE)
def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user-day: each observation is
    held until the next (keyed LEAD), the day's last until midnight.
    value x microsecond-duration products accumulate in decimal, so
    the integral is order-insensitive; one keyed window + one keyed
    aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
        "value",
        F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
    )
    w = Window.partitionBy("user_id", "day_idx").orderBy("us", "event_id")
    held = ev.select(
        "user_id",
        "day_idx",
        "value",
        (
            F.coalesce(
                F.lead("us").over(w), (F.col("day_idx") + 1) * F.lit(86_400_000_000)
            )
            - F.col("us")
        ).alias("dur_us"),
    )
    return held.groupBy("user_id", "day_idx").agg(
        F.round(
            F.sum(
                F.col("value").cast("decimal(17,6)")
                * F.col("dur_us").cast("decimal(20,0)")
            ).cast("double")
            / F.sum("dur_us").cast("double"),
            6,
        ).alias("twap"),
        F.count("*").alias("n_events"),
        F.sum("dur_us").alias("held_us"),
    )


STICKINESS_ORACLE = """
WITH e AS (
    SELECT user_id, epoch_us(ts) // 86400000000 AS day_idx
    FROM events
), dau AS (
    SELECT day_idx, COUNT(DISTINCT user_id) AS dau FROM e GROUP BY day_idx
), wau AS (
    SELECT day_idx // 7 AS week_idx, COUNT(DISTINCT user_id) AS wau
    FROM e GROUP BY day_idx // 7
)
SELECT d.day_idx, d.dau, w.wau,
       CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
FROM dau d JOIN wau w ON d.day_idx // 7 = w.week_idx
"""


@register("dau_wau_stickiness", STICKINESS_ORACLE)
def q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics stickiness: daily actives over the containing
    epoch-week's actives (DAU/WAU). Two keyed distinct aggregates and
    a broadcast-able join on the calendar-bounded week frame; integer
    bucketing throughout."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("day_idx")
    )
    dau = ev.groupBy("day_idx").agg(F.count_distinct("user_id").alias("dau"))
    wau = (
        ev.select(F.expr("day_idx div 7").alias("week_idx"), "user_id")
        .groupBy("week_idx")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        dau.withColumn("week_idx", F.expr("day_idx div 7"))
        .join(F.broadcast(wau), "week_idx")
        .select(
            "day_idx",
            "dau",
            "wau",
            (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
                "stickiness"
            ),
        )
    )


ROLLING_WAU_ORACLE = """
WITH e AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_idx
    FROM events
), days AS (
    SELECT DISTINCT day_idx FROM e
), contrib AS (
    SELECT user_id, day_idx + k.range AS target_day
    FROM e, range(7) k
)
SELECT d.day_idx,
       COUNT(DISTINCT c.user_id) AS wau7
FROM days d JOIN contrib c ON c.target_day = d.day_idx
GROUP BY d.day_idx
"""


@register("rolling_wau_7d", ROLLING_WAU_ORACLE)
def q_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct active users per day. Rolling
    COUNT(DISTINCT) does not decompose into mergeable partials, so the
    textbook form is a per-day re-scan; instead each (user, active-day)
    pair contributes itself to the 7 calendar days it stays visible
    (bounded x7 explode) and the answer is one keyed distinct aggregate
    per target day — the same contribution-explode pattern as the
    7-day moving average, applied to a distinct count."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("unix_micros(ts) div 86400000000").alias("day_idx"))
        .distinct()
    )
    days = ev.select(F.col("day_idx").alias("obs_day")).distinct()
    contrib = ev.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day_idx"), F.col("day_idx") + F.lit(6))
        ).alias("target_day"),
    )
    return (
        contrib.join(days, contrib.target_day == days.obs_day)
        .groupBy(F.col("obs_day").alias("day_idx"))
        .agg(F.count_distinct("user_id").alias("wau7"))
    )


CHURN_ORACLE = """
WITH wk AS (
    SELECT DISTINCT user_id,
           (epoch_us(ts) // 86400000000) // 7 AS week_idx
    FROM events
), weeks AS (
    SELECT DISTINCT week_idx FROM wk WHERE week_idx > (SELECT MIN(week_idx) FROM wk)
)
SELECT w.week_idx,
       CAST(SUM(CASE WHEN p.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
       CAST(SUM(CASE WHEN p.user_id IS NOT NULL AND c.user_id IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN c.user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_churned
FROM weeks w
JOIN (SELECT user_id, week_idx FROM wk
      UNION
      SELECT user_id, week_idx + 1 FROM wk) u ON u.week_idx = w.week_idx
LEFT JOIN wk c ON c.user_id = u.user_id AND c.week_idx = w.week_idx
LEFT JOIN wk p ON p.user_id = u.user_id AND p.week_idx = w.week_idx - 1
GROUP BY w.week_idx
"""


@register("weekly_churn", CHURN_ORACLE)
def q_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week user accounting: new (active now, not last week),
    retained (both), churned (last week, not now) — three keyed
    anti/semi joins expressed as one outer join over the union of each
    user's (week, week+1) visibility, so every user-week pair shuffles
    once. Weeks after the first observed week only (the first has no
    prior to compare)."""
    wk = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("(unix_micros(ts) div 86400000000) div 7").alias("week_idx"),
        )
        .distinct()
        .persist()
    )
    first_week = wk.agg(F.min("week_idx").alias("_w0"))
    observed = wk.select("week_idx").distinct()
    universe = (
        wk.select("user_id", "week_idx")
        .unionByName(
            wk.select("user_id", (F.col("week_idx") + 1).alias("week_idx"))
        )
        .distinct()
        .join(observed, "week_idx", "left_semi")
    )
    cur = wk.select(F.col("user_id").alias("cu"), F.col("week_idx").alias("cw"))
    prv = wk.select(F.col("user_id").alias("pu"), (F.col("week_idx") + 1).alias("pw"))
    lab = (
        universe.join(
            cur,
            (F.col("user_id") == F.col("cu")) & (F.col("week_idx") == F.col("cw")),
            "left",
        )
        .join(
            prv,
            (F.col("user_id") == F.col("pu")) & (F.col("week_idx") == F.col("pw")),
            "left",
        )
    )
    out = (
        lab.groupBy("week_idx")
        .agg(
            F.sum(F.when(F.col("pu").isNull(), 1).otherwise(0)).alias("n_new"),
            F.sum(
                F.when(F.col("pu").isNotNull() & F.col("cu").isNotNull(), 1)
                .otherwise(0)
            ).alias("n_retained"),
            F.sum(F.when(F.col("cu").isNull(), 1).otherwise(0)).alias("n_churned"),
        )
    )
    return (
        out.crossJoin(F.broadcast(first_week))
        .filter(F.col("week_idx") > F.col("_w0"))
        .select("week_idx", "n_new", "n_retained", "n_churned")
    )


GAP_HIST_ORACLE = """
WITH gaps AS (
    SELECT event_type,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
    FROM events
), bucketed AS (
    SELECT event_type,
           CASE WHEN gap_us <= 1 THEN 1
                ELSE (CAST(1 AS BIGINT) << length(bin(gap_us - 1)))
           END AS bucket_us
    FROM gaps WHERE gap_us IS NOT NULL
)
SELECT event_type, bucket_us, COUNT(*) AS n_gaps
FROM bucketed GROUP BY event_type, bucket_us
"""


@register("event_gap_histogram", GAP_HIST_ORACLE)
def q_event_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latency-histogram of inter-event gaps per event type in
    power-of-two microsecond buckets — the log2 latency histogram every
    monitoring stack keeps, with bucket caps from integer bit ops
    (length of the binary string), never float log2. One keyed lag
    window + one keyed aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = ev.select(
        "event_type", (F.col("us") - F.lag("us").over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    bucketed = gaps.withColumn(
        "bucket_us",
        F.expr(
            "CASE WHEN gap_us <= 1 THEN CAST(1 AS BIGINT) "
            "ELSE CAST(shiftleft(CAST(1 AS BIGINT), length(bin(gap_us - 1))) "
            "AS BIGINT) END"
        ),
    )
    return bucketed.groupBy("event_type", "bucket_us").agg(
        F.count("*").alias("n_gaps")
    )


SURVIVAL_ORACLE = """
WITH lagged AS (
    SELECT user_id, ts, event_id,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT user_id, ts,
           CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM lagged
), sessions AS (
    SELECT user_id,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_id,
           ts
    FROM flagged
), spans AS (
    SELECT (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 60000000 AS dur_min
    FROM sessions GROUP BY user_id, session_id
), contrib AS (
    SELECT unnest(range(0, LEAST(dur_min, 120) + 1)) AS minute_mark
    FROM spans
)
SELECT minute_mark, COUNT(*) AS n_surviving
FROM contrib GROUP BY minute_mark
"""


@register("session_survival_curve", SURVIVAL_ORACLE)
def q_session_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session survival: how many 30m-gap sessions last at least m
    minutes, for m = 0..120. 'Sessions alive at >= m' is a cumulative
    count from above — computed by exploding each session onto the
    minute marks it survives (fanout capped at 121), so the curve is a
    keyed aggregate, not a running window over the session list."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.col("us") - F.lag("us").over(w)
    is_new = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    sess = ev.select(
        "user_id", "us", F.sum(is_new).over(wrun).alias("session_id")
    )
    spans = sess.groupBy("user_id", "session_id").agg(
        F.expr("(max(us) - min(us)) div 60000000").alias("dur_min")
    )
    contrib = spans.select(
        F.explode(
            F.sequence(F.lit(0), F.least(F.col("dur_min"), F.lit(120)))
        ).alias("minute_mark")
    )
    return contrib.groupBy("minute_mark").agg(F.count("*").alias("n_surviving"))


# --- exact CUSUM change detection -------------------------------------------

CUSUM_ORACLE = """
WITH e AS (
    SELECT user_id, epoch_us(ts) AS us, event_id,
           CAST(value AS DECIMAL(12,2)) AS v
    FROM events
), c AS (
    SELECT user_id, v,
           SUM(v) OVER w AS s,
           ROW_NUMBER() OVER w AS i
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING)
), t AS (
    SELECT user_id, SUM(v) AS tot, COUNT(*) AS n FROM e GROUP BY user_id
)
SELECT c.user_id, MAX(t.n) AS n_events,
       CAST(MAX(ABS(t.n * c.s - c.i * t.tot)) AS DOUBLE) AS max_abs_cusum_scaled
FROM c JOIN t ON c.user_id = t.user_id
GROUP BY c.user_id
"""


@register("user_value_cusum", CUSUM_ORACLE)
def q_user_value_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact CUSUM drift score per user: the classic change-point
    statistic max_i |S_i - i*mean| kept integer-exact by scaling through
    the count (n*S_i - i*T = n * CUSUM_i) — no division, so decimal
    arithmetic stays exact and both engines agree bit-for-bit.

    The running sum is a keyed window over (user, time, event_id); the
    per-user totals join back on the key. A user whose value stream
    shifts mid-history scores high; a stationary stream hovers near 0.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wr = Window.partitionBy("user_id").orderBy("us", "event_id")
    cum = ev.select(
        "user_id",
        F.sum("v").over(w).alias("s"),
        F.row_number().over(wr).alias("i"),
    )
    tot = ev.groupBy("user_id").agg(
        F.sum("v").alias("tot"), F.count("*").alias("n")
    )
    return (
        cum.join(tot, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n").alias("n_events"),
            F.max(F.abs(F.col("n") * F.col("s") - F.col("i") * F.col("tot")))
            .cast("double")
            .alias("max_abs_cusum_scaled"),
        )
    )


# --- day-of-week x hour seasonality profile ----------------------------------

# Engine-independent integer calendar: epoch day 0 (1970-01-01) was a
# Thursday, so (epoch_day + 4) % 7 gives 0=Sunday..6=Saturday on both
# engines with no locale/week-start semantics in play.
SEASONALITY_ORACLE = """
WITH e AS (
    SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
           (epoch_us(ts) // 3600000000) % 24 AS hour_utc,
           CAST(value AS DECIMAL(12,2)) AS v
    FROM events
)
SELECT dow, hour_utc, COUNT(*) AS n_events,
       CAST(SUM(v) AS DOUBLE) AS sum_value,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS avg_value
FROM e GROUP BY dow, hour_utc
"""


@register("events_dow_hour_profile", SEASONALITY_ORACLE)
def q_events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality heatmap: event volume and decimal-exact value stats
    per (day-of-week, UTC hour) cell — the weekly load profile behind
    capacity planning and anomaly baselines. One keyed aggregate over a
    bounded 7x24 key space (map-side combine collapses it early);
    day-of-week is pure integer epoch arithmetic, identical on both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        ((F.expr("unix_micros(ts) div 86400000000") + 4) % 7).alias("dow"),
        (F.expr("unix_micros(ts) div 3600000000") % 24).alias("hour_utc"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    return e.groupBy("dow", "hour_utc").agg(
        F.count("*").alias("n_events"),
        F.sum("v").cast("double").alias("sum_value"),
        (F.sum("v").cast("double") / F.count("*")).alias("avg_value"),
    )


# --- exact truncated EWMA ---------------------------------------------------

# alpha = 1/2 EWMA truncated at K=20 lags: weights are dyadic rationals,
# so scaling by 2^20 turns the whole smoother into BIGINT arithmetic —
# ewma = ewma_scaled / denom_scaled exactly, no float ever accumulates.
_EWMA_K = 20

EWMA_ORACLE = f"""
WITH ev AS (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
    FROM events
),
ranked AS (
    SELECT user_id, us, cents,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY us DESC, event_id DESC) AS rn
    FROM ev
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_used,
       CAST(SUM(cents * (CAST(1 AS BIGINT) << ({_EWMA_K} - rn)))
            AS BIGINT) AS ewma_scaled,
       CAST(SUM(CAST(1 AS BIGINT) << ({_EWMA_K} - rn)) AS BIGINT)
           AS denom_scaled,
       MAX(CASE WHEN rn = 1 THEN us END) AS last_us
FROM ranked WHERE rn <= {_EWMA_K}
GROUP BY user_id
"""


@register("ewma_user_value", EWMA_ORACLE)
def q_ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (alpha = 1/2) of
    event value over the 20 most recent events — the recency-weighted
    engagement score a ranking feature store refreshes continuously.

    The geometric weights 2^-(j+1) are dyadic, so scaling by 2^20 makes
    the smoother exact BIGINT arithmetic: ewma_cents = ewma_scaled /
    denom_scaled with zero float error and order-independent partial
    sums. The recursive definition EWMA_t = αx + (1-α)EWMA_{{t-1}} — a
    sequential scan no cluster can parallelize — becomes one keyed
    window (row_number from the newest) plus one aggregate: the
    closed-form distributed rewrite.

    Scale: everything is keyed by user_id (no global frames); the rn <=
    20 filter bounds per-user work regardless of history length."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    ranked = ev.select(
        "user_id", "us", "cents", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _EWMA_K)
    weight = F.expr(f"shiftleft(CAST(1 AS BIGINT), {_EWMA_K} - rn)")
    return ranked.groupBy("user_id").agg(
        F.count("*").alias("n_used"),
        F.sum(F.col("cents") * weight).alias("ewma_scaled"),
        F.sum(weight).alias("denom_scaled"),
        F.max(F.when(F.col("rn") == 1, F.col("us"))).alias("last_us"),
    )


# --- rolling correlation (explode-shift, no global windows) -----------------

ROLLCORR_ORACLE = """
WITH daily AS (
    SELECT CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                AS BIGINT) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_c,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders GROUP BY 1
),
contrib AS (
    SELECT day + o.range AS tday, rev_c, cnt
    FROM daily CROSS JOIN range(14) o
),
win AS (
    SELECT tday, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(rev_c) AS BIGINT) AS sx_i,
           CAST(SUM(cnt) AS BIGINT) AS sy_i,
           CAST((SUM(CAST(rev_c AS HUGEINT) * rev_c) // 1048576) AS BIGINT)
               AS sxx_hi,
           CAST((SUM(CAST(rev_c AS HUGEINT) * rev_c) % 1048576) AS BIGINT)
               AS sxx_lo,
           CAST(SUM(rev_c * cnt) AS BIGINT) AS sxy_i,
           CAST(SUM(cnt * cnt) AS BIGINT) AS syy_i
    FROM contrib GROUP BY tday
)
SELECT tday AS day, n,
       (CAST(n AS DOUBLE) * CAST(sxy_i AS DOUBLE)
        - CAST(sx_i AS DOUBLE) * CAST(sy_i AS DOUBLE))
       / sqrt((CAST(n AS DOUBLE)
                 * (CAST(sxx_hi AS DOUBLE) * 1048576.0
                    + CAST(sxx_lo AS DOUBLE))
               - CAST(sx_i AS DOUBLE) * CAST(sx_i AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(syy_i AS DOUBLE)
                 - CAST(sy_i AS DOUBLE) * CAST(sy_i AS DOUBLE)))
           AS corr_14d
FROM win WHERE n = 14
"""

@register("rolling_correlation_14d", ROLLCORR_ORACLE)
def q_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-day rolling Pearson correlation between daily revenue and
    daily order volume — the co-movement monitor a quant/finance stack
    keeps per pair of series.

    No global window anywhere: each day's (rev, cnt) point explodes into
    the 14 trailing windows it contributes to (the explode-shift pattern
    from daily_revenue_ma7), so the rolling sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy²) come from ONE keyed aggregate over a
    bounded 14x fanout of the tiny daily grid. The correlation itself is
    a fixed double expression (sqrt is correctly rounded IEEE on both
    engines) over exact decimal/integer inputs."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("timestamp"))
            .cast("long")
            .alias("day"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("rev_c"), F.count("*").alias("cnt"))
    )
    contrib = daily.select(
        "day",
        "rev_c",
        "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(13))).alias("off"),
    ).select((F.col("day") + F.col("off")).alias("tday"), "rev_c", "cnt")
    win = contrib.groupBy("tday").agg(
        F.count("*").alias("n"),
        F.sum("rev_c").alias("sx_i"),
        F.sum("cnt").alias("sy_i"),
        # Σx² exceeds int64, and DuckDB's int128->double cast mis-rounds
        # by 1 ulp past 2^63 — so split the exact decimal into hi/lo
        # int64 halves (hi*2^20 + lo) and reconstruct in double: the
        # scale-by-2^20 is exact, the one rounding is identical on both
        F.sum(F.col("rev_c").cast("decimal(19,0)") * F.col("rev_c"))
        .cast("decimal(38,0)")
        .alias("_sxx"),
        F.sum(F.col("rev_c") * F.col("cnt")).alias("sxy_i"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("syy_i"),
    )
    win = win.withColumn(
        "sxx_lo", F.pmod(F.col("_sxx"), F.lit(1048576)).cast("long")
    ).withColumn(
        "sxx_hi",
        ((F.col("_sxx") - F.pmod(F.col("_sxx"), F.lit(1048576))) / F.lit(1048576))
        .cast("long"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx_i").cast("double")
    sy = F.col("sy_i").cast("double")
    sxx = F.col("sxx_hi").cast("double") * F.lit(1048576.0) + F.col(
        "sxx_lo"
    ).cast("double")
    corr = (nd * F.col("sxy_i").cast("double") - sx * sy) / F.sqrt(
        (nd * sxx - sx * sx)
        * (nd * F.col("syy_i").cast("double") - sy * sy)
    )
    return (
        win.filter(F.col("n") == 14)
        .select(F.col("tday").alias("day"), "n", corr.alias("corr_14d"))
    )


# --- seasonal-baseline anomaly flags ----------------------------------------

SEASONAL_SPIKE_ORACLE = """
WITH hourly AS (
    SELECT epoch_us(ts) // 86400000000 AS day_idx,
           CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
           CAST((epoch_us(ts) % 86400000000) // 3600000000 AS BIGINT) AS hour,
           COUNT(*) AS cnt
    FROM events GROUP BY 1, 2, 3
),
base AS (
    SELECT dow, hour, CAST(SUM(cnt) AS BIGINT) AS total,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM hourly GROUP BY dow, hour
)
SELECT h.day_idx, h.dow, h.hour, CAST(h.cnt AS BIGINT) AS cnt,
       b.total, b.n_cells
FROM hourly h JOIN base b ON h.dow = b.dow AND h.hour = b.hour
WHERE h.cnt * b.n_cells * 2 > b.total * 3
ORDER BY h.day_idx, h.hour
"""


@register("seasonal_spike_flags", SEASONAL_SPIKE_ORACLE)
def q_seasonal_spike_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-adjusted anomaly flags: hours whose event count
    exceeds 1.5x the average for the SAME (day-of-week, hour-of-day)
    cell — the alert rule that survives weekly rhythm, with the
    threshold comparison cross-multiplied (cnt·n·2 > total·3) so no
    division or float ever decides a flag.

    Day-of-week from the engine-independent integer calendar
    ((epoch_day + 4) % 7). Scale: two keyed aggregates + a broadcast
    join of the 168-row baseline grid onto the hourly frame."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
        F.expr("CAST((unix_micros(ts) div 86400000000 + 4) % 7 AS BIGINT)").alias(
            "dow"
        ),
        F.expr(
            "CAST((unix_micros(ts) % 86400000000) div 3600000000 AS BIGINT)"
        ).alias("hour"),
    )
    hourly = ev.groupBy("day_idx", "dow", "hour").agg(F.count("*").alias("cnt"))
    base = hourly.groupBy("dow", "hour").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("n_cells")
    )
    return (
        hourly.join(F.broadcast(base), ["dow", "hour"])
        .filter(F.col("cnt") * F.col("n_cells") * 2 > F.col("total") * 3)
        .select("day_idx", "dow", "hour", "cnt", "total", "n_cells")
        .orderBy("day_idx", "hour")
    )


# --- seasonal-naive forecast backtest ---------------------------------------

NAIVE_BACKTEST_ORACLE = """
WITH daily AS (
    SELECT date_trunc('day', o_orderdate) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
),
paired AS (
    SELECT a.day, a.cents AS actual, f.cents AS forecast
    FROM daily a JOIN daily f ON f.day + INTERVAL 7 DAY = a.day
),
m AS (
    SELECT date_trunc('month', day) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(actual) AS BIGINT) AS actual_cents,
           CAST(SUM(forecast) AS BIGINT) AS forecast_cents,
           CAST(SUM(ABS(actual - forecast)) AS BIGINT) AS abs_err_cents
    FROM paired GROUP BY 1
)
SELECT month, n_days, actual_cents, forecast_cents, abs_err_cents,
       CAST(abs_err_cents AS DOUBLE) / CAST(actual_cents AS DOUBLE) AS wape,
       (CAST(forecast_cents AS DOUBLE) - CAST(actual_cents AS DOUBLE))
       / CAST(actual_cents AS DOUBLE) AS bias
FROM m
"""


@register("seasonal_naive_backtest", NAIVE_BACKTEST_ORACLE)
def q_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's order
    revenue with the same-weekday value one week earlier, then score
    the forecast per month with WAPE (sum|err| / sum actual) and bias —
    the standard sanity baseline every demand-forecasting system must
    beat, and the eval harness that proves it.

    All error mass is integer cents (BIGINT sums — exact, order-free);
    WAPE/bias are one final double division each, so the metric is
    engine-exact. Scale: one keyed daily aggregate (~n_days rows), a
    self-join on the day key shifted 7 days, and a monthly rollup —
    no windows, no skew (day keys are uniform)."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("cents")
    )
    a = daily.select("day", F.col("cents").alias("actual"))
    fc = daily.select(
        (F.col("day") + F.expr("INTERVAL 7 DAYS")).alias("day"),
        F.col("cents").alias("forecast"),
    )
    m = (
        a.join(fc, "day")
        .groupBy(F.date_trunc("month", "day").alias("month"))
        .agg(
            F.count("*").alias("n_days"),
            F.sum("actual").alias("actual_cents"),
            F.sum("forecast").alias("forecast_cents"),
            F.sum(F.abs(F.col("actual") - F.col("forecast"))).alias(
                "abs_err_cents"
            ),
        )
    )
    return m.select(
        "month",
        "n_days",
        "actual_cents",
        "forecast_cents",
        "abs_err_cents",
        (
            F.col("abs_err_cents").cast("double")
            / F.col("actual_cents").cast("double")
        ).alias("wape"),
        (
            (
                F.col("forecast_cents").cast("double")
                - F.col("actual_cents").cast("double")
            )
            / F.col("actual_cents").cast("double")
        ).alias("bias"),
    )


# --- Brown's double exponential smoothing (trend-aware EWMA) ----------------

# alpha = 1/2, truncated at K=20 lags. Single-smoothed weights are
# 2^-(j+1); DOUBLE-smoothed weights are the convolution (j+1)*2^-(j+2).
# Scaling by 2^22 makes BOTH weight families exact BIGINTs
# (2^(22-rn) and rn*2^(21-rn) for rn = 1..20), so level and trend are
# ratios of exact integers — the trend-aware sibling of ewma_user_value.
_BROWN_K = 20

BROWN_ORACLE = f"""
WITH ev AS (
    SELECT user_id, event_id, epoch_us(ts) AS us,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
    FROM events
),
ranked AS (
    SELECT user_id, cents,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY us DESC, event_id DESC) AS rn
    FROM ev
),
sums AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_used,
           CAST(SUM(cents * (CAST(1 AS BIGINT) << (22 - rn))) AS BIGINT)
               AS s1_scaled,
           CAST(SUM(CAST(1 AS BIGINT) << (22 - rn)) AS BIGINT) AS d1_scaled,
           CAST(SUM(cents * rn * (CAST(1 AS BIGINT) << (21 - rn))) AS BIGINT)
               AS s2_scaled,
           CAST(SUM(rn * (CAST(1 AS BIGINT) << (21 - rn))) AS BIGINT)
               AS d2_scaled
    FROM ranked WHERE rn <= {_BROWN_K}
    GROUP BY user_id
)
SELECT user_id, n_used, s1_scaled, d1_scaled, s2_scaled, d2_scaled,
       2.0 * (CAST(s1_scaled AS DOUBLE) / CAST(d1_scaled AS DOUBLE))
       - CAST(s2_scaled AS DOUBLE) / CAST(d2_scaled AS DOUBLE)
           AS level_cents,
       CAST(s1_scaled AS DOUBLE) / CAST(d1_scaled AS DOUBLE)
       - CAST(s2_scaled AS DOUBLE) / CAST(d2_scaled AS DOUBLE)
           AS trend_cents
FROM sums
"""


@register("brown_trend_smoothing", BROWN_ORACLE)
def q_brown_trend_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing per user: level AND trend
    of event value from the 20 most recent events — the trend-aware
    upgrade of ewma_user_value (a rising spender and a flat spender
    with equal EWMAs separate on trend_cents). The doubly-smoothed
    statistic's convolution weights (j+1)*2^-(j+2) stay dyadic, so the
    same 2^22 scaling turns BOTH smoothers into BIGINT sums; level =
    2*S1 - S2 and trend = S1 - S2 are fixed double expressions over
    the exact integer ratios.

    Scale: one keyed window (row_number from newest) + one keyed
    aggregate; rn <= 20 bounds per-user work."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("us"), F.desc("event_id"))
    ranked = ev.select(
        "user_id", "cents", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= _BROWN_K)
    w1 = F.expr("shiftleft(CAST(1 AS BIGINT), 22 - rn)")
    w2 = F.expr("rn * shiftleft(CAST(1 AS BIGINT), 21 - rn)")
    sums = ranked.groupBy("user_id").agg(
        F.count("*").alias("n_used"),
        F.sum(F.col("cents") * w1).alias("s1_scaled"),
        F.sum(w1).alias("d1_scaled"),
        F.sum(F.col("cents") * w2).alias("s2_scaled"),
        F.sum(w2).alias("d2_scaled"),
    )
    s1 = F.col("s1_scaled").cast("double") / F.col("d1_scaled").cast("double")
    s2 = F.col("s2_scaled").cast("double") / F.col("d2_scaled").cast("double")
    return sums.select(
        "user_id",
        "n_used",
        "s1_scaled",
        "d1_scaled",
        "s2_scaled",
        "d2_scaled",
        (F.lit(2.0) * s1 - s2).alias("level_cents"),
        (s1 - s2).alias("trend_cents"),
    )


# --- Haar wavelet energy decomposition --------------------------------------

_HAAR_LEVELS = 5  # detail levels 0..4 over a 32-day dyadic window

HAAR_ORACLE = f"""
WITH daily AS (
    SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
),
anchor AS (SELECT MIN(day) AS d0 FROM daily),
grid AS (
    SELECT day - d0 AS off, cents
    FROM daily CROSS JOIN anchor
    WHERE day - d0 < 32
),
coeffs AS (
    SELECT lv.level,
           off >> (lv.level + 1) AS i,
           CAST(SUM(cents * (1 - 2 * ((off >> lv.level) & 1))) AS BIGINT) AS c
    FROM grid
    CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS lv(level)
    GROUP BY lv.level, i
),
energy AS (
    SELECT level,
           CAST(COUNT(*) AS BIGINT) AS n_coeffs,
           SUM(CAST(c AS HUGEINT) * c) AS e
    FROM coeffs GROUP BY level
)
SELECT level, n_coeffs,
       CAST(e // 1048576 AS BIGINT) AS energy_hi,
       CAST(e % 1048576 AS BIGINT) AS energy_lo
FROM energy
"""


@register("haar_revenue_energy", HAAR_ORACLE)
def q_haar_revenue_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar wavelet energy spectrum of daily revenue over a 32-day
    dyadic window: how much variation lives at each timescale (level 0
    = day-to-day noise, level 2 = ~weekly cycle, level 4 = fortnight
    trend) — the multi-resolution diagnostic behind seasonality-aware
    forecasting and compression. The whole transform is ONE aggregate:
    the level-j coefficient over block i is Σ cents * (1-2*bit_j(day))
    — Haar signs read directly off the day's binary representation, so
    no recursion, no joins, and everything stays integer (energies ride
    the hi/lo int64 split for the int128 sums).

    Scale: daily rollup is one keyed aggregate over orders; the
    transform touches 32 rows x 5 levels. The MIN-day anchor is a
    1-row scalar crossed back (standard pattern)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            (
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("day"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
    )
    anchor = daily.agg(F.min("day").alias("d0"))
    grid = (
        daily.crossJoin(F.broadcast(anchor))
        .select((F.col("day") - F.col("d0")).alias("off"), "cents")
        .filter(F.col("off") < 32)
    )
    levels = F.explode(F.array(*[F.lit(j) for j in range(_HAAR_LEVELS)])).alias(
        "level"
    )
    coeffs = (
        grid.select("off", "cents", levels)
        .select(
            "level",
            F.expr("shiftright(off, level + 1)").alias("i"),
            (
                F.col("cents")
                * (
                    F.lit(1)
                    - F.lit(2)
                    * F.expr("shiftright(off, level)").bitwiseAND(F.lit(1))
                )
            ).alias("signed"),
        )
        .groupBy("level", "i")
        .agg(F.sum("signed").alias("c"))
    )
    energy = coeffs.groupBy("level").agg(
        F.count("*").alias("n_coeffs"),
        F.sum(F.col("c").cast("decimal(19,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("_e"),
    )
    return energy.select(
        "level",
        "n_coeffs",
        ((F.col("_e") - F.pmod(F.col("_e"), F.lit(1048576))) / F.lit(1048576))
        .cast("long")
        .alias("energy_hi"),
        F.pmod(F.col("_e"), F.lit(1048576)).cast("long").alias("energy_lo"),
    )


# --- year-over-year same-weekday comparison ---------------------------------

YOY_ORACLE = """
WITH daily AS (
    SELECT epoch_us(o_orderdate) // 86400000000 AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY 1
)
SELECT c.day,
       CAST((c.day + 4) % 7 AS BIGINT) AS dow,
       c.cents AS cents,
       p.cents AS cents_ly,
       c.n_orders, p.n_orders AS n_orders_ly,
       CAST(c.cents - p.cents AS BIGINT) AS delta_cents,
       CAST(c.cents - p.cents AS DOUBLE) / CAST(p.cents AS DOUBLE)
           AS yoy_growth
FROM daily c JOIN daily p ON p.day = c.day - 364
"""


@register("yoy_same_weekday", YOY_ORACLE)
def q_yoy_same_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-aligned year-over-year revenue: each day compared to
    the day 364 days (exactly 52 weeks) earlier, so Mondays compare to
    Mondays — the retail YoY convention that avoids weekday-mix
    distortion (a 365-day join would drift one weekday per year).
    The engine-independent (epoch_day+4)%7 weekday rides along as a
    self-check column.

    Scale: one keyed daily rollup + one self equi-join on the shifted
    day key (calendar-bounded frames; the daily aggregate is persisted
    for both join sides)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            (
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("day"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"), F.count("*").alias("n_orders"))
        .persist()
    )
    prev = daily.select(
        (F.col("day") + 364).alias("day"),
        F.col("cents").alias("cents_ly"),
        F.col("n_orders").alias("n_orders_ly"),
    )
    return daily.join(prev, "day").select(
        "day",
        F.pmod(F.col("day") + 4, F.lit(7)).cast("long").alias("dow"),
        "cents",
        "cents_ly",
        "n_orders",
        "n_orders_ly",
        (F.col("cents") - F.col("cents_ly")).alias("delta_cents"),
        (
            (F.col("cents") - F.col("cents_ly")).cast("double")
            / F.col("cents_ly").cast("double")
        ).alias("yoy_growth"),
    )


# --- rolling-origin forecast backtest ---------------------------------------

ROLLING_ORIGIN_ORACLE = """
WITH daily AS (
    SELECT epoch_us(o_orderdate) // 86400000000 AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
),
mx AS (SELECT CAST(MAX(day) AS BIGINT) AS max_day FROM daily),
folds AS (
    SELECT f.fold, max_day - 7 * (4 - f.fold) AS cutoff
    FROM (VALUES (1), (2), (3)) AS f(fold) CROSS JOIN mx
),
scored AS (
    SELECT fo.fold,
           a.day, a.cents AS actual, p.cents AS forecast,
           abs(a.cents - p.cents) AS abs_err
    FROM folds fo
    JOIN daily a ON a.day > fo.cutoff AND a.day <= fo.cutoff + 7
    JOIN daily p ON p.day = a.day - 7
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(abs_err) AS BIGINT) AS sum_abs_err_cents,
       CAST(SUM(actual) AS BIGINT) AS sum_actual_cents,
       CAST(SUM(abs_err) AS DOUBLE) / CAST(SUM(actual) AS DOUBLE) AS wape
FROM scored
GROUP BY fold
"""


@register("rolling_origin_backtest", ROLLING_ORIGIN_ORACLE)
def q_rolling_origin_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (walk-forward) evaluation of the seasonal-naive
    forecaster: three week-long test folds at successive cutoffs, each
    scored by WAPE against the lag-7 prediction — the multi-fold
    discipline that catches a forecaster that only worked on one lucky
    week (extends seasonal_naive_backtest's single split).

    Scale: one daily keyed rollup (persisted — both join sides and the
    max-day scalar read it); folds are a constant 3-row frame; the
    fold/test joins are keyed on day. Error mass stays integer cents;
    WAPE is one division per fold."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            (
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86_400_000_000)
            )
            .cast("long")
            .alias("day"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("cents"))
        .persist()
    )
    mx = daily.agg(F.max("day").alias("max_day"))
    folds = (
        spark.createDataFrame([(1,), (2,), (3,)], ["fold"])
        .crossJoin(F.broadcast(mx))
        .select(
            "fold",
            (F.col("max_day") - 7 * (4 - F.col("fold"))).alias("cutoff"),
        )
    )
    a = daily.select("day", F.col("cents").alias("actual"))
    p = daily.select(
        (F.col("day") + 7).alias("day"), F.col("cents").alias("forecast")
    )
    test = a.join(p, "day")
    scored = (
        test.crossJoin(F.broadcast(folds))
        .filter(
            (F.col("day") > F.col("cutoff"))
            & (F.col("day") <= F.col("cutoff") + 7)
        )
        .select(
            "fold", F.abs(F.col("actual") - F.col("forecast")).alias("abs_err"),
            "actual",
        )
    )
    return scored.groupBy("fold").agg(
        F.count("*").alias("n_days"),
        F.sum("abs_err").alias("sum_abs_err_cents"),
        F.sum("actual").alias("sum_actual_cents"),
        (
            F.sum("abs_err").cast("double") / F.sum("actual").cast("double")
        ).alias("wape"),
    )


# --- pinball-loss backtest of day-of-week quantile forecasts -------------------

_PIN_CUT = "2000-01-01"

PINBALL_ORACLE = f"""
WITH daily AS (
    SELECT CAST(o_orderdate AS DATE) AS day,
           (CAST(epoch(CAST(o_orderdate AS DATE)) // 86400 AS BIGINT) + 4)
               % 7 AS dow,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1, 2
),
qd AS (SELECT unnest([1, 5, 9]) AS qn),
tr AS (
    SELECT dow, cents,
           ROW_NUMBER() OVER (PARTITION BY dow ORDER BY cents, day) AS rn,
           COUNT(*) OVER (PARTITION BY dow) AS n
    FROM daily WHERE day < DATE '{_PIN_CUT}'
),
fc AS (
    SELECT tr.dow, qd.qn, tr.n AS n_train, tr.cents AS f
    FROM tr JOIN qd ON tr.rn = (qd.qn * (tr.n + 1) + 9) // 10
),
ho AS (SELECT dow, cents FROM daily WHERE day >= DATE '{_PIN_CUT}'),
loss AS (
    SELECT fc.qn,
           CAST(COUNT(*) AS BIGINT) AS n_test_days,
           CAST(SUM(GREATEST(fc.qn * (ho.cents - fc.f),
                             (fc.qn - 10) * (ho.cents - fc.f)))
                AS BIGINT) AS pinball10_sum,
           CAST(SUM(CASE WHEN ho.cents <= fc.f THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered
    FROM ho JOIN fc ON ho.dow = fc.dow
    GROUP BY fc.qn
)
SELECT 'p' || CAST(qn * 10 AS VARCHAR) AS quantile,
       n_test_days,
       CAST(pinball10_sum AS DOUBLE) / (10.0 * CAST(n_test_days AS DOUBLE))
           AS mean_pinball_cents,
       CAST(n_covered AS DOUBLE) / CAST(n_test_days AS DOUBLE) AS coverage
FROM loss ORDER BY qn
"""


@register("quantile_forecast_pinball", PINBALL_ORACLE)
def q_quantile_forecast_pinball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic-forecast backtest: P10/P50/P90 daily-revenue
    forecasts from same-weekday training history (exact order-statistic
    quantiles, rank = ceil(q*(n+1))), scored on the 2000+ holdout with
    pinball (quantile) loss and empirical coverage — the standard
    evaluation pair for quantile forecasters (coverage ~ q calibrates,
    pinball ranks sharpness).

    Exactness: day-of-week is the engine-independent (epoch_day + 4) %
    7; quantile picks are exact ranks with (cents, day) tie-breaks;
    pinball losses scale by 10 into exact integers (max of two integer
    products — no float before the final mean); coverage is one
    division.

    Scale: daily rollup is calendar-bounded; rank windows partition by
    weekday over day-grain rows; the forecast table is 21 rows joined
    back by weekday."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day"),
        (
            (
                F.expr("CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT)")
                + 4
            )
            % 7
        ).alias("dow"),
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("cents")
    ).persist()  # train ranks AND holdout slice share the rollup
    qd = daily.sparkSession.createDataFrame([(1,), (5,), (9,)], "qn long")
    wtr = Window.partitionBy("dow").orderBy("cents", "day")
    tr = (
        daily.filter(F.col("day") < F.lit(_PIN_CUT).cast("date"))
        .withColumn("rn", F.row_number().over(wtr))
        .withColumn("n", F.count("*").over(Window.partitionBy("dow")))
    )
    fc = tr.join(
        F.broadcast(qd),
        F.col("rn") == F.expr("(qn * (n + 1) + 9) div 10"),
    ).select("dow", "qn", F.col("cents").alias("f"))
    ho = daily.filter(F.col("day") >= F.lit(_PIN_CUT).cast("date")).select(
        "dow", "cents"
    )
    diff = F.col("cents") - F.col("f")
    loss = (
        ho.join(F.broadcast(fc), "dow")
        .groupBy("qn")
        .agg(
            F.count("*").alias("n_test_days"),
            F.sum(
                F.greatest(F.col("qn") * diff, (F.col("qn") - 10) * diff)
            ).alias("pinball10_sum"),
            F.sum(F.when(F.col("cents") <= F.col("f"), 1).otherwise(0)).alias(
                "n_covered"
            ),
        )
    )
    return loss.select(
        F.concat(F.lit("p"), (F.col("qn") * 10).cast("string")).alias("quantile"),
        "n_test_days",
        (
            F.col("pinball10_sum").cast("double")
            / (F.lit(10.0) * F.col("n_test_days").cast("double"))
        ).alias("mean_pinball_cents"),
        (
            F.col("n_covered").cast("double") / F.col("n_test_days").cast("double")
        ).alias("coverage"),
    ).orderBy("qn")


# --- hierarchical forecast reconciliation (bottom-up vs top-down) --------------

HIER_FC_ORACLE = """
WITH rev AS (
    SELECT n.n_regionkey AS region, c.c_nationkey AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS yr,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1, 2, 3
),
nat AS (
    SELECT region, nation,
           CAST(SUM(CASE WHEN yr = 2000 THEN cents ELSE 0 END) AS BIGINT)
               AS fc_bu,
           CAST(SUM(CASE WHEN yr < 2001 THEN cents ELSE 0 END) AS BIGINT)
               AS hist,
           CAST(SUM(CASE WHEN yr = 2001 THEN cents ELSE 0 END) AS BIGINT)
               AS actual
    FROM rev GROUP BY region, nation
),
reg AS (
    SELECT region,
           CAST(SUM(fc_bu) AS BIGINT) AS reg_fc,
           CAST(SUM(hist) AS BIGINT) AS reg_hist
    FROM nat GROUP BY region
)
SELECT n.region, n.nation, n.actual AS actual_2001_cents,
       n.fc_bu AS forecast_bu_cents,
       CAST(r.reg_fc AS DOUBLE) * CAST(n.hist AS DOUBLE)
           / CAST(r.reg_hist AS DOUBLE) AS forecast_td_cents,
       ABS(CAST(n.fc_bu - n.actual AS DOUBLE)) AS abs_err_bu,
       ABS(CAST(r.reg_fc AS DOUBLE) * CAST(n.hist AS DOUBLE)
           / CAST(r.reg_hist AS DOUBLE) - CAST(n.actual AS DOUBLE))
           AS abs_err_td
FROM nat n JOIN reg r USING (region)
ORDER BY region, nation
"""


@register("hierarchical_forecast_reconcile", HIER_FC_ORACLE)
def q_hierarchical_forecast_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical-forecasting reconciliation study over the region ->
    nation revenue hierarchy: the bottom-up naive forecast (each
    nation's year-2000 revenue) vs the top-down one (the region's
    2000 total disaggregated by 1995-2000 historical shares), both
    scored against actual 2001 — the coherence trade-off every
    hierarchical forecast system (ERP rollups, demand planning)
    navigates. By construction BU sums exactly to the region forecast;
    TD matches it too (shares sum to 1) but reallocates across nations.

    Exactness: all yearly revenues are exact integer cents; the
    top-down share applies as ONE double expression (reg_fc * hist /
    reg_hist); errors are single-subtraction doubles.

    Scale: one three-table keyed join to (region, nation, year)
    rollups — 25 nations x 7 years — then 5-region arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("region"),
            F.col("c_nationkey").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
            ).alias("cents")
        )
    )
    nat = rev.groupBy("region", "nation").agg(
        F.sum(F.when(F.col("yr") == 2000, F.col("cents")).otherwise(0)).alias(
            "fc_bu"
        ),
        F.sum(F.when(F.col("yr") < 2001, F.col("cents")).otherwise(0)).alias(
            "hist"
        ),
        F.sum(F.when(F.col("yr") == 2001, F.col("cents")).otherwise(0)).alias(
            "actual"
        ),
    )
    reg = nat.groupBy("region").agg(
        F.sum("fc_bu").alias("reg_fc"), F.sum("hist").alias("reg_hist")
    )
    td = (
        F.col("reg_fc").cast("double")
        * F.col("hist").cast("double")
        / F.col("reg_hist").cast("double")
    )
    return (
        nat.join(F.broadcast(reg), "region")
        .select(
            "region",
            "nation",
            F.col("actual").alias("actual_2001_cents"),
            F.col("fc_bu").alias("forecast_bu_cents"),
            td.alias("forecast_td_cents"),
            F.abs((F.col("fc_bu") - F.col("actual")).cast("double")).alias(
                "abs_err_bu"
            ),
            F.abs(td - F.col("actual").cast("double")).alias("abs_err_td"),
        )
        .orderBy("region", "nation")
    )


# --- Croston intermittent-demand forecast --------------------------------------

CROSTON_K = 8  # demand events kept per part (7 intervals)
CROSTON_TOP = 15

CROSTON_ORACLE = f"""
WITH dd AS (
    SELECT l_partkey AS part, CAST(l_shipdate AS DATE) AS day,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem GROUP BY 1, 2
),
ranked AS (
    SELECT part, day, qty,
           ROW_NUMBER() OVER (PARTITION BY part ORDER BY day DESC) AS j,
           COUNT(*) OVER (PARTITION BY part) AS n_events,
           lead(day) OVER (PARTITION BY part ORDER BY day DESC) AS prev_day
    FROM dd
),
kept AS (SELECT * FROM ranked WHERE j <= {CROSTON_K} AND n_events > {CROSTON_K}),
sm AS (
    SELECT part, MAX(n_events) AS n_events,
           CAST(SUM(qty * CAST(pow(2, {CROSTON_K} - j) AS BIGINT))
                AS BIGINT) AS z_scaled,
           CAST(SUM(CASE WHEN j <= {CROSTON_K} - 1 THEN
                    (epoch(day) - epoch(prev_day)) // 86400
                    * CAST(pow(2, {CROSTON_K} - 1 - j) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS p_scaled
    FROM kept GROUP BY part
)
SELECT part, n_events, z_scaled, p_scaled,
       CAST(z_scaled AS DOUBLE) * 127.0
       / (255.0 * CAST(p_scaled AS DOUBLE)) AS demand_per_day
FROM sm
ORDER BY demand_per_day DESC, part LIMIT {CROSTON_TOP}
"""


@register("croston_intermittent_demand", CROSTON_ORACLE)
def q_croston_intermittent_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method for intermittent demand: per part, exponentially
    smooth the nonzero demand SIZES and the INTERVALS between demand
    days separately (the spare-parts forecasting standard — plain EWMA
    over-forecasts sparse series); forecast rate = size/interval.

    Exactness: truncated geometric weights over the last 8 demand
    events are dyadic integers (2^(K-j), denominators 255/127 fold into
    the final expression), interval days are exact epoch-day integer
    differences, so z and p are exact BIGINTs; ONE cross-multiplied
    double division yields demand/day.

    Scale: per-part windows only (rank + lead partitioned by part,
    bounded to 8 kept rows each); one rollup; distributed top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    dd = li.groupBy(
        F.col("l_partkey").alias("part"),
        F.col("l_shipdate").cast("date").alias("day"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    w = Window.partitionBy("part").orderBy(F.desc("day"))
    ranked = dd.select(
        "part",
        "day",
        "qty",
        F.row_number().over(w).alias("j"),
        F.count("*").over(Window.partitionBy("part")).alias("n_events"),
        F.lead("day").over(w).alias("prev_day"),
    )
    kept = ranked.filter(
        (F.col("j") <= CROSTON_K) & (F.col("n_events") > CROSTON_K)
    )
    zw = F.expr(f"qty * CAST(pow(2, {CROSTON_K} - j) AS BIGINT)")
    pw = F.expr(
        f"CASE WHEN j <= {CROSTON_K} - 1 THEN"
        " datediff(day, prev_day)"
        f" * CAST(pow(2, {CROSTON_K} - 1 - j) AS BIGINT) ELSE 0 END"
    )
    sm = kept.groupBy("part").agg(
        F.max("n_events").alias("n_events"),
        F.sum(zw).alias("z_scaled"),
        F.sum(pw).alias("p_scaled"),
    )
    return (
        sm.select(
            "part",
            "n_events",
            "z_scaled",
            "p_scaled",
            (
                F.col("z_scaled").cast("double")
                * F.lit(127.0)
                / (F.lit(255.0) * F.col("p_scaled").cast("double"))
            ).alias("demand_per_day"),
        )
        .orderBy(F.desc("demand_per_day"), F.asc("part"))
        .limit(CROSTON_TOP)
    )


# --- capture-recapture population estimate ----------------------------------

# Two 'capture occasions' = the first and second half of the event
# horizon. Chapman's bias-corrected Lincoln-Petersen estimator:
#   N_hat = (n1+1)(n2+1)/(m+1) - 1
# against the TRUE population (distinct users overall) as the
# self-audit — the ecology estimator data teams reuse to size 'how many
# users exist that we've only partially observed'.
CAPTURE_ORACLE = """
WITH span AS (
    SELECT MIN(epoch_us(ts)) AS t0, MAX(epoch_us(ts)) AS t1 FROM events
),
occ AS (
    SELECT e.user_id,
           CASE WHEN epoch_us(e.ts) * 2 < s.t0 + s.t1 THEN 0 ELSE 1 END
               AS half
    FROM events e CROSS JOIN span s
),
per_user AS (
    SELECT user_id,
           CAST(MAX(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS in1,
           CAST(MAX(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS in2
    FROM occ GROUP BY user_id
)
SELECT CAST(SUM(in1) AS BIGINT) AS n1,
       CAST(SUM(in2) AS BIGINT) AS n2,
       CAST(SUM(in1 * in2) AS BIGINT) AS m_both,
       CAST(COUNT(*) AS BIGINT) AS n_true,
       CAST((SUM(in1) + 1) * (SUM(in2) + 1) AS DOUBLE)
           / CAST(SUM(in1 * in2) + 1 AS DOUBLE) - 1.0 AS chapman_est
FROM per_user
"""


@register("capture_recapture_actives", CAPTURE_ORACLE)
def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman capture-recapture estimate of the active-user population
    from two capture occasions (first vs second half of the event
    horizon), beside the true distinct count as calibration — the
    partial-observability population estimator (mark-recapture) in its
    data-pipeline form. Integer capture counts, one division.

    Scale: one 1-row horizon scalar broadcast, one keyed per-user
    aggregate, one scalar rollup."""
    ev = load_table(spark, sf_dir, "events")
    span = ev.agg(
        F.min(F.unix_micros("ts")).alias("t0"),
        F.max(F.unix_micros("ts")).alias("t1"),
    )
    occ = ev.crossJoin(F.broadcast(span)).select(
        "user_id",
        F.when(
            F.unix_micros("ts") * 2 < F.col("t0") + F.col("t1"), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("half"),
    )
    per_user = occ.groupBy("user_id").agg(
        F.max(F.when(F.col("half") == 0, 1).otherwise(0)).cast("bigint").alias("in1"),
        F.max(F.when(F.col("half") == 1, 1).otherwise(0)).cast("bigint").alias("in2"),
    )
    n1 = F.sum("in1")
    n2 = F.sum("in2")
    m = F.sum(F.col("in1") * F.col("in2"))
    return per_user.agg(
        n1.alias("n1"),
        n2.alias("n2"),
        m.alias("m_both"),
        F.count("*").alias("n_true"),
        (
            ((n1 + 1) * (n2 + 1)).cast("double") / (m + 1).cast("double")
            - F.lit(1.0)
        ).alias("chapman_est"),
    )


# --- SAX symbolic motifs over weekly revenue ---------------------------------

SAX_ORACLE = """
WITH daily AS (
    SELECT CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                AS BIGINT) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_c
    FROM orders GROUP BY 1
),
weekly AS (
    SELECT day // 7 AS week, CAST(SUM(rev_c) AS BIGINT) AS wrev
    FROM daily GROUP BY 1 HAVING COUNT(*) = 7
),
nw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks FROM weekly),
ranked AS (
    SELECT a.week,
           CAST(1 + COUNT(b.week) AS BIGINT) AS rnk
    FROM weekly a LEFT JOIN weekly b
      ON (b.wrev < a.wrev OR (b.wrev = a.wrev AND b.week < a.week))
    GROUP BY a.week
),
sym AS (
    SELECT week,
           substr('abcd', CAST((4 * (rnk - 1)) // n_weeks AS INT) + 1, 1)
               AS s
    FROM ranked CROSS JOIN nw
),
contrib AS (
    SELECT week - o.range AS start, o.range AS off, s
    FROM sym CROSS JOIN range(4) o
),
words AS (
    SELECT start,
           MAX(CASE WHEN off = 0 THEN s END)
           || MAX(CASE WHEN off = 1 THEN s END)
           || MAX(CASE WHEN off = 2 THEN s END)
           || MAX(CASE WHEN off = 3 THEN s END) AS word
    FROM contrib GROUP BY start HAVING COUNT(*) = 4
),
wstats AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(start) AS BIGINT) AS first_week
    FROM words GROUP BY word
),
gl AS (
    SELECT MAX(cnt) AS max_cnt,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_discords
    FROM wstats
)
SELECT word, cnt, first_week,
       cnt = gl.max_cnt AS is_motif,
       gl.n_discords
FROM wstats CROSS JOIN gl
ORDER BY cnt DESC, word LIMIT 12
"""


@register("sax_weekly_motifs", SAX_ORACLE)
def q_sax_weekly_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX (symbolic aggregate approximation) motif mining on weekly
    revenue: complete weeks -> rank-quantile 4-letter alphabet -> sliding
    4-week words; the most frequent word is the recurring shape (motif),
    words seen once are discord candidates — the classic cheap
    subsequence-mining pass before any expensive matrix-profile run.

    Symbolization is RANK-based (exact order statistics via a bounded
    dominance count on the calendar-sized weekly frame), not
    Gaussian-breakpoint, so every symbol is integer-exact on both
    engines; PAA = the weekly sum itself (rank symbols are invariant
    under the /7 mean). Word assembly is the explode-shift pattern
    (each week contributes to the 4 words covering it) — no windows.

    Scale: one keyed pass over orders; everything downstream is
    calendar-bounded (|weeks| ~ n_days/7), and the dominance rank join
    is quadratic only in that bounded frame (swap in the two-phase
    prefix-rank template past ~10^5 weeks)."""
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
    weekly = (
        daily.groupBy(F.expr("day div 7").alias("week"))
        .agg(F.sum("rev_c").alias("wrev"), F.count("*").alias("_nd"))
        .filter(F.col("_nd") == 7)
        .select("week", "wrev")
        .persist()
    )
    nw = weekly.agg(F.count("*").alias("n_weeks"))
    a, b = weekly.alias("a"), weekly.alias("b")
    ranked = (
        a.join(
            F.broadcast(b),
            (F.col("b.wrev") < F.col("a.wrev"))
            | ((F.col("b.wrev") == F.col("a.wrev")) & (F.col("b.week") < F.col("a.week"))),
            "left",
        )
        .groupBy(F.col("a.week").alias("week"))
        .agg((1 + F.count(F.col("b.week"))).alias("rnk"))
    )
    sym = ranked.crossJoin(F.broadcast(nw)).select(
        "week",
        F.substring(
            F.lit("abcd"),
            F.expr("CAST((4 * (rnk - 1)) div n_weeks AS INT)") + 1,
            1,
        ).alias("s"),
    )
    contrib = sym.select(
        "week", "s", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("off")
    ).select((F.col("week") - F.col("off")).alias("start"), "off", "s")
    words = (
        contrib.groupBy("start")
        .agg(
            F.concat(
                *[
                    F.max(F.when(F.col("off") == o, F.col("s")))
                    for o in range(4)
                ]
            ).alias("word"),
            F.count("*").alias("_n4"),
        )
        .filter(F.col("_n4") == 4)
        .select("start", "word")
    )
    wstats = words.groupBy("word").agg(
        F.count("*").alias("cnt"), F.min("start").alias("first_week")
    )
    gl = wstats.agg(
        F.max("cnt").alias("max_cnt"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_discords"),
    )
    return (
        wstats.crossJoin(F.broadcast(gl))
        .select(
            "word",
            "cnt",
            "first_week",
            (F.col("cnt") == F.col("max_cnt")).alias("is_motif"),
            "n_discords",
        )
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(12)
    )


# --- pinball-loss forecast scoreboard ----------------------------------------

_PINBALL_Q20 = (2, 10, 18)  # 0.1 / 0.5 / 0.9 in twentieths

PINBALL_ORACLE = f"""
WITH daily AS (
    SELECT CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                AS BIGINT) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_c
    FROM orders GROUP BY 1
),
naive AS (
    SELECT a.day, a.rev_c AS y, b.rev_c AS f
    FROM daily a JOIN daily b ON b.day = a.day - 7
),
ma_contrib AS (
    SELECT day + o.range AS tday, rev_c
    FROM daily CROSS JOIN range(1, 8) o
),
ma AS (
    SELECT c.tday AS day, d.rev_c AS y,
           CAST(SUM(c.rev_c) // 7 AS BIGINT) AS f
    FROM ma_contrib c JOIN daily d ON d.day = c.tday
    GROUP BY c.tday, d.rev_c HAVING COUNT(*) = 7
),
fc AS (
    SELECT 'naive7' AS model, day, y, f FROM naive
    UNION ALL
    SELECT 'ma7' AS model, day, y, f FROM ma
),
loss AS (
    SELECT model, q.q20, day,
           CASE WHEN y - f >= 0 THEN q.q20 * (y - f)
                ELSE (q.q20 - 20) * (y - f) END AS l20
    FROM fc CROSS JOIN (VALUES {", ".join(f"({q})" for q in _PINBALL_Q20)})
        AS q(q20)
)
SELECT model, q20, CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(l20) AS BIGINT) AS loss20_total,
       CAST(SUM(l20) AS DOUBLE) / (20.0 * CAST(COUNT(*) AS DOUBLE))
           AS mean_loss_cents
FROM loss GROUP BY model, q20
ORDER BY model, q20
"""


@register("forecast_pinball_loss", PINBALL_ORACLE)
def q_forecast_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (pinball) loss scoreboard for two daily-revenue
    baselines — seasonal-naive (lag-7) vs trailing 7-day mean — at
    q = 0.1/0.5/0.9: the metric that decides which forecaster feeds a
    quantile-aware planner (complements seasonal_naive_backtest's WAPE,
    which only scores the median).

    Quantiles live in twentieths so every per-day loss is an exact
    integer (20x scaled): q20·(y-f) or (q20-20)·(y-f), both
    non-negative ints — no float accumulation; the mean divides once at
    the end. Forecasts are explode-shift dataflow (lag-7 equi-join;
    MA-7 contribution explode with a completeness HAVING) — no global
    windows. Scale: calendar-bounded frames throughout; the only
    data-sized pass is the orders groupBy(day)."""
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
        .persist()
    )
    a, b = daily.alias("a"), daily.alias("b")
    naive = a.join(
        F.broadcast(b), F.col("b.day") == F.col("a.day") - 7
    ).select(
        F.col("a.day").alias("day"),
        F.col("a.rev_c").alias("y"),
        F.col("b.rev_c").alias("f"),
    )
    contrib = daily.select(
        "rev_c", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("off"),
        (F.col("day") + F.col("off")).alias("tday"),
    ).select("tday", "rev_c")
    ma = (
        contrib.groupBy("tday")
        .agg(
            F.expr("CAST(SUM(rev_c) div 7 AS BIGINT)").alias("f"),
            F.count("*").alias("_n7"),
        )
        .filter(F.col("_n7") == 7)
        .join(daily.select(F.col("day").alias("tday"), F.col("rev_c").alias("y")), "tday")
        .select(F.col("tday").alias("day"), "y", "f")
    )
    fc = naive.select(F.lit("naive7").alias("model"), "day", "y", "f").unionAll(
        ma.select(F.lit("ma7").alias("model"), "day", "y", "f")
    )
    loss = fc.select(
        "model",
        "day",
        "y",
        "f",
        F.explode(F.array(*[F.lit(q) for q in _PINBALL_Q20])).alias("q20"),
    ).select(
        "model",
        "q20",
        F.when(
            F.col("y") - F.col("f") >= 0,
            F.col("q20") * (F.col("y") - F.col("f")),
        )
        .otherwise((F.col("q20") - 20) * (F.col("y") - F.col("f")))
        .alias("l20"),
    )
    return (
        loss.groupBy("model", "q20")
        .agg(F.count("*").alias("n_days"), F.sum("l20").alias("loss20_total"))
        .select(
            "model",
            "q20",
            "n_days",
            "loss20_total",
            (
                F.col("loss20_total").cast("double")
                / (F.lit(20.0) * F.col("n_days").cast("double"))
            ).alias("mean_loss_cents"),
        )
        .orderBy("model", "q20")
    )


# --- Kleinberg 2-state burst detection over daily event volume --------------

# The burst-detection op the time-series battery lacked: Kleinberg's
# 2-state automaton per event type (base rate lambda0 = N/T vs the
# elevated rate lambda1 = (9/8)*lambda0, entering the burst state costs
# gamma) as a forward min-cost dynamic program.  The 9/8 ratio is tuned
# to the corpus: daily volumes fluctuate 4-12% around the mean, so a
# textbook 2x automaton would be structurally silent here — the crossover
# for rate (9/8) sits at c > ~1.061*lambda, inside the observed range.
# Everything is INTEGER in 2^20-scaled log2 units: per-day emission
# costs come from the libm-free intlog primitive (the c! term is
# state-independent and cancels from every comparison, so it is dropped
# from the spec), the DP itself is min-plus arithmetic, and the oracle
# replays the identical recursion with WITH RECURSIVE per event type.

_KB_GAMMA = 2 * 1048576  # state 0 -> 1 transition cost: 2 bits, scaled
_KB_LOG2E = 1512775  # floor(log2(e) * 2^20): Poisson rate term lambda*log2(e)


def _kb_em_sql() -> str:
    from amorphous_mapreduce_spark.functions.intlog import log2_scaled_sql

    l0 = f"({log2_scaled_sql('n')} - {log2_scaled_sql('t')})"
    l1 = f"({log2_scaled_sql('9 * n')} - {log2_scaled_sql('8 * t')})"
    return f"""
daily AS MATERIALIZED (
    SELECT event_type AS et, epoch_us(ts) // 86400000000 AS d,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
tot AS MATERIALIZED (
    SELECT et, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS t
    FROM daily GROUP BY et
),
em AS MATERIALIZED (
    SELECT daily.et, d, c,
           ROW_NUMBER() OVER (PARTITION BY daily.et ORDER BY d) AS i,
           (n * {_KB_LOG2E}) // t - c * {l0} AS e0,
           (9 * n * {_KB_LOG2E}) // (8 * t) - c * {l1} AS e1
    FROM daily JOIN tot ON tot.et = daily.et
)
"""


def _kb_oracle() -> str:
    return (
        "WITH RECURSIVE "
        + _kb_em_sql()
        + f""",
dp AS (
    SELECT et, i, d, c, e0 AS c0, e1 + {_KB_GAMMA} AS c1 FROM em WHERE i = 1
    UNION ALL
    SELECT e.et, e.i, e.d, e.c,
           LEAST(dp.c0, dp.c1) + e.e0,
           LEAST(dp.c0 + {_KB_GAMMA}, dp.c1) + e.e1
    FROM dp JOIN em e ON e.et = dp.et AND e.i = dp.i + 1
)
SELECT et AS event_type, d AS epoch_day, c AS n_events, c1 < c0 AS burst,
       c0 - c1 AS burst_margin
FROM dp ORDER BY event_type, epoch_day
"""
    )


KLEINBERG_ORACLE = _kb_oracle()


@register("kleinberg_burst_days", KLEINBERG_ORACLE)
def q_kleinberg_burst_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg 2-state burst automaton over each event type's daily
    count series: which days does a minimum-cost state machine prefer
    to explain with the elevated (9/8) rate, paying gamma to enter the
    burst state — the principled version of a fixed-threshold spike
    flag (cf. exact_anomaly_spikes / seasonal_spike_flags), robust to
    isolated one-day blips.

    Determinism: emission costs are integer 2^20-scaled log2 units via
    functions/intlog (dropping the state-independent log(c!) term);
    the DP is integer min-plus; the oracle replays the exact recursion
    with WITH RECURSIVE over (event_type, day index).

    Scale: the corpus-sized work is ONE (type, day) count aggregate;
    each series' DP state is (c0, c1) over T ~ 90 days — bounded — so
    every series runs independently inside the grouped Arrow kernel
    (the markov / power-iteration pattern), parallel across however
    many series the key space holds. Reference tie-in: VecOp reduce +
    scalar transform chain (src/op.rs:18-35, 66-106)."""
    from amorphous_mapreduce_spark.functions.intlog import log2_scaled

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("et"),
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
    ).agg(F.count("*").alias("c"))
    tot = daily.groupBy("et").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("t"),
    )
    l0 = log2_scaled("n") - log2_scaled("t")
    l1 = log2_scaled("9 * n") - log2_scaled("8 * t")
    em = daily.join(F.broadcast(tot), "et").select(
        "et",
        "d",
        "c",
        (F.expr(f"(n * {_KB_LOG2E}) div t") - F.col("c") * l0).alias("e0"),
        (
            F.expr(f"(9 * n * {_KB_LOG2E}) div (8 * t)") - F.col("c") * l1
        ).alias("e1"),
    )
    gamma = _KB_GAMMA

    def _dp(pdf):
        import pandas as pd

        et = str(pdf["et"].iloc[0])
        rows = sorted(
            zip(pdf["d"], pdf["c"], pdf["e0"], pdf["e1"]),
            key=lambda r: r[0],
        )
        out = []
        c0 = c1 = None
        for d_, c_, e0_, e1_ in rows:
            e0_, e1_ = int(e0_), int(e1_)
            if c0 is None:
                c0, c1 = e0_, e1_ + gamma
            else:
                c0, c1 = (
                    min(c0, c1) + e0_,
                    min(c0 + gamma, c1) + e1_,
                )
            out.append((et, int(d_), int(c_), c1 < c0, c0 - c1))
        return pd.DataFrame(
            out,
            columns=[
                "event_type",
                "epoch_day",
                "n_events",
                "burst",
                "burst_margin",
            ],
        )

    return (
        em.groupBy("et")
        .applyInPandas(
            _dp,
            "event_type string, epoch_day long, n_events long,"
            " burst boolean, burst_margin long",
        )
        .orderBy("event_type", "epoch_day")
    )


# --- newsvendor stock levels ------------------------------------------------

# Inventory math on the demand series: with underage cost 4x overage
# (critical fractile 0.8), the optimal stock is the 0.8-quantile of
# daily demand — taken EXACTLY as the smallest order statistic whose
# rank r satisfies 5*r >= 4*n (cross-multiplied, no float quantile),
# per brand. Windows are partitioned by brand over <= #days rows, so
# the sort is bounded per key, never global.

NEWSVENDOR_ORACLE = """
WITH daily AS (
    SELECT p.p_brand AS brand,
           epoch_us(l.l_shipdate) // 86400000000 AS d,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY 1, 2
),
rk AS (
    SELECT brand, d, qty,
           ROW_NUMBER() OVER (PARTITION BY brand ORDER BY qty, d) AS r,
           COUNT(*) OVER (PARTITION BY brand) AS n,
           CAST(SUM(qty) OVER (PARTITION BY brand) AS BIGINT) AS tot
    FROM daily
)
SELECT brand,
       CAST(MAX(n) AS BIGINT) AS n_days,
       CAST(MAX(tot) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS mean_daily,
       CAST(MAX(CASE WHEN 5 * r >= 4 * n AND 5 * (r - 1) < 4 * n
                     THEN qty END) AS BIGINT) AS q80_daily,
       CAST(MAX(CASE WHEN 5 * r >= 4 * n AND 5 * (r - 1) < 4 * n
                     THEN qty END) AS DOUBLE)
           - CAST(MAX(tot) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
           AS safety_stock
FROM rk GROUP BY brand
ORDER BY brand
"""


@register("newsvendor_stock_levels", NEWSVENDOR_ORACLE)
def q_newsvendor_stock_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking table per brand: the exact 0.8-fractile of
    daily shipped quantity (critical fractile for 4:1 underage:overage
    costs) as the order statistic with 5r >= 4n > 5(r-1) — integer
    cross-multiplication instead of a float quantile — beside the mean
    and the implied safety stock.

    Scale: one (brand, day) aggregate, then per-brand windows over
    <= #days rows (bounded partitions, no global sort). Determinism:
    ranks tie-break on day; the quantile is an exact integer; the two
    doubles are single divisions/differences of exact integers."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    daily = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000").alias("d"),
        )
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )
    wb = Window.partitionBy("brand")
    rk = daily.select(
        "brand",
        "qty",
        F.row_number().over(wb.orderBy("qty", "d")).alias("r"),
        F.count("*").over(wb).alias("n"),
        F.sum("qty").over(wb).cast("long").alias("tot"),
    )
    pick = F.when(
        (5 * F.col("r") >= 4 * F.col("n"))
        & (5 * (F.col("r") - 1) < 4 * F.col("n")),
        F.col("qty"),
    )
    return (
        rk.groupBy("brand")
        .agg(
            F.max("n").cast("long").alias("n_days"),
            (
                F.max("tot").cast("double") / F.max("n").cast("double")
            ).alias("mean_daily"),
            F.max(pick).cast("long").alias("q80_daily"),
            (
                F.max(pick).cast("double")
                - F.max("tot").cast("double") / F.max("n").cast("double")
            ).alias("safety_stock"),
        )
        .orderBy("brand")
    )


# --- Holt linear (level + trend) exponential smoothing ----------------------

# The trend-aware smoother between brown_double_ewma (fixed convolution
# weights) and a full seasonal ETS: dyadic gains alpha = 1/4,
# beta = 1/8 make the recurrence EXACT in 2^20-scaled integers —
# l_t = (x_t + 3*(l + b)) div 4, b_t = ((l_t - l) + 7*b) div 8 — so
# the per-day state walk replays bit-identically in a WITH RECURSIVE
# oracle. Negative trends hit the truncating-vs-floor divide split:
# Spark `div` == DuckDB `//` (both truncate toward zero), and the
# grouped kernel routes Python's flooring // through the same
# sign-guard the power-iteration kernel uses.

_HOLT_SCALE = 1048576


def _holt_oracle() -> str:
    return f"""
WITH RECURSIVE daily AS MATERIALIZED (
    SELECT c.c_mktsegment AS seg,
           epoch_us(o.o_orderdate) // 86400000000 AS d,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                AS BIGINT)) AS BIGINT) AS x
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
),
em AS MATERIALIZED (
    SELECT seg, d, x * {_HOLT_SCALE} AS xq,
           ROW_NUMBER() OVER (PARTITION BY seg ORDER BY d) AS i
    FROM daily
),
dp AS (
    SELECT seg, i, d, xq, xq AS l, CAST(0 AS BIGINT) AS b FROM em WHERE i = 1
    UNION ALL
    SELECT e.seg, e.i, e.d, e.xq,
           (e.xq + 3 * (dp.l + dp.b)) // 4 AS l,
           (((e.xq + 3 * (dp.l + dp.b)) // 4 - dp.l) + 7 * dp.b) // 8 AS b
    FROM dp JOIN em e ON e.seg = dp.seg AND e.i = dp.i + 1
)
SELECT seg, d AS epoch_day,
       xq // {_HOLT_SCALE} AS day_cents,
       l AS level_q, b AS trend_q,
       (l + 7 * b) // {_HOLT_SCALE} AS forecast_7d_cents
FROM dp ORDER BY seg, epoch_day
"""


HOLT_ORACLE = _holt_oracle()


@register("holt_linear_daily", HOLT_ORACLE)
def q_holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (level+trend) smoothing of each segment's daily
    revenue with dyadic gains (alpha 1/4, beta 1/8) in 2^20-scaled
    exact integers, plus the 7-day-ahead linear forecast — the
    trend-aware layer of the forecasting family (naive-seasonal,
    croston, brown, rolling-origin).

    Determinism: the recurrence divides by powers of two with
    truncation toward zero on both engines; the oracle replays it with
    WITH RECURSIVE per segment. Scale: one (segment, day) aggregate is
    the only corpus-sized stage; each segment's (level, trend) walk is
    bounded state inside the grouped Arrow kernel."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.expr(
                "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
            ).alias("d"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("x")
        )
    )
    scale = _HOLT_SCALE

    def _tdiv(a: int, b: int) -> int:
        return a // b if a >= 0 else -((-a) // b)

    def _holt(pdf):
        import pandas as pd

        seg = str(pdf["seg"].iloc[0])
        rows = sorted(zip(pdf["d"], pdf["x"]), key=lambda r: r[0])
        out = []
        l = b = None
        for d_, x_ in rows:
            xq = int(x_) * scale
            if l is None:
                l, b = xq, 0
            else:
                l_new = _tdiv(xq + 3 * (l + b), 4)
                b = _tdiv((l_new - l) + 7 * b, 8)
                l = l_new
            out.append(
                (seg, int(d_), _tdiv(xq, scale), l, b, _tdiv(l + 7 * b, scale))
            )
        return pd.DataFrame(
            out,
            columns=[
                "seg",
                "epoch_day",
                "day_cents",
                "level_q",
                "trend_q",
                "forecast_7d_cents",
            ],
        )

    return (
        daily.groupBy("seg")
        .applyInPandas(
            _holt,
            "seg string, epoch_day long, day_cents long, level_q long,"
            " trend_q long, forecast_7d_cents long",
        )
        .orderBy("seg", "epoch_day")
    )


# --- Ljung-Box autocorrelation test -----------------------------------------

# "Is what's left noise?" — lag-1..7 autocorrelations of each segment's
# centered daily revenue plus the Ljung-Box portmanteau statistic.
# Exactness: center WITHOUT floats by working on y_t = n*x_t - S
# (integer, scaled by n); lag covariances are DECIMAL(38,0) sums of
# y_t*y_{t+k} products (~2^71 at sf0.1 — int64 overflows, HUGEINT/ANSI
# split applies); r_k = cov_k/cov_0 is one double division. The
# cross-lag sum in Q quantizes r_k^2/(n-k) to 2^40 integers per lag
# before summing (grouped-agg order safety), then
# Q = n(n+2) * (sum / 2^40) as a fixed double expression.

_LB_LAGS = 7
_LB_CHI2_7DF_95 = 14.067140449340169
_LB_Q = 1 << 40

LJUNG_ORACLE = f"""
WITH daily AS (
    SELECT c.c_mktsegment AS seg,
           epoch_us(o.o_orderdate) // 86400000000 AS d,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                AS BIGINT)) AS BIGINT) AS x
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
),
scal AS (
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
    FROM daily GROUP BY seg
),
y AS (
    SELECT daily.seg, d, CAST(sc.n * x - sc.s AS BIGINT) AS yv, sc.n
    FROM daily JOIN scal sc ON sc.seg = daily.seg
),
c0 AS (
    -- hi/lo int64 split: DECIMAL(38,0) -> DOUBLE mis-rounds by 1 ulp
    -- past 2^63 in DuckDB (the rolling_correlation_14d gotcha); the
    -- floor-mod form ((v % m) + m) % m also covers NEGATIVE lag sums
    SELECT seg, MAX(n) AS n,
           CAST((cov0 - ((cov0 % 1099511627776 + 1099511627776) % 1099511627776)) // 1099511627776
                AS BIGINT) AS c0_hi,
           CAST((cov0 % 1099511627776 + 1099511627776) % 1099511627776 AS BIGINT) AS c0_lo
    FROM (
        SELECT seg, MAX(n) AS n,
               CAST(SUM(CAST(yv AS DECIMAL(19,0))
                        * CAST(yv AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS cov0
        FROM y GROUP BY seg
    ) GROUP BY seg, c0_hi, c0_lo
),
lk AS (
    SELECT seg, k,
           CAST((covk - ((covk % 1099511627776 + 1099511627776) % 1099511627776)) // 1099511627776
                AS BIGINT) AS ck_hi,
           CAST((covk % 1099511627776 + 1099511627776) % 1099511627776 AS BIGINT) AS ck_lo
    FROM (
        SELECT a.seg, lag.k,
               CAST(SUM(CAST(a.yv AS DECIMAL(19,0))
                        * CAST(b.yv AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS covk
        FROM y a
        JOIN (SELECT unnest(generate_series(1, {_LB_LAGS})) AS k) lag
            ON TRUE
        JOIN y b ON b.seg = a.seg AND b.d = a.d + lag.k
        GROUP BY a.seg, lag.k
    )
),
rk AS (
    SELECT l.seg, l.k, c.n,
           (CAST(l.ck_hi AS DOUBLE) * 1099511627776.0 + CAST(l.ck_lo AS DOUBLE))
           / (CAST(c.c0_hi AS DOUBLE) * 1099511627776.0 + CAST(c.c0_lo AS DOUBLE))
               AS r
    FROM lk l JOIN c0 c ON c.seg = l.seg
),
qq AS (
    SELECT seg, MAX(n) AS n,
           CAST(SUM(CAST(floor(r * r / CAST(n - k AS DOUBLE) * {_LB_Q})
                AS BIGINT)) AS BIGINT) AS qsum
    FROM rk GROUP BY seg
)
SELECT rk.seg, rk.k AS lag, rk.r AS autocorr,
       CAST(q.n AS DOUBLE) * CAST(q.n + 2 AS DOUBLE)
           * (CAST(q.qsum AS DOUBLE) / {_LB_Q}.0) AS lb_q,
       CAST(q.n AS DOUBLE) * CAST(q.n + 2 AS DOUBLE)
           * (CAST(q.qsum AS DOUBLE) / {_LB_Q}.0)
           > {_LB_CHI2_7DF_95} AS not_white_noise
FROM rk JOIN qq q ON q.seg = rk.seg
ORDER BY rk.seg, lag
"""


@register("ljung_box_weekly", LJUNG_ORACLE)
def q_ljung_box_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelations of each segment's centered daily
    revenue with the Ljung-Box portmanteau verdict against
    chi-square(7) — the residual-whiteness check behind every
    forecasting model in the battery (holt / brown / croston /
    seasonal-naive).

    Determinism: centering via y = n*x - S keeps everything integer;
    lag covariances accumulate in DECIMAL(38,0); r_k is one double
    division; the cross-lag Q sum is 2^40-quantized per lag. Scale: one
    (segment, day) aggregate, a 7-way constant lag explode joined on
    (segment, day+k), bounded per-segment frames after."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    daily = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.expr(
                "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
            ).alias("d"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("x")
        )
    )
    scal = daily.groupBy("seg").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("s"),
    )
    y = daily.join(F.broadcast(scal), "seg").select(
        "seg",
        "d",
        (F.col("n") * F.col("x") - F.col("s")).cast("long").alias("yv"),
        "n",
    ).persist()  # cov0, the lag join probe AND build sides all read it
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    def _hilo(col, hi, lo):
        m = F.lit(1099511627776)
        lo_c = F.pmod(F.col(col), m)
        return [
            ((F.col(col) - lo_c) / m).cast("long").alias(hi),
            lo_c.cast("long").alias(lo),
        ]

    c0 = (
        y.groupBy("seg")
        .agg(
            F.max("n").alias("n"),
            F.sum(dec("yv") * dec("yv")).cast("decimal(38,0)").alias("cov0"),
        )
        .select("seg", "n", *_hilo("cov0", "c0_hi", "c0_lo"))
    )
    lagged = y.select(
        "seg",
        "d",
        F.col("yv").alias("ya"),
        F.explode(
            F.array(*[F.lit(k) for k in range(1, _LB_LAGS + 1)])
        ).alias("k"),
    ).withColumn("dk", F.col("d") + F.col("k"))
    lk = (
        lagged.join(
            y.select(
                F.col("seg").alias("sb"),
                F.col("d").alias("db"),
                F.col("yv").alias("yb"),
            ),
            (F.col("seg") == F.col("sb")) & (F.col("dk") == F.col("db")),
        )
        .groupBy("seg", "k")
        .agg(
            F.sum(dec("ya") * dec("yb")).cast("decimal(38,0)").alias("covk")
        )
        .select("seg", "k", *_hilo("covk", "ck_hi", "ck_lo"))
    )
    ckd = F.col("ck_hi").cast("double") * F.lit(1099511627776.0) + F.col(
        "ck_lo"
    ).cast("double")
    c0d = F.col("c0_hi").cast("double") * F.lit(1099511627776.0) + F.col(
        "c0_lo"
    ).cast("double")
    rk = lk.join(F.broadcast(c0), "seg").select(
        "seg",
        "k",
        "n",
        (ckd / c0d).alias("r"),
    ).persist()  # per-lag rows + the Q aggregate both read it
    qq = rk.groupBy("seg").agg(
        F.max("n").alias("n"),
        F.sum(
            F.floor(
                F.col("r")
                * F.col("r")
                / (F.col("n") - F.col("k")).cast("double")
                * _LB_Q
            ).cast("long")
        )
        .cast("long")
        .alias("qsum"),
    )
    lb = (
        F.col("n").cast("double")
        * (F.col("n") + 2).cast("double")
        * (F.col("qsum").cast("double") / float(_LB_Q))
    )
    return (
        rk.drop("n")
        .join(F.broadcast(qq), "seg")
        .select(
            "seg",
            F.col("k").alias("lag"),
            F.col("r").alias("autocorr"),
            lb.alias("lb_q"),
            (lb > F.lit(_LB_CHI2_7DF_95)).alias("not_white_noise"),
        )
        .orderBy("seg", "lag")
    )


# --- generalized-ESD-style iterative revenue outliers --------------------------

_ESD_ROUNDS = 5


def _esd_round_ctes(r: int, prev: str) -> str:
    """One removal round: scalar (n, S) -> argmax |n·x - S| (tie day
    asc) -> remaining set. MATERIALIZED (the kcore lesson)."""
    return f"""
, agg{r} AS MATERIALIZED (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev_c) AS BIGINT) AS s
    FROM {prev}
), pick{r} AS MATERIALIZED (
    SELECT {r} AS round, d.day, d.rev_c, a.n,
           abs(a.n * d.rev_c - a.s) AS dev_num,
           a.s // a.n AS mean_floor_cents
    FROM {prev} d CROSS JOIN agg{r} a
    ORDER BY abs(a.n * d.rev_c - a.s) DESC, d.day ASC
    LIMIT 1
), rem{r} AS MATERIALIZED (
    SELECT d.* FROM {prev} d
    WHERE d.day <> (SELECT day FROM pick{r})
)"""


def _esd_oracle() -> str:
    sql = """
WITH daily AS MATERIALIZED (
    SELECT CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                AS BIGINT) AS day,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_c
    FROM orders GROUP BY 1
)"""
    prev = "daily"
    for r in range(1, _ESD_ROUNDS + 1):
        sql += _esd_round_ctes(r, prev)
        prev = f"rem{r}"
    picks = " UNION ALL ".join(
        f"SELECT * FROM pick{r}" for r in range(1, _ESD_ROUNDS + 1)
    )
    return (
        sql
        + f"""
SELECT round, day, rev_c AS revenue_cents, n AS n_before,
       dev_num, mean_floor_cents
FROM ({picks}) ORDER BY round
"""
    )


@register("seasonal_esd_outliers", _esd_oracle())
def q_seasonal_esd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized-ESD-style iterative outlier extraction on daily
    revenue: 5 rounds of remove-the-extreme-then-recompute — the
    masking-robust procedure (a single pass over z-scores misses
    outliers that inflate each other's variance; Rosner's ESD re-fits
    after every removal). Emits the removal order with each round's
    population size, integer deviation |n·x − S| (cross-multiplied
    |x − mean| — no division, no float), and the floor mean.

    Exactness: the argmax key is a pure integer with a day tie-break;
    mean_floor is one integer division. Scale: the daily frame is
    CALENDAR-BOUNDED (~2,400 rows at any SF), so all 5 rounds are
    constant-size; the only data-sized work is the first
    map-side-combined groupBy(day). The Spark loop localCheckpoints the
    shrinking frame each round (bounded-iteration convention).
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
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("rev_c"))
        .localCheckpoint()
    )
    rem = daily
    picks = []
    for r in range(1, _ESD_ROUNDS + 1):
        agg = rem.agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("rev_c").cast("long").alias("s"),
        )
        pick = (
            rem.crossJoin(F.broadcast(agg))
            .select(
                F.lit(r).alias("round"),
                "day",
                "rev_c",
                "n",
                F.abs(F.col("n") * F.col("rev_c") - F.col("s")).alias(
                    "dev_num"
                ),
                F.expr("s div n").alias("mean_floor_cents"),
            )
            .orderBy(F.desc("dev_num"), F.asc("day"))
            .limit(1)
            .localCheckpoint()
        )
        picks.append(pick)
        rem = rem.join(pick.select("day"), "day", "left_anti").localCheckpoint()
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        "round",
        "day",
        F.col("rev_c").alias("revenue_cents"),
        F.col("n").alias("n_before"),
        "dev_num",
        "mean_floor_cents",
    ).orderBy("round")


# --- dynamic-time-warping brand similarity ---------------------------------------

_DTW_N = 12  # months of 1996; DP is (12 x 12), 300 brand pairs
_DTW_INF = 10**15


def _dtw_diag_cte(d: int) -> str:
    """Diagonal i+j = d from the two previous diagonals (banded-DP
    unroll; LEFT JOINs + COALESCE(INF) encode the DTW boundary rules).
    d = 3 has no d-2 diagonal (the (i-1, j-1) predecessor would sit at
    i+j = 1, outside the grid), so its ul term is the INF literal."""
    if d == 3:
        return f"""
, diag{d} AS MATERIALIZED (
    SELECT p.ba, p.bb, p.i, p.j,
           p.c + LEAST(COALESCE(u.cost, {_DTW_INF}),
                       COALESCE(l.cost, {_DTW_INF})) AS cost
    FROM cells p
    LEFT JOIN diag{d - 1} u
           ON u.ba = p.ba AND u.bb = p.bb AND u.i = p.i - 1 AND u.j = p.j
    LEFT JOIN diag{d - 1} l
           ON l.ba = p.ba AND l.bb = p.bb AND l.i = p.i AND l.j = p.j - 1
    WHERE p.i + p.j = {d}
)"""
    return f"""
, diag{d} AS MATERIALIZED (
    SELECT p.ba, p.bb, p.i, p.j,
           p.c + LEAST(COALESCE(u.cost, {_DTW_INF}),
                       COALESCE(l.cost, {_DTW_INF}),
                       COALESCE(ul.cost, {_DTW_INF})) AS cost
    FROM cells p
    LEFT JOIN diag{d - 1} u
           ON u.ba = p.ba AND u.bb = p.bb AND u.i = p.i - 1 AND u.j = p.j
    LEFT JOIN diag{d - 1} l
           ON l.ba = p.ba AND l.bb = p.bb AND l.i = p.i AND l.j = p.j - 1
    LEFT JOIN diag{d - 2} ul
           ON ul.ba = p.ba AND ul.bb = p.bb AND ul.i = p.i - 1
          AND ul.j = p.j - 1
    WHERE p.i + p.j = {d}
)"""


def _dtw_oracle() -> str:
    sql = f"""
WITH rev AS (
    SELECT p.p_brand AS brand,
           CAST(date_part('month', l.l_shipdate) AS BIGINT) AS m,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE date_part('year', l.l_shipdate) = 1996
    GROUP BY 1, 2
),
series AS MATERIALIZED (
    SELECT b.brand, g.m, COALESCE(r.cents, 0) AS cents
    FROM (SELECT DISTINCT p_brand AS brand FROM part) b
    CROSS JOIN (SELECT unnest(generate_series(1, {_DTW_N})) AS m) g
    LEFT JOIN rev r ON r.brand = b.brand AND r.m = g.m
),
cells AS MATERIALIZED (
    SELECT a.brand AS ba, b.brand AS bb, a.m AS i, b.m AS j,
           abs(a.cents - b.cents) AS c
    FROM series a JOIN series b ON a.brand < b.brand
),
diag2 AS MATERIALIZED (
    SELECT ba, bb, i, j, c AS cost FROM cells WHERE i = 1 AND j = 1
)"""
    for d in range(3, 2 * _DTW_N + 1):
        sql += _dtw_diag_cte(d)
    sql += f"""
SELECT ba AS brand_a, bb AS brand_b, CAST(cost AS BIGINT) AS dtw_cents,
       CAST(ROW_NUMBER() OVER (ORDER BY cost, ba, bb) AS BIGINT) AS rank
FROM diag{2 * _DTW_N}
WHERE i = {_DTW_N} AND j = {_DTW_N}
ORDER BY rank LIMIT 10
"""
    return sql


@register("dtw_brand_similarity", _dtw_oracle())
def q_dtw_brand_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-similar brand pairs by EXACT dynamic time warping
    over their 1996 monthly revenue series — the classic elastic
    time-series similarity measure (the distributed data-series
    similarity-search literature's core primitive, cf. PAPERS.md
    Odyssey/EDBT-2019), absent from the engine until now. L1 ground
    cost in integer cents keeps the whole DP integral, so the DTW
    distance itself hash-matches.

    Distribution shape: the series table is DIMENSION-bounded (25
    brands x 12 months) at any corpus size, so after one distributed
    (brand, month) aggregate the 300-pair DP runs in ONE grouped
    kernel (bpe/markov bounded-state pattern). The oracle unrolls the
    DP by anti-diagonal (22 MATERIALIZED CTEs; LEFT JOIN + COALESCE(INF)
    encode the boundary), mirroring the kendall 2-D grid discipline.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(F.year("l_shipdate") == 1996)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.month("l_shipdate").cast("long").alias("m"),
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(12,2)") * 100).cast(
                    "long"
                )
            ).alias("cents")
        )
    )
    brands = part.select(F.col("p_brand").alias("brand")).distinct()
    months = spark.range(1, _DTW_N + 1).select(F.col("id").alias("m"))
    series = (
        brands.crossJoin(F.broadcast(months))
        .join(rev, ["brand", "m"], "left")
        .select(
            "brand", "m", F.coalesce(F.col("cents"), F.lit(0)).alias("cents")
        )
    )
    n = _DTW_N

    def kernel(pdf):
        import pandas as pd

        s: dict = {}
        for b, m, c in zip(pdf["brand"], pdf["m"], pdf["cents"]):
            s.setdefault(b, [0] * n)[int(m) - 1] = int(c)
        names = sorted(s)
        out = []
        for x in range(len(names)):
            for y in range(x + 1, len(names)):
                a, b = s[names[x]], s[names[y]]
                prev = None
                for i in range(n):
                    cur = [0] * n
                    for j in range(n):
                        c = abs(a[i] - b[j])
                        if i == 0 and j == 0:
                            cur[j] = c
                        elif i == 0:
                            cur[j] = c + cur[j - 1]
                        elif j == 0:
                            cur[j] = c + prev[j]
                        else:
                            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
                    prev = cur
                out.append((names[x], names[y], prev[n - 1]))
        out.sort(key=lambda r: (r[2], r[0], r[1]))
        top = out[:10]
        return pd.DataFrame(
            {
                "brand_a": [r[0] for r in top],
                "brand_b": [r[1] for r in top],
                "dtw_cents": [r[2] for r in top],
                "rank": list(range(1, len(top) + 1)),
            }
        )

    return (
        series.groupBy(F.lit(0).alias("g"))
        .applyInPandas(
            kernel,
            "brand_a string, brand_b string, dtw_cents long, rank long",
        )
        .orderBy("rank")
    )


# --- optimal-partitioning changepoint detection ------------------------------

# Exact L2 changepoint segmentation of the daily revenue series (Jackson
# et al. 2005 "optimal partitioning", the exact-DP ancestor of PELT):
#     r(t) = min_{0<=s<t} r(s) + cost(s+1, t) + pen
# with cost = within-segment SSE. Everything is integer-exact and
# engine-portable:
# - the series is daily revenue in KILODOLLARS (cents div 100000), so
#   (sum rev)^2 stays inside int64 up to ~$3T total revenue (documented
#   precondition; past that the DP moves to the hi/lo split);
# - cost(s,t) = s2 - (s1*s1 // len): the integer floor-division
#   quantization of SSE — identical on both engines, deterministic;
# - penalty = 4 * (total_sse // D): scale-adaptive (yields ~50-110
#   segments at every rung, measured sf0.001-sf1), data-derived so the
#   query is non-degenerate at any revenue magnitude;
# - the argmin is the packed-integer trick: min over s of
#   (r+cost+pen)*4096 + s (D < 4096 always — TPC-H spans ~2400 days at
#   EVERY scale factor, the time range is fixed; the packed value stays
#   well inside int64);
# - the day count D is CONSTANT across SF (more orders per day, not more
#   days), so the O(D^2) DP is constant work at any corpus size — the
#   whole query costs one keyed daily aggregate plus a fixed ~5.8M-step
#   kernel. The oracle replays the DP as a WITH RECURSIVE list-state
#   CTE (r/parent lists grow one element per iteration) plus a second
#   recursive CTE for the backtrack.
OPC_PACK = 4096

OPC_ORACLE = """
WITH RECURSIVE daily AS MATERIALIZED (
    SELECT ROW_NUMBER() OVER (ORDER BY day) AS i, rev FROM (
        SELECT o_orderdate AS day,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                             AS BIGINT)) // 100000 AS BIGINT) AS rev
        FROM orders GROUP BY o_orderdate
    )
),
prefs AS MATERIALIZED (
    SELECT list_prepend(CAST(0 AS BIGINT), list(c1 ORDER BY i)) AS ps1,
           list_prepend(CAST(0 AS BIGINT), list(c2 ORDER BY i)) AS ps2,
           CAST(MAX(i) AS BIGINT) AS d
    FROM (SELECT i,
                 CAST(SUM(rev) OVER (ORDER BY i) AS BIGINT) AS c1,
                 CAST(SUM(rev * rev) OVER (ORDER BY i) AS BIGINT) AS c2
          FROM daily)
),
pen AS MATERIALIZED (
    SELECT ((ps2[d + 1] - (ps1[d + 1] * ps1[d + 1] // d)) // d) * 4 AS pen
    FROM prefs
),
dp AS (
    SELECT CAST(0 AS BIGINT) AS t,
           [CAST(0 AS BIGINT)] AS r,
           [CAST(0 AS BIGINT)] AS par
    UNION ALL
    SELECT dp.t + 1,
           list_append(dp.r, best // 4096),
           list_append(dp.par, best % 4096)
    FROM dp, prefs, pen,
    LATERAL (
        SELECT MIN(
            (dp.r[s + 1]
             + (prefs.ps2[dp.t + 2] - prefs.ps2[s + 1]
                - ((prefs.ps1[dp.t + 2] - prefs.ps1[s + 1])
                   * (prefs.ps1[dp.t + 2] - prefs.ps1[s + 1])
                   // (dp.t + 1 - s)))
             + pen.pen) * 4096 + s) AS best
        FROM (SELECT unnest(generate_series(CAST(0 AS BIGINT), dp.t)) AS s)
    )
    WHERE dp.t < prefs.d
),
fin AS MATERIALIZED (
    SELECT dp.r AS r, dp.par AS par FROM dp, prefs WHERE dp.t = prefs.d
),
bt AS (
    SELECT d AS e FROM prefs
    UNION ALL
    SELECT f.par[bt.e + 1] AS e FROM bt, fin f WHERE bt.e > 0
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY s) AS BIGINT) AS seg_idx,
       s + 1 AS start_i, e AS end_i, e - s AS n_days,
       ps1[e + 1] - ps1[s + 1] AS rev_kusd,
       ps2[e + 1] - ps2[s + 1]
           - ((ps1[e + 1] - ps1[s + 1]) * (ps1[e + 1] - ps1[s + 1])
              // (e - s)) AS cost_q
FROM (SELECT e, f.par[e + 1] AS s FROM bt, fin f WHERE e > 0), prefs
ORDER BY seg_idx
"""


@register("optimal_partitioning_changepoints", OPC_ORACLE)
def q_optimal_partitioning_changepoints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact optimal-partitioning changepoint segmentation (Jackson et
    al. 2005; the exact ancestor of PELT) of the daily revenue series:
    minimizes total within-segment SSE + 4*(total_sse/D) per segment,
    via the O(D^2) DP — returns the segment manifest (bounds, days,
    revenue, cost). See the module comment for the integer-exactness
    and penalty derivation.

    Scale: the day domain D (~2400) is CONSTANT across SF — the data-
    proportional work is ONE keyed daily aggregate; the DP runs inside
    one grouped kernel whose state is D-bounded (the bounded-state
    one-kernel pattern: markov_removal_attribution, holt). Oracle: the
    identical packed-argmin DP as a WITH RECURSIVE list-state CTE.
    """
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").alias("day"))
        .agg(
            F.expr(
                "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100"
                " AS BIGINT)) div 100000 AS BIGINT)"
            ).alias("rev")
        )
        .select(
            F.row_number()
            .over(Window.orderBy("day"))
            .cast("long")
            .alias("i"),
            "rev",
        )
    )

    def _dp(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("i")
        xs = np.asarray(pdf["rev"], dtype=np.int64)
        D = len(xs)
        P1 = np.concatenate(([0], np.cumsum(xs)))
        P2 = np.concatenate(([0], np.cumsum(xs * xs)))
        tot = P2[D] - (P1[D] * P1[D]) // D
        pen = (tot // D) * 4
        r = np.zeros(D + 1, dtype=np.int64)
        par = np.zeros(D + 1, dtype=np.int64)
        for t in range(1, D + 1):
            s = np.arange(t)
            d1 = P1[t] - P1[s]
            cost = P2[t] - P2[s] - (d1 * d1) // (t - s)
            v = (r[s] + cost + pen) * OPC_PACK + s
            b = v.min()
            r[t] = b // OPC_PACK
            par[t] = b % OPC_PACK
        segs = []
        e = D
        while e > 0:
            s = int(par[e])
            segs.append(
                (
                    s + 1,
                    e,
                    e - s,
                    int(P1[e] - P1[s]),
                    int(
                        P2[e]
                        - P2[s]
                        - ((P1[e] - P1[s]) * (P1[e] - P1[s])) // (e - s)
                    ),
                )
            )
            e = s
        segs.reverse()
        return pd.DataFrame(
            {
                "seg_idx": np.arange(1, len(segs) + 1, dtype=np.int64),
                "start_i": [a for a, *_ in segs],
                "end_i": [b for _, b, *_ in segs],
                "n_days": [c for *_, c, _, __ in segs],
                "rev_kusd": [d for *_, d, __ in segs],
                "cost_q": [x[-1] for x in segs],
            }
        )

    return (
        daily.groupBy(F.lit(0).alias("_g"))
        .applyInPandas(
            lambda pdf: _dp(pdf),
            "seg_idx long, start_i long, end_i long, n_days long,"
            " rev_kusd long, cost_q long",
        )
        .orderBy("seg_idx")
    )
