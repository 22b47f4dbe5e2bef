"""Causal-inference / experimentation-ops battery.

The experimentation layer beyond the single test the engine already has
(ab_test_welch, cuped_adjusted_lift, sprt_ab_boundary, diff_in_diff):

- sample_ratio_mismatch — the daily SRM chi-square monitor every
  experiment platform runs before trusting a readout;
- cem_matched_effect — coarsened-exact-matching ATT: stratify on
  coarsened covariates, compare arms within strata, weight by treated
  mass (observational-causal counterpart of the randomized test);
- synthetic_control_gap — donor-segment selection by pre-period fit and
  the post-period treated-vs-synthetic gap;
- mde_segment_table — minimum-detectable-effect sizing per segment (the
  "how long must this test run" table);
- fdr_bh_discoveries — Benjamini–Hochberg FDR control across 25
  per-brand tests, with ENGINE-PORTABLE normal-tail p-values: the
  Abramowitz–Stegun Q(z) approximation evaluated with the repo's
  libm-free exp2 primitive (functions/intexp.py), so both engines
  produce bit-identical p-values and the identical discovery set.

Cross-engine determinism notes:
- chi-square and matching statistics stay INTEGER (cross-multiplied /
  truncating-div-quantized) until one final double division;
- Spark `div` == DuckDB `//` (truncate toward zero, negatives
  included) — relied on for the CEM per-stratum quantization;
- sqrt-only formulas (MDE) are IEEE-exact on both engines;
- the AS-7.1.26 p-value is a FIXED double expression over
  exp2_scaled's deterministic 8-bit-truncated output — approximation
  error ~0.3% is part of the spec, identically on both engines.

Reference tie-in: every query is scan -> keyed aggregate (VecOp reduce,
src/op.rs:66-106) + a bounded head; nothing downstream of the
aggregates scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.hashing import hex_hash64
from amorphous_mapreduce_spark.functions.intexp import (
    exp2_scaled,
    exp2_scaled_sql,
)
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

# --- daily sample-ratio-mismatch monitor ------------------------------------

_SRM_ARMS = 4
_CHI2_3DF_95 = 7.814727903251179  # chi-square(3 df) 0.95 critical value

SRM_ORACLE = f"""
WITH au AS (
    SELECT DISTINCT epoch_us(ts) // 86400000000 AS d,
           CAST('0x' || substr(md5('srm_' || CAST(user_id AS VARCHAR)), 1, 15)
                AS BIGINT) % {_SRM_ARMS} AS arm,
           user_id
    FROM events
),
oc AS (
    SELECT d, arm, CAST(COUNT(*) AS BIGINT) AS o
    FROM au GROUP BY d, arm
),
-- densify to ALL {_SRM_ARMS} arms per day: a zero-count arm is the most
-- severe mismatch and must contribute its (0 - N)^2 term (ADVICE_r04 3)
ocd AS (
    SELECT g.d, g.arm, COALESCE(oc.o, CAST(0 AS BIGINT)) AS o
    FROM (SELECT d, unnest(generate_series(0, {_SRM_ARMS} - 1)) AS arm
          FROM (SELECT DISTINCT d FROM oc)) g
    LEFT JOIN oc ON oc.d = g.d AND oc.arm = g.arm
),
ocn AS (
    SELECT d, arm, o, SUM(o) OVER (PARTITION BY d) AS nd FROM ocd
),
day AS (
    SELECT d,
           CAST(MAX(nd) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN arm = 0 THEN o END) AS BIGINT) AS n0,
           CAST(SUM(CASE WHEN arm = 1 THEN o END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN arm = 2 THEN o END) AS BIGINT) AS n2,
           CAST(SUM(CASE WHEN arm = 3 THEN o END) AS BIGINT) AS n3,
           CAST(SUM(({_SRM_ARMS} * o - nd) * ({_SRM_ARMS} * o - nd))
                AS BIGINT) AS ss
    FROM ocn GROUP BY d
)
SELECT d AS epoch_day, n, n0, n1, n2, n3,
       CAST(ss AS DOUBLE) / ({_SRM_ARMS}.0 * CAST(n AS DOUBLE)) AS chi2,
       CAST(ss AS DOUBLE) / ({_SRM_ARMS}.0 * CAST(n AS DOUBLE))
           > {_CHI2_3DF_95} AS srm_flag
FROM day
ORDER BY epoch_day
"""


@register("sample_ratio_mismatch", SRM_ORACLE)
def q_sample_ratio_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily sample-ratio-mismatch monitor over hash-assigned 4-arm
    experiment traffic: per day, distinct active users per arm vs the
    uniform design split, as the exact chi-square
    chi2 = sum((4*O - N)^2) / (4*N) — integer numerator, one double
    division — flagged against the 3-df 95% critical value.

    Scale: one distinct (day, arm, user) aggregate over events (map-side
    combine collapses repeat activity), then per-day state is 4
    counters — the monitor costs the same as the DAU rollup it rides.
    The hash assignment replays in DuckDB via the md5-substring
    convention, so O, chi2, and every flag hash-match."""
    ev = load_table(spark, sf_dir, "events")
    au = ev.select(
        F.expr("unix_micros(ts) div 86400000000").alias("d"),
        F.pmod(
            hex_hash64(F.concat(F.lit("srm_"), F.col("user_id").cast("string"))),
            F.lit(_SRM_ARMS),
        ).alias("arm"),
        "user_id",
    ).distinct()
    oc = au.groupBy("d", "arm").agg(F.count("*").alias("o"))
    # Densify to all arms per day (constant-level explode + coalesce 0):
    # a zero-count arm must contribute its (0 - N)^2 deviation or chi2 is
    # understated exactly in the worst mismatch case (ADVICE_r04 item 3).
    grid = (
        oc.select("d")
        .distinct()
        .select(
            "d",
            F.explode(
                F.array(*[F.lit(a) for a in range(_SRM_ARMS)])
            ).alias("arm"),
        )
    )
    ocd = grid.join(oc, ["d", "arm"], "left").select(
        "d", "arm", F.coalesce(F.col("o"), F.lit(0)).cast("long").alias("o")
    )
    from pyspark.sql import Window

    n_day = F.sum("o").over(Window.partitionBy("d"))
    dev = _SRM_ARMS * F.col("o") - n_day
    day = (
        ocd.select("d", "arm", "o", (dev * dev).alias("dev2"))
        .groupBy("d")
        .agg(
            F.sum("o").alias("n"),
            F.sum(F.when(F.col("arm") == 0, F.col("o"))).alias("n0"),
            F.sum(F.when(F.col("arm") == 1, F.col("o"))).alias("n1"),
            F.sum(F.when(F.col("arm") == 2, F.col("o"))).alias("n2"),
            F.sum(F.when(F.col("arm") == 3, F.col("o"))).alias("n3"),
            F.sum("dev2").alias("ss"),
        )
    )
    chi2 = F.col("ss").cast("double") / (
        F.lit(float(_SRM_ARMS)) * F.col("n").cast("double")
    )
    return day.select(
        F.col("d").alias("epoch_day"),
        "n",
        "n0",
        "n1",
        "n2",
        "n3",
        chi2.alias("chi2"),
        (chi2 > F.lit(_CHI2_3DF_95)).alias("srm_flag"),
    ).orderBy("epoch_day")


# --- coarsened exact matching ATT -------------------------------------------

_CEM_STRATA_SQL = """
units AS (
    SELECT c.c_custkey,
           CAST('0x' || substr(md5('cem_' || CAST(c.c_custkey AS VARCHAR)),
                1, 15) AS BIGINT) % 2 AS t,
           c.c_nationkey AS nat,
           CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
               // 100000 AS bal_band,
           c.c_mktsegment AS seg,
           COALESCE(o.cents, CAST(0 AS BIGINT)) AS y
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey,
               CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                    AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
),
strata AS (
    SELECT nat, bal_band, seg,
           CAST(SUM(t) AS BIGINT) AS nt,
           CAST(SUM(1 - t) AS BIGINT) AS nc,
           CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS BIGINT) AS st,
           CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS BIGINT) AS sc
    FROM units GROUP BY nat, bal_band, seg
)
"""

CEM_ORACLE = (
    "WITH "
    + _CEM_STRATA_SQL
    + """
SELECT
    CAST(COUNT(*) AS BIGINT) AS n_strata_total,
    CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_strata_matched,
    CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END) AS BIGINT)
        AS nt_matched,
    CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN nc ELSE 0 END) AS BIGINT)
        AS nc_matched,
    CAST(SUM(CASE WHEN nt > 0 AND nc > 0
                  THEN (st * nc - nt * sc) // nc ELSE 0 END) AS BIGINT)
        AS att_num_cents,
    CAST(SUM(CASE WHEN nt > 0 AND nc > 0
                  THEN (st * nc - nt * sc) // nc ELSE 0 END) AS DOUBLE)
        / CAST(SUM(CASE WHEN nt > 0 AND nc > 0 THEN nt ELSE 0 END)
               AS DOUBLE) AS att_cents,
    CAST(SUM(st) AS DOUBLE) / CAST(SUM(nt) AS DOUBLE)
        - CAST(SUM(sc) AS DOUBLE) / CAST(SUM(nc) AS DOUBLE)
        AS naive_diff_cents
FROM strata
"""
)


@register("cem_matched_effect", CEM_ORACLE)
def q_cem_matched_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened-exact-matching treatment effect on customer order value:
    units are customers (hash-assigned arms), strata are
    (nation, acctbal-band, market segment), and the ATT is the
    treated-mass-weighted within-stratum mean difference over strata
    containing BOTH arms — next to the unmatched naive difference it
    corrects.

    Determinism: the per-stratum term (st*nc - nt*sc) / nc is
    floor-at-cent-precision via truncating integer division (Spark
    `div` == DuckDB `//`, negatives included — the documented
    convention), so the summed numerator is an exact BIGINT and only
    the final ATT division is floating point. st*nc stays under 2^63
    (cents x stratum count).

    Scale: one customer-grain aggregate of orders (keyed sum), one
    stratum aggregate, then a 1-row scorecard — per-stratum state is 4
    numbers, mergeable, skew-free."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    units = (
        cust.join(
            per_cust, cust["c_custkey"] == per_cust["o_custkey"], "left"
        )
        .select(
            F.pmod(
                hex_hash64(
                    F.concat(F.lit("cem_"), F.col("c_custkey").cast("string"))
                ),
                F.lit(2),
            ).alias("t"),
            F.col("c_nationkey").alias("nat"),
            F.expr(
                "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
                " div 100000"
            ).alias("bal_band"),
            F.col("c_mktsegment").alias("seg"),
            F.coalesce(F.col("cents"), F.lit(0).cast("long")).alias("y"),
        )
    )
    strata = units.groupBy("nat", "bal_band", "seg").agg(
        F.sum("t").cast("long").alias("nt"),
        F.sum(1 - F.col("t")).cast("long").alias("nc"),
        F.sum(F.when(F.col("t") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("st"),
        F.sum(F.when(F.col("t") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("sc"),
    )
    matched = F.col("nt") > 0
    matched = matched & (F.col("nc") > 0)
    term = F.expr("(st * nc - nt * sc) div nc")
    return strata.agg(
        F.count("*").alias("n_strata_total"),
        F.sum(F.when(matched, 1).otherwise(0))
        .cast("long")
        .alias("n_strata_matched"),
        F.sum(F.when(matched, F.col("nt")).otherwise(0))
        .cast("long")
        .alias("nt_matched"),
        F.sum(F.when(matched, F.col("nc")).otherwise(0))
        .cast("long")
        .alias("nc_matched"),
        F.sum(F.when(matched, term).otherwise(0))
        .cast("long")
        .alias("att_num_cents"),
        (
            F.sum(F.when(matched, term).otherwise(0)).cast("double")
            / F.sum(F.when(matched, F.col("nt")).otherwise(0)).cast("double")
        ).alias("att_cents"),
        (
            F.sum("st").cast("double") / F.sum("nt").cast("double")
            - F.sum("sc").cast("double") / F.sum("nc").cast("double")
        ).alias("naive_diff_cents"),
    )


# --- synthetic-control donor selection + post-period gap --------------------

_SC_TREATED = "BUILDING"
_SC_SPLIT = "1998-01-01"
_SC_SCALE = 1048576  # 2^20 fixed-point for the affine donor scale

_SC_MONTHLY = f"""
mo AS (
    SELECT c.c_mktsegment AS seg,
           CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
                AS BIGINT) AS m,
           CAST(o.o_orderdate < TIMESTAMP '{_SC_SPLIT}' AS INT) AS pre,
           CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100
                AS BIGINT)) AS BIGINT) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2, 3
),
tr AS (SELECT m, pre, cents FROM mo WHERE seg = '{_SC_TREATED}'),
dn AS (SELECT seg, m, pre, cents FROM mo WHERE seg != '{_SC_TREATED}'),
pre_tot AS (
    SELECT d.seg,
           CAST(SUM(t.cents) AS BIGINT) AS s_t,
           CAST(SUM(d.cents) AS BIGINT) AS s_d
    FROM tr t JOIN dn d ON d.m = t.m AND t.pre = 1 AND d.pre = 1
    GROUP BY d.seg
),
beta AS (
    SELECT seg, (s_t * {_SC_SCALE}) // s_d AS b_q, s_t, s_d FROM pre_tot
),
fit AS (
    SELECT b.seg, b.b_q,
           CAST(SUM(((t.cents - (b.b_q * d.cents) // {_SC_SCALE}) // 1024)
                    * ((t.cents - (b.b_q * d.cents) // {_SC_SCALE}) // 1024))
                AS BIGINT) AS sse_pre
    FROM tr t
    JOIN dn d ON d.m = t.m AND t.pre = 1 AND d.pre = 1
    JOIN beta b ON b.seg = d.seg
    GROUP BY b.seg, b.b_q
),
best AS (SELECT seg, b_q, sse_pre FROM fit ORDER BY sse_pre, seg LIMIT 1),
post AS (
    SELECT CAST(SUM(t.cents) AS BIGINT) AS treated_post,
           CAST(SUM((b.b_q * d.cents) // {_SC_SCALE}) AS BIGINT)
               AS synth_post,
           MAX(b.seg) AS donor, MAX(b.b_q) AS b_q,
           MAX(b.sse_pre) AS sse_pre
    FROM tr t
    JOIN dn d ON d.m = t.m AND t.pre = 0 AND d.pre = 0
    JOIN best b ON b.seg = d.seg
)
"""

SC_ORACLE = (
    "WITH "
    + _SC_MONTHLY
    + """
SELECT donor, b_q, sse_pre, treated_post AS treated_post_cents,
       synth_post AS synth_post_cents,
       treated_post - synth_post AS gap_cents,
       CAST(treated_post - synth_post AS DOUBLE)
           / CAST(synth_post AS DOUBLE) AS gap_ratio
FROM post
"""
)


@register("synthetic_control_gap", SC_ORACLE)
def q_synthetic_control_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic-control readout for the BUILDING segment: pick the donor
    segment whose affine-scaled pre-1998 monthly revenue best fits the
    treated series (integer SSE, scale quantized to 2^-20 so both
    engines walk the identical fit), then report the post-period
    treated-vs-synthetic gap.

    Determinism: the donor scale b_q = (S_t * 2^20) div S_d and every
    scaled month (b_q * cents) div 2^20 are truncating-integer
    operations; SSE and the gap are exact BIGINTs — only gap_ratio is
    floating point.

    Scale: one (segment, month) aggregate over orders x customer (the
    data-sized stage), then all fitting happens on #segments x #months
    rows. Donor selection is a total-order LIMIT 1 — auditable and
    tie-stable."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    mo = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("long")
            .alias("m"),
            (F.col("o_orderdate") < F.lit(_SC_SPLIT).cast("timestamp"))
            .cast("int")
            .alias("pre"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast(
                    "long"
                )
            )
            .cast("long")
            .alias("cents")
        )
        .persist()  # treated frame + donor frame both read it
    )
    tr = mo.filter(F.col("seg") == _SC_TREATED).select(
        "m", "pre", F.col("cents").alias("t_cents")
    )
    dn = mo.filter(F.col("seg") != _SC_TREATED).select(
        "seg", "m", "pre", F.col("cents").alias("d_cents")
    )
    pre_join = tr.filter(F.col("pre") == 1).join(
        dn.filter(F.col("pre") == 1).drop("pre"), "m"
    )
    beta = pre_join.groupBy("seg").agg(
        F.expr(f"(SUM(t_cents) * {_SC_SCALE}) div SUM(d_cents)").alias("b_q")
    )
    fit = (
        pre_join.join(F.broadcast(beta), "seg")
        .select(
            "seg",
            "b_q",
            F.expr(
                f"(t_cents - (b_q * d_cents) div {_SC_SCALE}) div 1024"
            ).alias("r"),
        )
        .groupBy("seg", "b_q")
        .agg(F.sum(F.col("r") * F.col("r")).cast("long").alias("sse_pre"))
    )
    best = fit.orderBy("sse_pre", "seg").limit(1)
    post = (
        tr.filter(F.col("pre") == 0)
        .join(dn.filter(F.col("pre") == 0).drop("pre"), "m")
        .join(F.broadcast(best), "seg")
        .agg(
            F.max("seg").alias("donor"),
            F.max("b_q").alias("b_q"),
            F.max("sse_pre").alias("sse_pre"),
            F.sum("t_cents").cast("long").alias("treated_post_cents"),
            F.sum(F.expr(f"(b_q * d_cents) div {_SC_SCALE}"))
            .cast("long")
            .alias("synth_post_cents"),
        )
    )
    gap = F.col("treated_post_cents") - F.col("synth_post_cents")
    return post.select(
        "donor",
        "b_q",
        "sse_pre",
        "treated_post_cents",
        "synth_post_cents",
        gap.alias("gap_cents"),
        (gap.cast("double") / F.col("synth_post_cents").cast("double")).alias(
            "gap_ratio"
        ),
    )


# --- minimum-detectable-effect sizing table ---------------------------------

_Z_ALPHA = 1.959963984540054  # two-sided 5%
_Z_BETA = 0.8416212335729143  # 80% power

MDE_ORACLE = f"""
WITH cents AS (
    SELECT c.c_mktsegment AS seg,
           CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
stats AS (
    SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           CAST(SUM(CAST(x AS DECIMAL(12,0)) * CAST(x AS DECIMAL(12,0)))
                AS DECIMAL(38,0)) AS q
    FROM cents GROUP BY seg
)
SELECT seg, n, s AS sum_cents,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
       (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS var_cents,
       ({_Z_ALPHA} + {_Z_BETA})
           * sqrt(2.0 * ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
                * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(n AS DOUBLE) - 1)) / (CAST(n AS DOUBLE) / 2.0))
           AS mde_cents,
       ({_Z_ALPHA} + {_Z_BETA})
           * sqrt(2.0 * ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
                * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                / (CAST(n AS DOUBLE) - 1)) / (CAST(n AS DOUBLE) / 2.0))
           / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS mde_rel
FROM stats
ORDER BY seg
"""


@register("mde_segment_table", MDE_ORACLE)
def q_mde_segment_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-detectable-effect sizing per market segment: with the
    segment's full order traffic split 50/50, the smallest mean-cents
    lift a two-sided 5% / 80%-power test can resolve —
    (z_a + z_b) * sqrt(2 * s^2 / (n/2)) — from exact decimal moments.

    Determinism: the formula is sqrt-only over doubles produced by the
    decimal(38,0)->double cast (verified bit-identical cross-engine),
    so every MDE hash-matches. Scale: per-segment state is (n, Σx, Σx²)
    — three mergeable numbers."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cents = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    stats = cents.groupBy("seg").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("long").alias("s"),
        F.sum(
            F.col("x").cast("decimal(12,0)") * F.col("x").cast("decimal(12,0)")
        )
        .cast("decimal(38,0)")
        .alias("q"),
    )
    n, s, q = (
        F.col("n").cast("double"),
        F.col("s").cast("double"),
        F.col("q").cast("double"),
    )
    var = (q - s * s / n) / (n - 1)
    mde = F.lit(_Z_ALPHA + _Z_BETA) * F.sqrt(2.0 * var / (n / 2.0))
    return stats.select(
        "seg",
        "n",
        F.col("s").alias("sum_cents"),
        (s / n).alias("mean_cents"),
        var.alias("var_cents"),
        mde.alias("mde_cents"),
        (mde / (s / n)).alias("mde_rel"),
    ).orderBy("seg")


# --- Benjamini-Hochberg FDR over per-brand tests ----------------------------

_FDR_ALPHA = 0.10
_LN2_X2 = 1.3862943611198906  # 2*ln(2): z^2/(2 ln 2) converts e^- to 2^-
_INV_SQRT_2PI = 0.3989422804014327
# Abramowitz-Stegun 7.1.26 coefficients
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_T = 0.2316419

# the shared double expression: p = 2 * phi(z) * poly(t); phi via the
# deterministic exp2 primitive, SAME literal sequence on both engines
_P_EXPR_SPARK = (
    # NOTE the outer parens around the whole polynomial INCLUDING its
    # final "* tt": Spark computes A * (poly * tt); an unparenthesized
    # SQL tail would associate as (A * poly) * tt — 1 ulp apart.
    f"2.0 * ({_INV_SQRT_2PI} * __PHI__) * "
    f"((((( {_AS_B[4]} * tt + {_AS_B[3]}) * tt + {_AS_B[2]}) * tt "
    f"+ {_AS_B[1]}) * tt + {_AS_B[0]}) * tt)"
)


def _fdr_stats_sql() -> str:
    return f"""
cents AS (
    SELECT p.p_brand AS brand,
           CAST('0x' || substr(md5('fdr_' || CAST(l.l_orderkey AS VARCHAR)
                || '_' || CAST(l.l_linenumber AS VARCHAR)), 1, 15)
                AS BIGINT) % 2 AS arm,
           CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS x
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
st AS (
    SELECT brand, arm, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           CAST(SUM(CAST(x AS DECIMAL(12,0)) * CAST(x AS DECIMAL(12,0)))
                AS DECIMAL(38,0)) AS q
    FROM cents GROUP BY brand, arm
),
z AS (
    SELECT a.brand,
           a.n AS n_a, b.n AS n_b,
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
    FROM st a JOIN st b ON a.brand = b.brand AND a.arm = 0 AND b.arm = 1
    WHERE a.n >= 2 AND b.n >= 2
),
pv AS (
    SELECT brand, n_a, n_b, z2,
           1.0 / (1.0 + {_AS_T} * sqrt(z2)) AS tt,
           GREATEST(CAST(-66060288 AS BIGINT),
                    CAST(floor(-z2 / {_LN2_X2} * 1048576) AS BIGINT))
               AS s_exp
    FROM z
),
pp AS (
    SELECT brand, n_a, n_b, z2,
           {_P_EXPR_SPARK.replace("__PHI__", exp2_scaled_sql("s_exp"))} AS p
    FROM pv
),
rk AS (
    SELECT brand, n_a, n_b, z2, p,
           ROW_NUMBER() OVER (ORDER BY p, brand) AS r,
           CAST(COUNT(*) OVER () AS BIGINT) AS m
    FROM pp
),
km AS (
    SELECT *,
           MAX(CASE WHEN p * m <= r * {_FDR_ALPHA} THEN r ELSE 0 END)
               OVER () AS kmax
    FROM rk
)
"""


FDR_ORACLE = (
    "WITH "
    + _fdr_stats_sql()
    + """
SELECT brand, n_a, n_b, z2, p, r, m, r <= kmax AS discovered
FROM km ORDER BY r
"""
)


@register("fdr_bh_discoveries", FDR_ORACLE)
def q_fdr_bh_discoveries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control across 25 per-brand Welch tests of
    line-item price between hash-assigned arms — the multiple-testing
    guard that keeps a 25-readout scorecard from shipping two free
    false positives at alpha = 0.10.

    The cross-engine trick: normal-tail p-values p = 2*Q(|z|) via the
    Abramowitz-Stegun 7.1.26 polynomial, with exp(-z^2/2) computed as
    2^(-z^2/(2 ln 2)) through functions/intexp.exp2_scaled — the
    libm-free, 8-bit-truncated exp2 both engines evaluate identically.
    The ~0.3% envelope is part of the spec; every p, rank, and the BH
    cutoff k_max (max k with p_k * m <= k*alpha) hash-match exactly.

    Scale: per-(brand, arm) state is (n, Σx, Σx²) decimal moments; the
    BH head runs on the 25-row frame (bounded windows). Nothing after
    the scan is corpus-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cents = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        F.col("p_brand").alias("brand"),
        F.pmod(
            hex_hash64(
                F.concat(
                    F.lit("fdr_"),
                    F.col("l_orderkey").cast("string"),
                    F.lit("_"),
                    F.col("l_linenumber").cast("string"),
                )
            ),
            F.lit(2),
        ).alias("arm"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    st = cents.groupBy("brand", "arm").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("long").alias("s"),
        F.sum(
            F.col("x").cast("decimal(12,0)") * F.col("x").cast("decimal(12,0)")
        )
        .cast("decimal(38,0)")
        .alias("q"),
    )
    a = st.filter(F.col("arm") == 0).select(
        "brand",
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("q").alias("q_a"),
    )
    b = st.filter(F.col("arm") == 1).select(
        "brand",
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
    z = (
        a.join(b, "brand")
        .filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
        .select(
            "brand",
            "n_a",
            "n_b",
            ((md * md) / (va + vb)).alias("z2"),
        )
    )
    pv = z.select(
        "brand",
        "n_a",
        "n_b",
        "z2",
        (1.0 / (1.0 + F.lit(_AS_T) * F.sqrt(F.col("z2")))).alias("tt"),
        F.greatest(
            F.lit(-66060288).cast("long"),
            F.floor(-F.col("z2") / F.lit(_LN2_X2) * 1048576).cast("long"),
        ).alias("s_exp"),
    )
    phi = exp2_scaled("s_exp")
    b4, b3, b2, b1, b0 = (
        _AS_B[4],
        _AS_B[3],
        _AS_B[2],
        _AS_B[1],
        _AS_B[0],
    )
    t_ = F.col("tt")
    poly = ((((F.lit(b4) * t_ + b3) * t_ + b2) * t_ + b1) * t_ + b0) * t_
    pp = pv.select(
        "brand",
        "n_a",
        "n_b",
        "z2",
        (2.0 * (F.lit(_INV_SQRT_2PI) * phi) * poly).alias("p"),
    )
    from pyspark.sql import Window

    wr = Window.orderBy("p", "brand")
    wall = Window.partitionBy()
    rk = pp.select(
        "*",
        F.row_number().over(wr).alias("r"),
        F.count("*").over(wall).cast("long").alias("m"),
    )
    km = rk.select(
        "*",
        F.max(
            F.when(
                F.col("p") * F.col("m") <= F.col("r") * F.lit(_FDR_ALPHA),
                F.col("r"),
            ).otherwise(0)
        )
        .over(wall)
        .alias("kmax"),
    )
    return km.select(
        "brand",
        "n_a",
        "n_b",
        "z2",
        "p",
        "r",
        "m",
        (F.col("r") <= F.col("kmax")).alias("discovered"),
    ).orderBy("r")


# --- treatment-effect heterogeneity: Cochran's Q across segments ------------

# "Is the lift the SAME everywhere?" — the question after any
# significant readout. Per-segment Welch effects d_k with variances
# v_k, combined by inverse-variance weights into Cochran's
# Q = sum(w_k d_k^2) - (sum(w_k d_k))^2 / sum(w_k), tested against
# chi-square(K-1). The three cross-segment float sums are
# floor-quantized per segment BEFORE summing (the neyman/cramers_v
# convention: grouped-agg addition order is shuffle-dependent), each in
# a scale matched to its magnitude: w d^2 is O(z^2) -> 2^20, w d is
# O(1e-6) -> 2^40, w is O(1e-10) -> 2^60.

_Q_CHI2_4DF_95 = 9.487729036781154
_Q_SA, _Q_SB, _Q_SC = 1 << 20, 1 << 40, 1 << 60

HETQ_ORACLE = f"""
WITH cents AS (
    SELECT c.c_mktsegment AS seg,
           CAST('0x' || substr(md5('ab_' || CAST(o.o_custkey AS VARCHAR)),
                1, 15) AS BIGINT) % 2 AS arm,
           CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
),
st AS (
    SELECT seg, arm, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           -- 2^40 hi/lo split: sum(x^2) cents^2 passes 2^63 at sf1
           -- (HUGEINT->DOUBLE mis-rounds); // only after CAST AS
           -- HUGEINT (DECIMAL // is a DOUBLE floor-division)
           CAST(CAST(SUM(CAST(x AS DECIMAL(12,0))
                         * CAST(x AS DECIMAL(12,0))) AS HUGEINT)
                // 1099511627776 AS BIGINT) AS q_hi,
           CAST(CAST(SUM(CAST(x AS DECIMAL(12,0))
                         * CAST(x AS DECIMAL(12,0))) AS HUGEINT)
                % 1099511627776 AS BIGINT) AS q_lo
    FROM cents GROUP BY seg, arm
),
eff AS (
    SELECT a.seg, a.n AS n_a, b.n AS n_b,
           CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE)
               - CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) AS d,
           (((CAST(a.q_hi AS DOUBLE) * 1099511627776.0
              + CAST(a.q_lo AS DOUBLE))
               - CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)
               / CAST(a.n AS DOUBLE)) / (CAST(a.n AS DOUBLE) - 1)
               / CAST(a.n AS DOUBLE))
           + (((CAST(b.q_hi AS DOUBLE) * 1099511627776.0
                + CAST(b.q_lo AS DOUBLE))
               - CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)
               / CAST(b.n AS DOUBLE)) / (CAST(b.n AS DOUBLE) - 1)
               / CAST(b.n AS DOUBLE)) AS v
    FROM st a JOIN st b ON a.seg = b.seg AND a.arm = 0 AND b.arm = 1
    WHERE a.n >= 2 AND b.n >= 2
),
terms AS (
    SELECT seg, n_a, n_b, d, v,
           CAST(floor(d * d / v * {_Q_SA}) AS BIGINT) AS qa,
           CAST(floor(d / v * {_Q_SB}) AS BIGINT) AS qb,
           CAST(floor(1.0 / v * {_Q_SC}) AS BIGINT) AS qc
    FROM eff
),
qsum AS (
    SELECT CAST(SUM(qa) AS BIGINT) AS sa, CAST(SUM(qb) AS BIGINT) AS sb,
           CAST(SUM(qc) AS BIGINT) AS sc,
           CAST(COUNT(*) AS BIGINT) AS k
    FROM terms
)
SELECT t.seg, t.n_a, t.n_b, t.d AS effect_cents,
       t.d * t.d / t.v AS z2_seg,
       CAST(q.sa AS DOUBLE) / {_Q_SA}.0
           - (CAST(q.sb AS DOUBLE) / {_Q_SB}.0)
             * (CAST(q.sb AS DOUBLE) / {_Q_SB}.0)
             / (CAST(q.sc AS DOUBLE) / {_Q_SC}.0) AS cochran_q,
       q.k AS n_segments,
       CAST(q.sa AS DOUBLE) / {_Q_SA}.0
           - (CAST(q.sb AS DOUBLE) / {_Q_SB}.0)
             * (CAST(q.sb AS DOUBLE) / {_Q_SB}.0)
             / (CAST(q.sc AS DOUBLE) / {_Q_SC}.0)
           > {_Q_CHI2_4DF_95} AS heterogeneous_95
FROM terms t CROSS JOIN qsum q
ORDER BY t.seg
"""


@register("effect_heterogeneity_q", HETQ_ORACLE)
def q_effect_heterogeneity_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q heterogeneity test across the five market segments'
    Welch A/B effects: per-segment lifts next to the
    inverse-variance-weighted Q statistic and the chi-square(4) 95%
    verdict — whether one pooled readout is even a legitimate summary.

    Determinism: per-segment effects ride the exact-decimal-moment
    welch discipline; the three cross-segment sums are floor-quantized
    integers (scales 2^20 / 2^40 / 2^60 matched to each term's
    magnitude), so the grouped-agg addition order can't move a bit;
    Q itself is one fixed double expression over the integer sums.

    Scale: per-(segment, arm) state is three moments; everything after
    is a 5-row frame plus a 1-row scalar crossed back."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    cents = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.pmod(
            hex_hash64(
                F.concat(F.lit("ab_"), F.col("o_custkey").cast("string"))
            ),
            F.lit(2),
        ).alias("arm"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    qdec = F.sum(
        F.col("x").cast("decimal(12,0)") * F.col("x").cast("decimal(12,0)")
    ).cast("decimal(38,0)")
    two40 = F.lit(1_099_511_627_776)
    st = cents.groupBy("seg", "arm").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("long").alias("s"),
        # 2^40 hi/lo split — see oracle note (sum passes 2^63 at sf1)
        ((qdec - F.pmod(qdec, two40)) / two40).cast("long").alias("q_hi"),
        F.pmod(qdec, two40).cast("long").alias("q_lo"),
    )
    a = st.filter(F.col("arm") == 0).select(
        "seg",
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("q_hi").alias("qhi_a"),
        F.col("q_lo").alias("qlo_a"),
    )
    b = st.filter(F.col("arm") == 1).select(
        F.col("seg").alias("segb"),
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("q_hi").alias("qhi_b"),
        F.col("q_lo").alias("qlo_b"),
    )
    _T40 = F.lit(1_099_511_627_776.0)
    na, sa, qa = (
        F.col("n_a").cast("double"),
        F.col("s_a").cast("double"),
        F.col("qhi_a").cast("double") * _T40 + F.col("qlo_a").cast("double"),
    )
    nb, sb, qb = (
        F.col("n_b").cast("double"),
        F.col("s_b").cast("double"),
        F.col("qhi_b").cast("double") * _T40 + F.col("qlo_b").cast("double"),
    )
    d = sa / na - sb / nb
    v = (qa - sa * sa / na) / (na - 1) / na + (qb - sb * sb / nb) / (
        nb - 1
    ) / nb
    eff = (
        a.join(b, a["seg"] == b["segb"])
        .filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2))
        .select("seg", "n_a", "n_b", d.alias("d"), v.alias("v"))
    )
    terms = eff.select(
        "seg",
        "n_a",
        "n_b",
        "d",
        "v",
        F.floor(F.col("d") * F.col("d") / F.col("v") * _Q_SA)
        .cast("long")
        .alias("qa"),
        F.floor(F.col("d") / F.col("v") * _Q_SB).cast("long").alias("qb"),
        F.floor(1.0 / F.col("v") * _Q_SC).cast("long").alias("qc"),
    ).persist()  # segment rows + the Q scalar both read it
    qsum = terms.agg(
        F.sum("qa").cast("long").alias("sa"),
        F.sum("qb").cast("long").alias("sb"),
        F.sum("qc").cast("long").alias("sc"),
        F.count("*").cast("long").alias("k"),
    )
    q_expr = (
        F.col("sa").cast("double") / float(_Q_SA)
        - (F.col("sb").cast("double") / float(_Q_SB))
        * (F.col("sb").cast("double") / float(_Q_SB))
        / (F.col("sc").cast("double") / float(_Q_SC))
    )
    return (
        terms.crossJoin(F.broadcast(qsum))
        .select(
            "seg",
            "n_a",
            "n_b",
            F.col("d").alias("effect_cents"),
            (F.col("d") * F.col("d") / F.col("v")).alias("z2_seg"),
            q_expr.alias("cochran_q"),
            F.col("k").alias("n_segments"),
            (q_expr > F.lit(_Q_CHI2_4DF_95)).alias("heterogeneous_95"),
        )
        .orderBy("seg")
    )


# --- instrumental-variable (Wald / LATE) estimate ------------------------------

_IV_Z = (
    "CAST('0x' || substr(md5('ivz:' || CAST(c_custkey AS VARCHAR)), 1, 15)"
    " AS BIGINT)"
)
_IV_C = (
    "CAST('0x' || substr(md5('ivc:' || CAST(c_custkey AS VARCHAR)), 1, 15)"
    " AS BIGINT)"
)

IV_WALD_ORACLE = f"""
WITH rev AS (
    SELECT o_custkey,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY o_custkey
),
units AS (
    SELECT c.c_custkey,
           {_IV_Z} % 2 AS z,
           CASE WHEN {_IV_Z} % 2 = 1
                THEN CASE WHEN {_IV_C} % 10 < 7 THEN 1 ELSE 0 END
                ELSE CASE WHEN {_IV_C} % 10 < 2 THEN 1 ELSE 0 END
           END AS t,
           COALESCE(r.cents, 0) AS y
    FROM customer c LEFT JOIN rev r ON r.o_custkey = c.c_custkey
),
arms AS (
    SELECT CAST(SUM(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           CAST(SUM(CASE WHEN z = 1 THEN t ELSE 0 END) AS BIGINT) AS k1,
           CAST(SUM(CASE WHEN z = 0 THEN t ELSE 0 END) AS BIGINT) AS k0,
           CAST(SUM(CASE WHEN z = 1 THEN y ELSE 0 END) AS BIGINT) AS s1,
           CAST(SUM(CASE WHEN z = 0 THEN y ELSE 0 END) AS BIGINT) AS s0
    FROM units
),
frac AS (
    SELECT *,
           CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1 AS num,
           CAST(k1 AS HUGEINT) * n0 - CAST(k0 AS HUGEINT) * n1 AS den
    FROM arms
)
SELECT n1, n0, k1, k0, s1 AS sum1_cents, s0 AS sum0_cents,
       CAST((1000000 * (k1 * n0 - k0 * n1)) // (n1 * n0) AS BIGINT)
           AS first_stage_ppm,
       CAST(CASE WHEN num >= 0 THEN (100 * num) // den
                 ELSE -((100 * (-num)) // den) END AS BIGINT)
           AS late_centicents
FROM frac
"""


@register("iv_wald_estimate", IV_WALD_ORACLE)
def q_iv_wald_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable (Wald) estimate of a local average
    treatment effect — the encouragement-design readout the causal
    battery lacked (beside CEM / DiD / CUPED / synthetic control).
    Instrument Z = deterministic hash coin per customer (outreach
    eligibility); treatment uptake T is simulated one-sided-noncompliant
    (70% takers under Z=1, 20% always-takers under Z=0, second hash);
    outcome Y = the customer's real order revenue in cents. The fixture
    assigns Z independently of Y, so the estimate self-audits near zero
    while the first stage (~50% compliance gap) is strongly identified.

    Exactness: LATE = (ȳ1-ȳ0)/(t̄1-t̄0) cross-multiplies to ONE integer
    fraction (s1·n0 - s0·n1)/(k1·n0 - k0·n1); Spark carries the ~1e20
    products in tight DECIMALs, DuckDB in HUGEINT, negatives route
    through abs so decimal floor-division matches truncating // (the
    fleiss_kappa discipline).

    Scale: one orders aggregate + one customer scan -> one 6-number
    scalar row; nothing downstream scales with the corpus.
    """
    from amorphous_mapreduce_spark.functions.hashing import hex_hash64
    from amorphous_mapreduce_spark.sources import load_table

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long")
        ).alias("cents")
    )
    hz = hex_hash64(F.concat(F.lit("ivz:"), F.col("c_custkey").cast("string")))
    hc = hex_hash64(F.concat(F.lit("ivc:"), F.col("c_custkey").cast("string")))
    units = (
        cust.select("c_custkey", (hz % 2).alias("z"), (hc % 10).alias("hc"))
        .join(rev, cust.c_custkey == rev.o_custkey, "left")
        .select(
            "z",
            F.when(
                (F.col("z") == 1) & (F.col("hc") < 7), 1
            )
            .when((F.col("z") == 0) & (F.col("hc") < 2), 1)
            .otherwise(0)
            .alias("t"),
            F.coalesce(F.col("cents"), F.lit(0).cast("long")).alias("y"),
        )
    )
    arms = units.agg(
        F.sum(F.when(F.col("z") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("z") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("z") == 1, F.col("t")).otherwise(0)).alias("k1"),
        F.sum(F.when(F.col("z") == 0, F.col("t")).otherwise(0)).alias("k0"),
        F.sum(F.when(F.col("z") == 1, F.col("y")).otherwise(0)).alias("s1"),
        F.sum(F.when(F.col("z") == 0, F.col("y")).otherwise(0)).alias("s0"),
    )
    return arms.select(
        "n1",
        "n0",
        "k1",
        "k0",
        F.col("s1").alias("sum1_cents"),
        F.col("s0").alias("sum0_cents"),
        F.expr("(1000000 * (k1 * n0 - k0 * n1)) div (n1 * n0)").alias(
            "first_stage_ppm"
        ),
        F.expr(
            "CAST(CASE WHEN CAST(s1 AS DECIMAL(18,0)) * n0"
            " - CAST(s0 AS DECIMAL(18,0)) * n1 >= 0 THEN"
            " ((CAST(s1 AS DECIMAL(18,0)) * n0"
            "   - CAST(s0 AS DECIMAL(18,0)) * n1) * 100"
            "  - pmod((CAST(s1 AS DECIMAL(18,0)) * n0"
            "          - CAST(s0 AS DECIMAL(18,0)) * n1) * 100,"
            "         CAST(k1 * n0 - k0 * n1 AS DECIMAL(18,0))))"
            " / CAST(k1 * n0 - k0 * n1 AS DECIMAL(18,0))"
            " ELSE"
            " -(((CAST(s0 AS DECIMAL(18,0)) * n1"
            "     - CAST(s1 AS DECIMAL(18,0)) * n0) * 100"
            "   - pmod((CAST(s0 AS DECIMAL(18,0)) * n1"
            "           - CAST(s1 AS DECIMAL(18,0)) * n0) * 100,"
            "          CAST(k1 * n0 - k0 * n1 AS DECIMAL(18,0))))"
            "  / CAST(k1 * n0 - k0 * n1 AS DECIMAL(18,0)))"
            " END AS BIGINT)"
        ).alias("late_centicents"),
    )
