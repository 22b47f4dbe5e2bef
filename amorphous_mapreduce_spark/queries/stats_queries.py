"""Statistical-rigour queries: near-dup split-leakage audit and a
deterministic Poisson bootstrap confidence interval.

Both are "is my pipeline statistically sound" checks a training-data
platform runs continuously:
- split_leakage_audit — decontaminate (queries/pipeline_queries.py)
  catches EXACT n-gram contamination between train and eval; this
  catches NEAR-duplicate leakage across a train/test split (the pairs
  the MinHash-LSH dedup path finds).
- bootstrap_revenue_ci — the Poisson bootstrap (the scalable bootstrap:
  each row draws an independent Poisson(1) replication count per
  resample, so no global resampling pass exists) made deterministic by
  driving the draw from the portable 60-bit MD5 hash against integer
  CDF thresholds.

Oracle notes:
- Poisson thresholds are precomputed integer literals
  (floor(cdf_k * (2^31-1))) — the comparison u < t_k is pure int64 on
  both engines; no float CDF evaluation at query time.
- resample means accumulate in DECIMAL (CLAUDE.md convention 1);
  SUM(int) casts back from HUGEINT before the double division.
- the 2.5%/97.5% quantiles over the 100 resample means use the shared
  interpolated-percentile formula (parity proven by price_percentiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.hashing import hex_hash64
from amorphous_mapreduce_spark.operators.dedup import minhash_lsh_pairs
from amorphous_mapreduce_spark.queries.dedup_queries import SHINGLES_CTE
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

_SPLIT_HASH = (
    "CAST('0x' || substr(md5('split:' || CAST(id AS VARCHAR)), 1, 15) AS BIGINT)"
)

LEAKAGE_ORACLE = (
    "WITH "
    + SHINGLES_CTE
    + """
, minhash AS (
    SELECT s.id, h.range AS hid,
           MIN(((s.sh % 2147483647) * (h.range * 2 + 1) + h.range * 12345)
               % 2147483647) AS mh
    FROM shingles s, range(16) h
    GROUP BY s.id, h.range
), bands AS (
    SELECT id, hid // 4 AS band, string_agg(mh, '-' ORDER BY hid) AS sig
    FROM minhash GROUP BY id, hid // 4
), pairs AS (
    SELECT DISTINCT a.id AS qid, b.id AS nid
    FROM bands a JOIN bands b USING (band, sig)
    WHERE a.id < b.id
), split AS (
    SELECT doc_id AS id,
           CASE WHEN """
    + _SPLIT_HASH
    + """ % 10 >= 8 THEN 1 ELSE 0 END AS is_test
    FROM documents
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(CASE WHEN sq.is_test <> sn.is_test THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cross_split,
       CAST(CAST(SUM(CASE WHEN sq.is_test <> sn.is_test THEN 1 ELSE 0 END)
                 AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS leak_share
FROM pairs
JOIN split sq ON sq.id = qid
JOIN split sn ON sn.id = nid
"""
)


@register("split_leakage_audit", LEAKAGE_ORACLE)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate leakage across a deterministic 80/20 train/test
    split: MinHash-LSH near-dup pairs whose endpoints land on opposite
    sides of the split are eval contamination that exact-match
    decontamination cannot see. Reuses the banded LSH pair generation
    (sub-quadratic, bucketed) + two broadcast-able split joins."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, num_hashes=16, band_bits=4)
    split_hash = hex_hash64(F.concat(F.lit("split:"), F.col("doc_id").cast("string")))
    split = docs.select(
        F.col("doc_id").alias("id"),
        F.when(split_hash % 10 >= 8, 1).otherwise(0).alias("is_test"),
    )
    sq = split.select(F.col("id").alias("qid"), F.col("is_test").alias("q_test"))
    sn = split.select(F.col("id").alias("nid"), F.col("is_test").alias("n_test"))
    joined = pairs.join(F.broadcast(sq), "qid").join(F.broadcast(sn), "nid")
    cross = F.when(F.col("q_test") != F.col("n_test"), 1).otherwise(0)
    return joined.agg(
        F.count("*").alias("n_pairs"),
        F.sum(cross).alias("n_cross_split"),
        (F.sum(cross).cast("double") / F.count("*").cast("double")).alias(
            "leak_share"
        ),
    )


# floor(cdf_k(Poisson(1)) * (2^31 - 1)) for k = 0..6; k = 7 is the tail.
# The uniform driving each draw lives in [0, 2^31-1): ONE md5 per row,
# then per-resample affine mixes (h*(2b+1) + b*12345) mod (2^31-1) — the
# same one-digest/many-functions trick as the MinHash family; 2^31-1 is
# prime, so every odd multiplier is invertible and each resample's draw
# stays exactly uniform. (Draws across resamples of one row are affine
# images of one uniform — each resample's Poisson marginal is exact,
# which is what the bootstrap needs; this trades a negligible cross-
# resample correlation for 100x fewer digest evaluations.)
_POIS_P = 2147483647
_POIS_T = [
    790015083,
    1580030167,
    1975037709,
    2106706890,
    2139624185,
    2146207644,
    2147304887,
]


def _pois_case(u: str) -> str:
    branches = " ".join(f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_T))
    return f"CASE {branches} ELSE 7 END"


_BS_U = f"((hp * (b * 2 + 1)) + b * 12345) % {_POIS_P}"

BOOTSTRAP_ORACLE = f"""
WITH hashed AS (
    SELECT o_totalprice,
           CAST('0x' || substr(md5('bs:' || CAST(o_orderkey AS VARCHAR)), 1, 15)
                AS BIGINT) % {_POIS_P} AS hp
    FROM orders
), draws AS (
    SELECT h.range AS b, o_totalprice,
           {_pois_case(_BS_U.replace('+ b *', '+ h.range *').replace('(b * 2 + 1)', '(h.range * 2 + 1)'))} AS k
    FROM hashed, range(100) h
), means AS (
    -- scaled-BIGINT two-step on the decimal sums: past 2^52 scaled
    -- units (sf1) DuckDB's decimal->double cast double-rounds
    SELECT b,
           (CAST(CAST(SUM(CAST(k AS DECIMAL(4,0))
                          * CAST(o_totalprice AS DECIMAL(18,6)))
                      * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0)
               / CAST(CAST(SUM(k) AS BIGINT) AS DOUBLE) AS mean_b
    FROM draws GROUP BY b
), point AS (
    SELECT (CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                      * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0)
               / COUNT(*) AS mean_price
    FROM orders
)
SELECT point.mean_price AS mean_price,
       quantile_cont(mean_b, 0.025) AS ci_lo,
       quantile_cont(mean_b, 0.975) AS ci_hi,
       COUNT(*) AS n_resamples
FROM means CROSS JOIN point
GROUP BY point.mean_price
"""


@register("bootstrap_revenue_ci", BOOTSTRAP_ORACLE)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI for mean order value, 100 resamples.

    The Poisson bootstrap is the bootstrap that scales: each row draws
    its per-resample replication count independently (Poisson(1)), so
    resampling is a stateless per-row explode — no global sampling
    pass, no coordination. One MD5 digest per row drives all 100 draws
    via prime-modulus affine mixing against integer CDF thresholds, so
    both engines replicate the identical resamples; means accumulate in
    decimal; the final quantile runs over the 100-row resample frame
    (constant size, not data-bound). The repartition pins the digest
    below the explode (CLAUDE.md: projection collapse would otherwise
    re-evaluate it per exploded row)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    hp = hex_hash64(
        F.concat(F.lit("bs:"), F.col("o_orderkey").cast("string"))
    ) % F.lit(_POIS_P)
    nparts = int(
        orders.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    hashed = orders.select("o_totalprice", hp.alias("hp")).repartition(nparts)
    rows = hashed.select(
        "o_totalprice",
        "hp",
        F.explode(F.sequence(F.lit(0), F.lit(99))).alias("b"),
    )
    u = (F.col("hp") * (F.col("b") * 2 + 1) + F.col("b") * 12345) % F.lit(_POIS_P)
    k = F.lit(7)
    for kk in range(6, -1, -1):
        k = F.when(u < F.lit(_POIS_T[kk]), F.lit(kk)).otherwise(k)
    draws = rows.select("b", "o_totalprice", k.alias("k"))
    # scaled-BIGINT two-step (see oracle note): identical rounding
    # sequence on both engines past 2^52 scaled units
    means = draws.groupBy("b").agg(
        (
            (
                (
                    F.sum(
                        F.col("k").cast("decimal(4,0)")
                        * F.col("o_totalprice").cast("decimal(18,6)")
                    )
                    * F.lit(1_000_000)
                )
                .cast("long")
                .cast("double")
                / F.lit(1_000_000.0)
            )
            / F.sum("k").cast("double")
        ).alias("mean_b")
    )
    point = orders.agg(
        (
            (
                (
                    F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                    * F.lit(1_000_000)
                )
                .cast("long")
                .cast("double")
                / F.lit(1_000_000.0)
            )
            / F.count("*")
        ).alias("mean_price")
    )
    return (
        means.crossJoin(F.broadcast(point))
        .groupBy("mean_price")
        .agg(
            F.percentile("mean_b", 0.025).alias("ci_lo"),
            F.percentile("mean_b", 0.975).alias("ci_hi"),
            F.count("*").alias("n_resamples"),
        )
        .select("mean_price", "ci_lo", "ci_hi", "n_resamples")
    )


# --- Welch A/B test ---------------------------------------------------------

# Deterministic 50/50 assignment by customer hash; metric = order value
# in integer cents. Sufficient statistics (n, S, Q) accumulate in
# DECIMAL(38,0) (exact, mergeable, scale-proof); the final Welch t² and
# df are ONE fixed double expression over identical exact inputs — the
# nation_revenue_trend pattern. At the test SFs the stats fit BIGINT, so
# both engines cast the same exact integers to double (correctly rounded
# int64->double on both) before the shared formula.
_AB_ARM = (
    "CAST('0x' || substr(md5('ab_' || CAST(o_custkey AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 2"
)

AB_WELCH_ORACLE = f"""
WITH cents AS (
    SELECT {_AB_ARM} AS arm,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x
    FROM orders
),
stats AS (
    SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           CAST(SUM(CAST(x AS DECIMAL(12,0)) * CAST(x AS DECIMAL(12,0)))
               AS DECIMAL(38,0)) AS q
    FROM cents GROUP BY arm
),
ab AS (
    SELECT
        CAST(a.n AS DOUBLE) AS na, CAST(a.s AS DOUBLE) AS sa,
        CAST(a.q AS DOUBLE) AS qa,
        CAST(b.n AS DOUBLE) AS nb, CAST(b.s AS DOUBLE) AS sb,
        CAST(b.q AS DOUBLE) AS qb,
        a.n AS n_a, b.n AS n_b, a.s AS sum_a_cents, b.s AS sum_b_cents
    FROM stats a JOIN stats b ON a.arm = 0 AND b.arm = 1
),
terms AS (
    SELECT n_a, n_b, sum_a_cents, sum_b_cents,
           sa / na - sb / nb AS mean_diff_cents,
           ((qa - sa * sa / na) / (na - 1)) / na AS va,
           ((qb - sb * sb / nb) / (nb - 1)) / nb AS vb,
           na, nb
    FROM ab
)
SELECT n_a, n_b, sum_a_cents, sum_b_cents,
       mean_diff_cents,
       (mean_diff_cents * mean_diff_cents) / (va + vb) AS t2,
       ((va + vb) * (va + vb))
           / (va * va / (na - 1) + vb * vb / (nb - 1)) AS welch_df,
       (mean_diff_cents * mean_diff_cents) / (va + vb) > 3.841458820694124
           AS significant_95
FROM terms
"""


@register("ab_test_welch", AB_WELCH_ORACLE)
def q_ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance A/B test on order value between two
    deterministic hash-assigned customer cohorts: exact sufficient
    statistics (n, Σx, Σx² in integer cents, DECIMAL-accumulated), then
    t², Welch–Satterthwaite df, and the 95% verdict as one fixed double
    expression — the experimentation primitive every product analytics
    stack runs, distributed as two map-side-combined aggregates.

    Scale: per-arm state is three numbers — mergeable across any number
    of partitions, files, or days; nothing downstream of the scan is
    bigger than two rows. The double-precision envelope (Σx² up to 2^53
    exact) is documented; beyond it the DECIMAL stats still merge
    exactly and only the final expression sees rounding."""
    orders = load_table(spark, sf_dir, "orders")
    arm = F.pmod(
        hex_hash64(F.concat(F.lit("ab_"), F.col("o_custkey").cast("string"))),
        F.lit(2),
    )
    cents = orders.select(
        arm.alias("arm"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    stats = cents.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("long").alias("s"),
        # Σx² exceeds int64 past sf0.01 — stays DECIMAL end to end; the
        # decimal(38,0)->double cast is correctly rounded on BOTH engines
        # (verified bit-for-bit incl. 2^65+1), so the double formula
        # below sees identical inputs
        F.sum(F.col("x").cast("decimal(12,0)") * F.col("x").cast("decimal(12,0)"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    a = stats.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("s").alias("s_a"), F.col("q").alias("q_a")
    )
    b = stats.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("s").alias("s_b"), F.col("q").alias("q_b")
    )
    ab = a.crossJoin(b)
    na, sa, qa = [F.col(c).cast("double") for c in ("n_a", "s_a", "q_a")]
    nb, sb, qb = [F.col(c).cast("double") for c in ("n_b", "s_b", "q_b")]
    mean_diff = sa / na - sb / nb
    va = ((qa - sa * sa / na) / (na - 1)) / na
    vb = ((qb - sb * sb / nb) / (nb - 1)) / nb
    t2 = (mean_diff * mean_diff) / (va + vb)
    return ab.select(
        "n_a",
        "n_b",
        F.col("s_a").alias("sum_a_cents"),
        F.col("s_b").alias("sum_b_cents"),
        mean_diff.alias("mean_diff_cents"),
        t2.alias("t2"),
        (
            ((va + vb) * (va + vb))
            / (va * va / (na - 1) + vb * vb / (nb - 1))
        ).alias("welch_df"),
        (t2 > F.lit(3.841458820694124)).alias("significant_95"),
    )


# --- exact weighted median ---------------------------------------------------

WMEDIAN_ORACLE = """
WITH li AS (
    SELECT n.n_name AS nation,
           CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS price_cents,
           CAST(l.l_quantity AS BIGINT) AS wt,
           l.l_orderkey, l.l_linenumber
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
),
cum AS (
    SELECT nation, price_cents, wt,
           SUM(wt) OVER (PARTITION BY nation
                         ORDER BY price_cents, l_orderkey, l_linenumber
                         ROWS UNBOUNDED PRECEDING) AS w_cum,
           SUM(wt) OVER (PARTITION BY nation) AS w_total
    FROM li
)
SELECT nation,
       CAST(MAX(w_total) AS BIGINT) AS total_weight,
       CAST(MIN(CASE WHEN 2 * w_cum >= w_total THEN price_cents END)
            AS BIGINT) AS weighted_median_cents
FROM cum
GROUP BY nation
"""


@register("weighted_median_price", WMEDIAN_ORACLE)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median line price per supplier nation —
    the robust central-price statistic where each line counts by units
    shipped, not once (lower weighted median: first price whose
    cumulative weight reaches half the total; deterministic under a
    (price, orderkey, linenumber) total order).

    Scale: the cumulative weight is a window KEYED by nation (the
    prefix-sum-per-group shape, never a global sort); the median pick
    is a conditional MIN in the same keyed aggregate. Dims broadcast
    onto the fact scan."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"),
        F.col("n_name").alias("nation"),
    )
    rows = (
        li.select(
            F.col("l_suppkey").alias("s_suppkey"),
            (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("price_cents"),
            F.col("l_quantity").cast("long").alias("wt"),
            "l_orderkey",
            "l_linenumber",
        )
        .join(F.broadcast(sup), "s_suppkey")
        .join(F.broadcast(nat), "s_nationkey")
    )
    w = Window.partitionBy("nation").orderBy(
        "price_cents", "l_orderkey", "l_linenumber"
    )
    cum = rows.select(
        "nation",
        "price_cents",
        "wt",
        F.sum("wt")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("w_cum"),
        F.sum("wt").over(Window.partitionBy("nation")).alias("w_total"),
    )
    return cum.groupBy("nation").agg(
        F.max("w_total").alias("total_weight"),
        F.min(
            F.when(2 * F.col("w_cum") >= F.col("w_total"), F.col("price_cents"))
        ).alias("weighted_median_cents"),
    )


# --- Theil-Sen robust trend --------------------------------------------------

THEIL_SEN_ORACLE = """
WITH daily AS (
    SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY event_type, day
),
pairs AS (
    SELECT a.event_type,
           a.day AS d1, b.day AS d2,
           CAST(b.c - a.c AS DOUBLE) / CAST(b.day - a.day AS DOUBLE) AS slope
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.day < b.day
),
ranked AS (
    SELECT event_type, slope,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY slope, d1, d2) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
    FROM pairs
)
SELECT r.event_type,
       CAST(d.n_days AS BIGINT) AS n_days,
       CAST(MAX(r.n_pairs) AS BIGINT) AS n_pairs,
       MAX(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope END) AS ts_slope
FROM ranked r
JOIN (SELECT event_type, COUNT(*) AS n_days FROM daily GROUP BY event_type) d
  ON r.event_type = d.event_type
GROUP BY r.event_type, d.n_days
"""


@register("theil_sen_trend", THEIL_SEN_ORACLE)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend of daily event volume per event type: the
    median of all pairwise day-slopes — the outlier-resistant slope
    estimator (a single anomalous day moves OLS but not Theil-Sen).
    Lower median with a (slope, d1, d2) total order; slopes are single
    IEEE divisions of exact integer deltas, so both engines sort and
    pick identically.

    Scale: the pair join runs on the DAILY aggregate — cardinality
    bounded by the calendar domain (days² per type), never by event
    volume; the events themselves flow through one hash aggregate.
    The rank window partitions by event type over those bounded pair
    frames."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("c"))
    )
    # pair join + per-type day counts both re-read daily: persist the
    # calendar-bounded aggregate (CLAUDE.md self-join gotcha)
    daily = daily.persist()
    a = daily.select("event_type", F.col("day").alias("d1"), F.col("c").alias("c1"))
    b = daily.select("event_type", F.col("day").alias("d2"), F.col("c").alias("c2"))
    pairs = a.join(b, "event_type").filter(F.col("d1") < F.col("d2")).select(
        "event_type",
        "d1",
        "d2",
        (
            (F.col("c2") - F.col("c1")).cast("double")
            / (F.col("d2") - F.col("d1")).cast("double")
        ).alias("slope"),
    )
    wr = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    wn = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(wn).alias("n_pairs"),
    )
    n_days = daily.groupBy("event_type").agg(F.count("*").alias("n_days"))
    return (
        ranked.join(F.broadcast(n_days), "event_type")
        .groupBy("event_type", "n_days")
        .agg(
            F.max("n_pairs").alias("n_pairs"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n_pairs + 1) div 2"),
                    F.col("slope"),
                )
            ).alias("ts_slope"),
        )
        .select("event_type", "n_days", "n_pairs", "ts_slope")
    )


# --- Neyman sampling allocation ---------------------------------------------

NEYMAN_BUDGET = 1000

NEYMAN_ORACLE = f"""
WITH stats AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_sq
    FROM documents GROUP BY source
),
scored AS (
    SELECT source, n_docs, sum_chars, sum_sq,
           CAST(n_docs AS DOUBLE)
           * sqrt((CAST(n_docs AS DOUBLE) * CAST(sum_sq AS DOUBLE)
                   - CAST(sum_chars AS DOUBLE) * CAST(sum_chars AS DOUBLE))
                  / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)))
               AS weight
    FROM stats
),
quant AS (
    SELECT source, n_docs, sum_chars, sum_sq,
           CAST(FLOOR(weight * 1048576) AS BIGINT) AS wq
    FROM scored
),
tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS wq_total FROM quant)
SELECT source, n_docs, sum_chars, sum_sq,
       CAST(wq AS DOUBLE) / CAST(t.wq_total AS DOUBLE) AS alloc_share,
       CAST(FLOOR({NEYMAN_BUDGET} * (CAST(wq AS DOUBLE)
                                     / CAST(t.wq_total AS DOUBLE)))
            AS BIGINT) AS n_alloc
FROM quant CROSS JOIN tot t
"""


@register("neyman_allocation", NEYMAN_ORACLE)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal audit-sample allocation across sources: a fixed
    review budget split proportionally to N_h * sigma_h (stratum size x
    length std-dev) — the survey-sampling design that minimizes
    estimator variance, run before any human-eval pass over a corpus.

    Exactness: sufficient stats are integer sums of n_chars; sigma is
    one IEEE sqrt of a fixed double expression (sqrt is correctly
    rounded — same trust as negative_sampling_weights' f^0.75); FLOOR
    before the BIGINT cast avoids DuckDB's round-on-cast. One hash
    aggregate + a 1-row total crossed back."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sum_sq"),
    )
    nd = F.col("n_docs").cast("double")
    weight = nd * F.sqrt(
        (
            nd * F.col("sum_sq").cast("double")
            - F.col("sum_chars").cast("double")
            * F.col("sum_chars").cast("double")
        )
        / (nd * nd)
    )
    # per-stratum weights quantize to integers (floor * 2^20) before the
    # grand total: a float SUM's accumulation order differs between
    # engines; the integer total is order-free (measured 1-ulp drift)
    scored = stats.select(
        "source",
        "n_docs",
        "sum_chars",
        "sum_sq",
        F.floor(weight * F.lit(1 << 20)).cast("long").alias("wq"),
    )
    tot = scored.agg(F.sum("wq").alias("wq_total"))
    share = F.col("wq").cast("double") / F.col("wq_total").cast("double")
    return scored.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "sum_chars",
        "sum_sq",
        share.alias("alloc_share"),
        F.floor(F.lit(NEYMAN_BUDGET) * share).cast("long").alias("n_alloc"),
    )


# --- difference-in-differences estimator ------------------------------------

DID_SPLIT_DAY = 19738  # 2024-01-16, mid-span of the events fixture

DID_ORACLE = f"""
WITH ev AS (
    SELECT event_type,
           CAST(user_id % 2 AS INT) AS treat,
           CASE WHEN epoch_us(ts) // 86400000000 >= {DID_SPLIT_DAY}
                THEN 1 ELSE 0 END AS post,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
    FROM events
),
cells AS (
    SELECT event_type,
           CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
           CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tr,
           CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
           CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cr,
           CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_tp,
           CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_tr,
           CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_cp,
           CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_cr
    FROM ev GROUP BY event_type
)
SELECT event_type, n_tp, n_tr, n_cp, n_cr,
       CASE WHEN n_tp = 0 OR n_tr = 0 OR n_cp = 0 OR n_cr = 0 THEN NULL
            ELSE (CAST(s_tp AS DOUBLE) / CAST(n_tp AS DOUBLE)
                  - CAST(s_tr AS DOUBLE) / CAST(n_tr AS DOUBLE))
                 - (CAST(s_cp AS DOUBLE) / CAST(n_cp AS DOUBLE)
                    - CAST(s_cr AS DOUBLE) / CAST(n_cr AS DOUBLE))
       END AS did_cents
FROM cells
"""


@register("diff_in_diff_value", DID_ORACLE)
def q_diff_in_diff_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of per-event value per event
    type: (treated post - pre) - (control post - pre), with a synthetic
    mid-span exposure (odd user ids treated from 2024-01-16) — the
    quasi-experimental effect estimator run when randomized assignment
    isn't available. Cell sums are exact decimal cents; the four means
    and the DiD are fixed double expressions; empty cells NULL-guard
    the estimate (Spark ANSI raises on /0 where DuckDB returns NaN).

    Scale: ONE conditional-aggregation scan — eight CASE sums per
    event type, no joins, no windows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).cast("int").alias("treat"),
        F.when(
            (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("long")
            >= DID_SPLIT_DAY,
            1,
        )
        .otherwise(0)
        .alias("post"),
        (F.col("value").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("cents"),
    )

    def cell(t: int, p: int, col, zero):
        cond = (F.col("treat") == t) & (F.col("post") == p)
        return F.sum(F.when(cond, col).otherwise(zero))

    cells = ev.groupBy("event_type").agg(
        cell(1, 1, F.lit(1), F.lit(0)).alias("n_tp"),
        cell(1, 0, F.lit(1), F.lit(0)).alias("n_tr"),
        cell(0, 1, F.lit(1), F.lit(0)).alias("n_cp"),
        cell(0, 0, F.lit(1), F.lit(0)).alias("n_cr"),
        cell(1, 1, F.col("cents"), F.lit(0)).alias("s_tp"),
        cell(1, 0, F.col("cents"), F.lit(0)).alias("s_tr"),
        cell(0, 1, F.col("cents"), F.lit(0)).alias("s_cp"),
        cell(0, 0, F.col("cents"), F.lit(0)).alias("s_cr"),
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n).cast("double")
    nonempty = (
        (F.col("n_tp") != 0)
        & (F.col("n_tr") != 0)
        & (F.col("n_cp") != 0)
        & (F.col("n_cr") != 0)
    )
    return cells.select(
        "event_type",
        "n_tp",
        "n_tr",
        "n_cp",
        "n_cr",
        F.when(
            nonempty,
            (mean("s_tp", "n_tp") - mean("s_tr", "n_tr"))
            - (mean("s_cp", "n_cp") - mean("s_cr", "n_cr")),
        ).alias("did_cents"),
    )


# --- order-statistic confidence interval for the median ----------------------

MEDIAN_CI_ORACLE = """
WITH c AS (
    SELECT n.n_name AS nation,
           CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents,
           o.o_orderkey
    FROM orders o
    JOIN customer cu ON o.o_custkey = cu.c_custkey
    JOIN nation n ON cu.c_nationkey = n.n_nationkey
),
ranked AS (
    SELECT nation, cents,
           ROW_NUMBER() OVER (PARTITION BY nation
                              ORDER BY cents, o_orderkey) AS rn,
           COUNT(*) OVER (PARTITION BY nation) AS n
    FROM c
),
picks AS (
    SELECT nation, n,
           (n + 1) // 2 AS r_med,
           GREATEST(CAST(1 AS BIGINT),
                    CAST(FLOOR(CAST(n AS DOUBLE) / 2
                               - sqrt(CAST(n AS DOUBLE))) AS BIGINT)) AS r_lo,
           LEAST(n, CAST(CEIL(CAST(n AS DOUBLE) / 2 + 1
                              + sqrt(CAST(n AS DOUBLE))) AS BIGINT)) AS r_hi
    FROM (SELECT DISTINCT nation, n FROM ranked)
)
SELECT r.nation,
       CAST(MAX(r.n) AS BIGINT) AS n_orders,
       CAST(MAX(CASE WHEN rn = p.r_med THEN cents END) AS BIGINT)
           AS median_cents,
       CAST(MAX(CASE WHEN rn = p.r_lo THEN cents END) AS BIGINT)
           AS ci_lo_cents,
       CAST(MAX(CASE WHEN rn = p.r_hi THEN cents END) AS BIGINT)
           AS ci_hi_cents
FROM ranked r JOIN picks p ON r.nation = p.nation
GROUP BY r.nation
"""


@register("median_order_value_ci", MEDIAN_CI_ORACLE)
def q_median_order_value_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free ~95% confidence interval for the median order
    value per customer nation, via ORDER STATISTICS: the CI bounds are
    the values at ranks n/2 ± sqrt(n) (the binomial normal
    approximation) — no parametric assumption, and because the bounds
    are exact rank picks they hash-match cross-engine (sqrt is one
    correctly-rounded IEEE op; FLOOR/CEIL before the integer cast).

    Scale: rank and count ride one window KEYED by nation; the three
    picks are conditional MAXes in the same keyed aggregate."""
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    na = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    c = (
        o.select(
            "o_custkey",
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .join(F.broadcast(cu), "o_custkey")
        .join(F.broadcast(na), "c_nationkey")
    )
    w = Window.partitionBy("nation").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("nation")
    ranked = c.select(
        "nation",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    nd = F.col("n").cast("double")
    r_med = F.expr("(n + 1) div 2")
    r_lo = F.greatest(
        F.lit(1).cast("long"),
        F.floor(nd / 2 - F.sqrt(nd)).cast("long"),
    )
    r_hi = F.least(
        F.col("n"), F.ceil(nd / 2 + 1 + F.sqrt(nd)).cast("long")
    )
    return ranked.groupBy("nation").agg(
        F.max("n").alias("n_orders"),
        F.max(F.when(F.col("rn") == r_med, F.col("cents"))).alias(
            "median_cents"
        ),
        F.max(F.when(F.col("rn") == r_lo, F.col("cents"))).alias(
            "ci_lo_cents"
        ),
        F.max(F.when(F.col("rn") == r_hi, F.col("cents"))).alias(
            "ci_hi_cents"
        ),
    )


# --- Tukey-fence outlier scan -----------------------------------------------

TUKEY_ORACLE = """
WITH priced AS (
    SELECT p.p_brand AS brand,
           CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS cents,
           l.l_orderkey, l.l_linenumber
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
ranked AS (
    SELECT brand, cents,
           ROW_NUMBER() OVER (PARTITION BY brand
                              ORDER BY cents, l_orderkey, l_linenumber) AS rn,
           COUNT(*) OVER (PARTITION BY brand) AS n
    FROM priced
),
quarts AS (
    SELECT brand,
           CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS BIGINT)
               AS q1_cents,
           CAST(MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS BIGINT)
               AS q3_cents
    FROM ranked GROUP BY brand
)
SELECT p.brand, q.n, q.q1_cents, q.q3_cents,
       CAST(SUM(CASE WHEN 2 * p.cents < 2 * q.q1_cents
                          - 3 * (q.q3_cents - q.q1_cents)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_low_outliers,
       CAST(SUM(CASE WHEN 2 * p.cents > 2 * q.q3_cents
                          + 3 * (q.q3_cents - q.q1_cents)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers
FROM priced p JOIN quarts q ON p.brand = q.brand
GROUP BY p.brand, q.n, q.q1_cents, q.q3_cents
"""


@register("tukey_price_outliers", TUKEY_ORACLE)
def q_tukey_price_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per brand: line prices beyond
    Q1 - 1.5*IQR / Q3 + 1.5*IQR — the boxplot data-cleaning rule.
    Quartiles are EXACT rank picks (type-1 quantiles at ceil(n/4) /
    ceil(3n/4) under a total order), and the fences compare 2x-scaled
    integers so the half-cent 1.5*IQR never leaves integer arithmetic.

    Scale: rank/count ride one window keyed by brand; the quartile
    frame (one row per brand) broadcasts back onto the priced rows for
    the fence count — two keyed aggregates, one dim broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    priced = (
        li.select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
            "l_orderkey",
            "l_linenumber",
        )
        .join(F.broadcast(part), "p_partkey")
        .select(F.col("p_brand").alias("brand"), "cents", "l_orderkey", "l_linenumber")
        .persist()
    )
    w = Window.partitionBy("brand").orderBy("cents", "l_orderkey", "l_linenumber")
    wn = Window.partitionBy("brand")
    ranked = priced.select(
        "brand",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    quarts = ranked.groupBy("brand").agg(
        F.max("n").alias("n"),
        F.max(
            F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("cents"))
        ).alias("q1_cents"),
        F.max(
            F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("cents"))
        ).alias("q3_cents"),
    )
    iqr = F.col("q3_cents") - F.col("q1_cents")
    low = F.sum(
        F.when(2 * F.col("cents") < 2 * F.col("q1_cents") - 3 * iqr, 1).otherwise(0)
    )
    high = F.sum(
        F.when(2 * F.col("cents") > 2 * F.col("q3_cents") + 3 * iqr, 1).otherwise(0)
    )
    return (
        priced.join(F.broadcast(quarts), "brand")
        .groupBy("brand", "n", "q1_cents", "q3_cents")
        .agg(low.alias("n_low_outliers"), high.alias("n_high_outliers"))
    )


# --- exact pairwise correlation matrix ---------------------------------------

# hi/lo int64 split of a DECIMAL(38,0) moment (the rolling_correlation_14d
# workaround for DuckDB's int128 -> double 1-ulp mis-round)
_CM_SPLIT = 1048576


def _cm_split_sql(expr: str, name: str) -> str:
    return (
        f"CAST(({expr}) // {_CM_SPLIT} AS BIGINT) AS {name}_hi,\n"
        f"           CAST(({expr}) % {_CM_SPLIT} AS BIGINT) AS {name}_lo"
    )


def _cm_join_sql(name: str) -> str:
    return (
        f"(CAST({name}_hi AS DOUBLE) * {_CM_SPLIT}.0"
        f" + CAST({name}_lo AS DOUBLE))"
    )


def _cm_corr_sql(x: str, y: str, xy: str) -> str:
    n = "CAST(n AS DOUBLE)"
    sx, sy = f"CAST(s_{x} AS DOUBLE)", f"CAST(s_{y} AS DOUBLE)"
    sxx, syy = _cm_join_sql(f"q_{x}"), _cm_join_sql(f"q_{y}")
    sxy = _cm_join_sql(f"x_{xy}")
    return (
        f"({n} * {sxy} - {sx} * {sy})"
        f" / (sqrt({n} * {sxx} - {sx} * {sx})"
        f" * sqrt({n} * {syy} - {sy} * {sy}))"
    )


CORRMAT_ORACLE = f"""
WITH v AS (
    SELECT CAST(l_quantity AS BIGINT) AS q,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS p,
           CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS d
    FROM lineitem
),
m AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(q) AS BIGINT) AS s_q,
           CAST(SUM(p) AS BIGINT) AS s_p,
           CAST(SUM(d) AS BIGINT) AS s_d,
           {_cm_split_sql("SUM(CAST(q AS HUGEINT) * q)", "q_q")},
           {_cm_split_sql("SUM(CAST(p AS HUGEINT) * p)", "q_p")},
           {_cm_split_sql("SUM(CAST(d AS HUGEINT) * d)", "q_d")},
           {_cm_split_sql("SUM(CAST(q AS HUGEINT) * p)", "x_qp")},
           {_cm_split_sql("SUM(CAST(q AS HUGEINT) * d)", "x_qd")},
           {_cm_split_sql("SUM(CAST(p AS HUGEINT) * d)", "x_pd")}
    FROM v
)
SELECT n,
       {_cm_corr_sql("q", "p", "qp")} AS r_qty_price,
       {_cm_corr_sql("q", "d", "qd")} AS r_qty_discount,
       {_cm_corr_sql("p", "d", "pd")} AS r_price_discount
FROM m
"""


@register("lineitem_correlation_matrix", CORRMAT_ORACLE)
def q_lineitem_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise Pearson correlation matrix over lineitem's three
    numeric measures (quantity, price cents, discount points) — the
    data-profiling pass feature stores run before modeling. All
    sufficient statistics are ONE aggregate: first moments in BIGINT,
    second/cross moments in DECIMAL(38,0) carried through the hi/lo
    int64 split (DuckDB casts int128 past 2^63 to double with a 1-ulp
    error; split halves are exact), then each r is a fixed
    IEEE expression.

    Scale: a single map-side-combined aggregate; no joins, no windows."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("p"),
        (F.col("l_discount").cast("decimal(4,2)") * 100)
        .cast("long")
        .alias("d"),
    )

    def mom(a: str, b: str):
        return F.sum(
            F.col(a).cast("decimal(19,0)") * F.col(b)
        ).cast("decimal(38,0)")

    def split(c, name):
        return [
            ((c - F.pmod(c, F.lit(_CM_SPLIT))) / F.lit(_CM_SPLIT))
            .cast("long")
            .alias(f"{name}_hi"),
            F.pmod(c, F.lit(_CM_SPLIT)).cast("long").alias(f"{name}_lo"),
        ]

    m = v.agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s_q"),
        F.sum("p").alias("s_p"),
        F.sum("d").alias("s_d"),
        mom("q", "q").alias("_qq"),
        mom("p", "p").alias("_qp2"),
        mom("d", "d").alias("_qd2"),
        mom("q", "p").alias("_xqp"),
        mom("q", "d").alias("_xqd"),
        mom("p", "d").alias("_xpd"),
    ).select(
        "n",
        "s_q",
        "s_p",
        "s_d",
        *split(F.col("_qq"), "q_q"),
        *split(F.col("_qp2"), "q_p"),
        *split(F.col("_qd2"), "q_d"),
        *split(F.col("_xqp"), "x_qp"),
        *split(F.col("_xqd"), "x_qd"),
        *split(F.col("_xpd"), "x_pd"),
    )

    def join_d(name):
        return (
            F.col(f"{name}_hi").cast("double") * F.lit(float(_CM_SPLIT))
            + F.col(f"{name}_lo").cast("double")
        )

    def corr(x, y, xy):
        n = F.col("n").cast("double")
        sx, sy = F.col(f"s_{x}").cast("double"), F.col(f"s_{y}").cast("double")
        return (n * join_d(f"x_{xy}") - sx * sy) / (
            F.sqrt(n * join_d(f"q_{x}") - sx * sx)
            * F.sqrt(n * join_d(f"q_{y}") - sy * sy)
        )

    return m.select(
        "n",
        corr("q", "p", "qp").alias("r_qty_price"),
        corr("q", "d", "qd").alias("r_qty_discount"),
        corr("p", "d", "pd").alias("r_price_discount"),
    )


# --- Cramér's V categorical association --------------------------------------

CRAMER_ORACLE = """
WITH joined AS (
    SELECT l.l_returnflag AS rf, o.o_orderpriority AS pr
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
cells AS (
    SELECT rf, pr, CAST(COUNT(*) AS BIGINT) AS o FROM joined GROUP BY rf, pr
),
rows_ AS (SELECT rf, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY rf),
cols_ AS (SELECT pr, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY pr),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT rf) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT pr) AS BIGINT) AS n_cols
        FROM cells),
terms AS (
    SELECT CAST(FLOOR(
               (CAST(o * n - r * c AS DOUBLE)
                * CAST(o * n - r * c AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
               * 1048576) AS BIGINT) AS term_q,
           n, n_rows, n_cols
    FROM cells JOIN rows_ USING (rf) JOIN cols_ USING (pr) CROSS JOIN tot
)
SELECT MAX(n) AS n,
       MAX(n_rows) AS n_levels_a,
       MAX(n_cols) AS n_levels_b,
       CAST(SUM(term_q) AS BIGINT) AS chi2_scaled,
       sqrt((CAST(SUM(term_q) AS DOUBLE) / 1048576.0)
            / (CAST(MAX(n) AS DOUBLE)
               * CAST(LEAST(MAX(n_rows), MAX(n_cols)) - 1 AS DOUBLE)))
           AS cramers_v
FROM terms
"""


@register("cramers_v_association", CRAMER_ORACLE)
def q_cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V between return flag and order priority — the
    normalized categorical-association measure ([0,1]) behind every
    'are these two dimensions related' profiling question, where
    chi-square alone grows with n. Per-cell chi-square terms use the
    cross-multiplied integer numerator (o*n - r*c)², computed in
    double while still exact and floor-QUANTIZED to 2^-20 before the
    cross-cell sum (float-sum order independence, same discipline as
    neyman_allocation); V is one sqrt of exact-int ratios.

    Scale: one fact-fact equi-join + a contingency-cell aggregate
    bounded by the 5x5 label alphabets; margins re-aggregate the cell
    frame; the 1-row total crosses back (standard pattern)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), F.col("l_returnflag").alias("rf")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("pr")
    )
    cells = (
        li.join(o, "o_orderkey")
        .groupBy("rf", "pr")
        .agg(F.count("*").alias("o"))
        .persist()
    )
    rows_ = cells.groupBy("rf").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("pr").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct("rf").alias("n_rows"),
        F.countDistinct("pr").alias("n_cols"),
    )
    num = (F.col("o") * F.col("n") - F.col("r") * F.col("c")).cast("double")
    term_q = F.floor(
        num
        * num
        / (
            F.col("n").cast("double")
            * F.col("r").cast("double")
            * F.col("c").cast("double")
        )
        * F.lit(1048576)
    ).cast("long")
    terms = (
        cells.join(F.broadcast(rows_), "rf")
        .join(F.broadcast(cols_), "pr")
        .crossJoin(F.broadcast(tot))
        .select(term_q.alias("term_q"), "n", "n_rows", "n_cols")
    )
    chi2 = F.sum("term_q")
    return terms.agg(
        F.max("n").alias("n"),
        F.max("n_rows").alias("n_levels_a"),
        F.max("n_cols").alias("n_levels_b"),
        chi2.alias("chi2_scaled"),
        F.sqrt(
            (chi2.cast("double") / F.lit(1048576.0))
            / (
                F.max("n").cast("double")
                * (F.least(F.max("n_rows"), F.max("n_cols")) - 1).cast(
                    "double"
                )
            )
        ).alias("cramers_v"),
    )


# --- count dispersion index (Poisson overdispersion check) -------------------

DISPERSION_ORACLE = """
WITH daily AS (
    SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           CAST(COUNT(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(c) AS BIGINT) AS total,
       CAST(SUM(c * c) AS BIGINT) AS sum_sq,
       -- dispersion D = var/mean = (n·Σc² − (Σc)²) / ((n−1)·Σc)
       CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
       / (CAST(COUNT(*) - 1 AS DOUBLE) * CAST(SUM(c) AS DOUBLE))
           AS dispersion_index,
       CAST(CASE WHEN COUNT(*) * SUM(c * c) - SUM(c) * SUM(c)
                      > (COUNT(*) - 1) * SUM(c)
                 THEN 1 ELSE 0 END AS BIGINT) AS overdispersed
FROM daily
GROUP BY event_type
"""


@register("count_dispersion_index", DISPERSION_ORACLE)
def q_count_dispersion_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson overdispersion check on daily event counts: the
    dispersion index D = sample-variance / mean per event type, with
    an integer cross-multiplied overdispersion flag (D > 1 tested as
    n·Σc² − (Σc)² > (n−1)·Σc — no division in the verdict) — the
    diagnostic that decides Poisson vs negative-binomial assumptions
    for volume forecasting and anomaly thresholds.

    Scale: one daily keyed aggregate + a per-type rollup of exact
    integer moments; D is a fixed double expression."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000))
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("c"))
    )
    n = F.count("*")
    s1 = F.sum("c")
    s2 = F.sum(F.col("c") * F.col("c"))
    return daily.groupBy("event_type").agg(
        n.alias("n_days"),
        s1.alias("total"),
        s2.alias("sum_sq"),
        (
            (n * s2 - s1 * s1).cast("double")
            / ((n - 1).cast("double") * s1.cast("double"))
        ).alias("dispersion_index"),
        F.when(n * s2 - s1 * s1 > (n - 1) * s1, 1)
        .otherwise(0)
        .cast("long")
        .alias("overdispersed"),
    )


# --- Wilson score interval for return rates ----------------------------------

_WILSON_Z2 = 3.8416  # z² for z = 1.96 (95%), exact decimal literal

WILSON_ORACLE = f"""
WITH b AS (
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS k
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
)
SELECT brand, n, k,
       CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       ((CAST(k AS DOUBLE) + {_WILSON_Z2} / 2.0)
        - sqrt({_WILSON_Z2})
          * sqrt((CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                 / CAST(n AS DOUBLE) + {_WILSON_Z2} / 4.0))
       / (CAST(n AS DOUBLE) + {_WILSON_Z2}) AS wilson_lo,
       ((CAST(k AS DOUBLE) + {_WILSON_Z2} / 2.0)
        + sqrt({_WILSON_Z2})
          * sqrt((CAST(k AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
                 / CAST(n AS DOUBLE) + {_WILSON_Z2} / 4.0))
       / (CAST(n AS DOUBLE) + {_WILSON_Z2}) AS wilson_hi
FROM b
"""


@register("return_rate_wilson_ci", WILSON_ORACLE)
def q_return_rate_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score 95% interval for each brand's return rate — the
    binomial CI that behaves at small n and extreme rates where the
    normal approximation fails (the rate-CI sibling of
    median_order_value_ci's order-statistic interval). Built from
    exact integer (k, n) with a FIXED IEEE expression tree — two
    correctly-rounded sqrts, identical literals both engines
    (z² = 3.8416 as one decimal literal; no libm beyond sqrt).

    Scale: one dim-broadcast join + a per-brand aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    b = (
        li.select(
            "l_partkey",
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
        .join(F.broadcast(part), "l_partkey")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count("*").alias("n"), F.sum("y").alias("k"))
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    z2 = F.lit(_WILSON_Z2)
    center = kd + z2 / F.lit(2.0)
    spread = F.sqrt(z2) * F.sqrt(
        (kd * (nd - kd)) / nd + z2 / F.lit(4.0)
    )
    denom = nd + z2
    return b.select(
        "brand",
        "n",
        "k",
        (kd / nd).alias("rate"),
        ((center - spread) / denom).alias("wilson_lo"),
        ((center + spread) / denom).alias("wilson_hi"),
    )


# --- one-way ANOVA across brands --------------------------------------------

# Cross-group float sums are forbidden (CLAUDE.md: 1-ulp drift measured
# in neyman_allocation) — the per-group ANOVA term S_g²/n_g is therefore
# floor-quantized to an exact integer (Spark `div` == DuckDB `//`, both
# truncate toward zero) before ANY cross-group sum. Quantum is 2^20
# cents² end to end: S²/n at sf0.1 already exceeds int64 in raw cents²
# (measured: T²//N = 1.68e19 wrapped Spark's bigint `div`), while in
# 2^20-units every divided term stays < ~1e15 through sf1000. Relative
# truncation error is ≤ k quanta on sums ≥ 1e8 quanta — identical on
# both engines, so the final double formula sees identical exact ints
# (plain BIGINT->double casts, correctly rounded everywhere).
ANOVA_ORACLE = """
WITH cells AS (
    SELECT p.p_brand AS brand,
           CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
               AS x
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
grp AS (
    SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s,
           SUM(CAST(x AS HUGEINT) * x) AS q
    FROM cells GROUP BY brand
),
terms AS (
    SELECT brand, n, s,
           CAST(CAST(s AS HUGEINT) * s // (n * 1048576) AS BIGINT) AS t_g,
           CAST(q // 1048576 AS BIGINT) AS q20
    FROM grp
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           SUM(CAST(s AS HUGEINT)) AS t_all,
           CAST(SUM(q20) AS BIGINT) AS q_sum,
           CAST(SUM(t_g) AS BIGINT) AS t_sum
    FROM terms
),
ss AS (
    SELECT k, n_rows,
           t_sum - CAST(t_all * t_all // (n_rows * 1048576) AS BIGINT)
               AS bss,
           q_sum - t_sum AS wss
    FROM tot
)
SELECT k AS k_groups, n_rows,
       CAST(bss AS BIGINT) AS bss_q20,
       CAST(wss AS BIGINT) AS wss_q20,
       (CAST(bss AS DOUBLE) * (n_rows - k))
           / (CAST(wss AS DOUBLE) * (k - 1)) AS f_stat,
       CAST(bss AS DOUBLE) / (CAST(bss AS DOUBLE) + CAST(wss AS DOUBLE))
           AS eta_sq
FROM ss
"""


@register("anova_brand_price", ANOVA_ORACLE)
def q_anova_brand_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test: does mean line price differ across the 25
    part brands? Exact sufficient statistics per brand (n, Σx, Σx² in
    integer cents, DECIMAL-accumulated), between/within sums of squares
    from floor-quantized integer terms, then F and η² as one fixed
    double expression — completes the experimentation suite (Welch t is
    the 2-group special case; this is the k-group omnibus).

    Scale: per-brand state is three mergeable numbers; everything after
    the first map-side-combined aggregate is k=25 rows. The 2^20-cents²
    quantum keeps every `div` result inside int64 through sf1000 (raw
    cents² already wraps at sf0.1 — measured); past that, raise the
    quantum another 2^10. Reference tie-in: VecOp reduce semantics
    (src/op.rs:18-35) extended to a k-sample inference primitive."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        F.col("p_brand").alias("brand"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("x"),
    )
    grp = cells.groupBy("brand").agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).cast("long").alias("s"),
        F.sum(F.col("x").cast("decimal(12,0)") * F.col("x").cast("decimal(12,0)"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    terms = grp.select(
        "n",
        "s",
        F.expr(
            "CAST(CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))"
            " div (n * 1048576) AS BIGINT)"
        ).alias("t_g"),
        F.expr("CAST(q div 1048576 AS BIGINT)").alias("q20"),
    )
    tot = terms.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_rows"),
        F.sum(F.col("s").cast("decimal(38,0)")).alias("t_all"),
        F.sum("q20").cast("long").alias("q_sum"),
        F.sum("t_g").cast("long").alias("t_sum"),
    )
    ss = tot.select(
        "k",
        "n_rows",
        (
            F.col("t_sum")
            - F.expr(
                "CAST(t_all * CAST(t_all AS DECIMAL(19,0))"
                " div (n_rows * 1048576) AS BIGINT)"
            )
        ).alias("bss"),
        (F.col("q_sum") - F.col("t_sum")).alias("wss"),
    )
    bss_d = F.col("bss").cast("double")
    wss_d = F.col("wss").cast("double")
    kd = F.col("k")
    nd = F.col("n_rows")
    return ss.select(
        F.col("k").alias("k_groups"),
        "n_rows",
        F.col("bss").alias("bss_q20"),
        F.col("wss").alias("wss_q20"),
        ((bss_d * (nd - kd)) / (wss_d * (kd - 1))).alias("f_stat"),
        (bss_d / (bss_d + wss_d)).alias("eta_sq"),
    )


# --- exact Q-Q comparison between source cohorts ----------------------------

# Order statistics come from the bounded-domain length histogram
# (mergeable-histogram-median pattern): the per-cohort window runs over
# #distinct-lengths rows, never over documents. Rank selection is the
# 0-based floor order statistic r_j = (j*(n-1)) div 10 — pure integers,
# so the selected VALUES are exact data points on both engines.
QQ_ORACLE = """
WITH d AS (
    SELECT CASE WHEN CAST(substr(source, 4, 8) AS INT) < 10
               THEN 'head' ELSE 'tail' END AS grp,
           n_chars AS v
    FROM documents
),
hist AS (
    SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS cnt FROM d GROUP BY grp, v
),
cum AS (
    SELECT grp, v,
           SUM(cnt) OVER (PARTITION BY grp ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS c,
           SUM(cnt) OVER (PARTITION BY grp) AS n
    FROM hist
),
qs AS (
    SELECT t.j, cum.grp,
           MIN(CASE WHEN cum.c > (t.j * (cum.n - 1)) // 10 THEN cum.v END)
               AS qv
    FROM cum CROSS JOIN range(1, 10) t(j)
    GROUP BY t.j, cum.grp
)
SELECT j AS decile,
       CAST(MAX(CASE WHEN grp = 'head' THEN qv END) AS BIGINT) AS q_head,
       CAST(MAX(CASE WHEN grp = 'tail' THEN qv END) AS BIGINT) AS q_tail,
       CAST(MAX(CASE WHEN grp = 'head' THEN qv END)
            - MAX(CASE WHEN grp = 'tail' THEN qv END) AS BIGINT) AS gap
FROM qs GROUP BY j
"""


@register("qq_source_lengths", QQ_ORACLE)
def q_qq_source_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decile Q-Q comparison of document length between the head
    (src0-9) and tail (src10-19) source cohorts: the distribution-shift
    diagnostic behind "did the new crawl batch change the length mix?",
    reported as nine exact order-statistic pairs plus their gap.

    Scale: ranks are selected from the merged per-cohort LENGTH
    histogram — the window runs over O(#distinct lengths) rows (bounded
    domain), never a global row sort; the scan side is one
    map-side-combined groupBy. The decile fan-out is a 9-row broadcast
    cross join."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.when(F.substring("source", 4, 8).cast("int") < 10, "head")
        .otherwise("tail")
        .alias("grp"),
        F.col("n_chars").alias("v"),
    )
    hist = docs.groupBy("grp", "v").agg(F.count("*").alias("cnt"))
    w_cum = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("grp")
    cum = hist.select(
        "grp",
        "v",
        F.sum("cnt").over(w_cum).alias("c"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("j"))
    qs = (
        cum.crossJoin(F.broadcast(deciles))
        .filter(F.col("c") > F.expr("(j * (n - 1)) div 10"))
        .groupBy("j", "grp")
        .agg(F.min("v").alias("qv"))
    )
    head_q = F.max(F.when(F.col("grp") == "head", F.col("qv")))
    tail_q = F.max(F.when(F.col("grp") == "tail", F.col("qv")))
    return qs.groupBy(F.col("j").alias("decile")).agg(
        head_q.alias("q_head"),
        tail_q.alias("q_tail"),
        (head_q - tail_q).alias("gap"),
    )


# --- Mann-Whitney U rank-sum test -------------------------------------------

_MW_SPLIT = 1099511627776  # 2^40: hi/lo split for int128 -> double casts

MANN_WHITNEY_ORACLE = f"""
WITH li AS (
    SELECT CAST(l_quantity AS INT) AS v, l_returnflag AS f
    FROM lineitem WHERE l_returnflag IN ('R', 'A')
),
hist AS (
    SELECT v,
           CAST(SUM(CASE WHEN f = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS na,
           CAST(SUM(CASE WHEN f = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS nb
    FROM li GROUP BY v
),
gt AS (
    SELECT SUM(CAST(a.na AS HUGEINT) * b.nb) AS s_gt
    FROM hist a JOIN hist b ON a.v > b.v
),
tot AS (
    SELECT CAST(SUM(na) AS BIGINT) AS n_r,
           CAST(SUM(nb) AS BIGINT) AS n_a,
           SUM(CAST(na AS HUGEINT) * nb) AS tie_prod,
           SUM(CAST(na + nb AS HUGEINT) * (na + nb) * (na + nb)
               - (na + nb)) AS tie_t
    FROM hist
),
comb AS (
    SELECT n_r, n_a, n_r + n_a AS n,
           2 * s_gt + tie_prod AS u2, tie_t
    FROM gt CROSS JOIN tot
),
d AS (
    SELECT n_r, n_a, n, u2,
           CAST(u2 // {_MW_SPLIT} AS BIGINT) AS u2_hi,
           CAST(u2 % {_MW_SPLIT} AS BIGINT) AS u2_lo,
           CAST(tie_t // {_MW_SPLIT} AS BIGINT) AS t_hi,
           CAST(tie_t % {_MW_SPLIT} AS BIGINT) AS t_lo
    FROM comb
)
SELECT n_r AS n_ret, n_a AS n_acc, CAST(u2 AS BIGINT) AS u_stat2,
       ((CAST(u2_hi AS DOUBLE) * {_MW_SPLIT}.0 + u2_lo)
        - CAST(n_r AS DOUBLE) * CAST(n_a AS DOUBLE))
       / SQRT((CAST(n_r AS DOUBLE) * CAST(n_a AS DOUBLE)
               * ((CAST(n AS DOUBLE) + 1.0)
                  - (CAST(t_hi AS DOUBLE) * {_MW_SPLIT}.0 + t_lo)
                    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))))
              / 3.0) AS z_value
FROM d
"""


@register("mann_whitney_u", MANN_WHITNEY_ORACLE)
def q_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test: do returned ('R') lineitems ship in
    systematically different quantities than accepted ('A') ones? The
    non-parametric two-sample location test — the robust sibling of
    ab_test_welch when the value distribution is heavy-tailed or
    ordinal.

    Exactness: the quantity domain is a bounded integer set (1..50), so
    U is computed pair-exactly from the merged value histogram —
    2U = 2·Σ_{{va>vb}} na·nb + Σ_v na·nb (the half-tie term kept doubled
    to stay integer). The tie-corrected variance needs Σ(t³−t), kept in
    DECIMAL(38,0)/HUGEINT and reaching double via the 2^40 hi/lo split
    (the int128→double DuckDB mis-rounding gotcha). The z formula is
    ONE identical double expression on both engines.

    Scale: one map-side-combined groupBy on a 50-value domain, then a
    50×50 broadcast pair join — no global rank sort of the data ever
    happens (the classic rank-sum implementation sorts all n rows;
    histogram ranks are the 100 TB form). Safe while any single
    (flag, quantity) cell count < ~4.6e12 (t³ inside 38 digits).
    Reference tie-in: VecOp reduce semantics (src/op.rs:18-35) extended
    to ordinal two-sample inference."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("R", "A"))
        .select(
            F.col("l_quantity").cast("int").alias("v"),
            F.col("l_returnflag").alias("f"),
        )
    )
    hist = (
        li.groupBy("v")
        .agg(
            F.sum(F.when(F.col("f") == "R", 1).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("f") == "A", 1).otherwise(0)).alias("nb"),
        )
        .persist()  # both sides of the pair join + the totals pass
    )
    a = hist.select(F.col("v").alias("va"), F.col("na").alias("naa"))
    b = hist.select(F.col("v").alias("vb"), F.col("nb").alias("nbb"))
    gt = (
        a.join(F.broadcast(b), F.col("va") > F.col("vb"))
        .agg(
            F.sum(F.expr("CAST(naa AS DECIMAL(19,0)) * nbb")).alias("s_gt")
        )
    )
    tot = hist.agg(
        F.sum("na").alias("n_r"),
        F.sum("nb").alias("n_a"),
        F.sum(F.expr("CAST(na AS DECIMAL(19,0)) * nb")).alias("tie_prod"),
        F.sum(
            F.expr(
                "CAST(na + nb AS DECIMAL(13,0)) * (na + nb) * (na + nb)"
                " - (na + nb)"
            )
        ).alias("tie_t"),
    )
    comb = gt.crossJoin(tot).select(
        "n_r",
        "n_a",
        (F.col("n_r") + F.col("n_a")).alias("n"),
        F.expr("CAST(2 * s_gt + tie_prod AS DECIMAL(38,0))").alias("u2"),
        "tie_t",
    )
    d = comb.select(
        "n_r",
        "n_a",
        "n",
        "u2",
        F.expr(f"CAST(u2 div {_MW_SPLIT} AS BIGINT)").alias("u2_hi"),
        F.expr(f"CAST(u2 % {_MW_SPLIT} AS BIGINT)").alias("u2_lo"),
        F.expr(f"CAST(tie_t div {_MW_SPLIT} AS BIGINT)").alias("t_hi"),
        F.expr(f"CAST(tie_t % {_MW_SPLIT} AS BIGINT)").alias("t_lo"),
    )
    split = float(_MW_SPLIT)
    u2_d = F.col("u2_hi").cast("double") * split + F.col("u2_lo")
    t_d = F.col("t_hi").cast("double") * split + F.col("t_lo")
    nr_d = F.col("n_r").cast("double")
    na_d = F.col("n_a").cast("double")
    n_d = F.col("n").cast("double")
    return d.select(
        F.col("n_r").alias("n_ret"),
        F.col("n_a").alias("n_acc"),
        F.col("u2").cast("long").alias("u_stat2"),
        (
            (u2_d - nr_d * na_d)
            / F.sqrt(
                (nr_d * na_d * ((n_d + F.lit(1.0)) - t_d / (n_d * (n_d - F.lit(1.0)))))
                / F.lit(3.0)
            )
        ).alias("z_value"),
    )


# --- CUPED variance-reduced A/B comparison -----------------------------------

_CUPED_CUT = "2024-01-16"

CUPED_ORACLE = f"""
WITH pv AS (
    SELECT user_id,
           CAST(user_id % 2 AS BIGINT) AS arm,
           CAST(SUM(CASE WHEN ts < TIMESTAMP '{_CUPED_CUT} 00:00:00'
                    THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
           CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_CUPED_CUT} 00:00:00'
                    THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id
),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           SUM(CAST(x AS HUGEINT) * y) AS sxy,
           SUM(CAST(x AS HUGEINT) * x) AS sxx,
           SUM(CAST(y AS HUGEINT) * y) AS syy,
           CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
           CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
           CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
           CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
    FROM pv
),
d AS (
    SELECT n, n0, n1, sx0, sy0, sx1, sy1,
           CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                // 1099511627776 AS BIGINT) AS cov_hi,
           CAST((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                % 1099511627776 AS BIGINT) AS cov_lo,
           CAST((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                // 1099511627776 AS BIGINT) AS vx_hi,
           CAST((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                % 1099511627776 AS BIGINT) AS vx_lo,
           CAST((CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
                // 1099511627776 AS BIGINT) AS vy_hi,
           CAST((CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy)
                % 1099511627776 AS BIGINT) AS vy_lo
    FROM mom
)
SELECT n0 AS n_even, n1 AS n_odd,
       CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
       - CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS raw_diff_cents,
       (CAST(cov_hi AS DOUBLE) * 1099511627776.0 + cov_lo)
       / (CAST(vx_hi AS DOUBLE) * 1099511627776.0 + vx_lo) AS theta,
       (CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
        - CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE))
       - ((CAST(cov_hi AS DOUBLE) * 1099511627776.0 + cov_lo)
          / (CAST(vx_hi AS DOUBLE) * 1099511627776.0 + vx_lo))
         * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)
            - CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS cuped_diff_cents,
       ((CAST(cov_hi AS DOUBLE) * 1099511627776.0 + cov_lo)
        * (CAST(cov_hi AS DOUBLE) * 1099511627776.0 + cov_lo))
       / ((CAST(vx_hi AS DOUBLE) * 1099511627776.0 + vx_lo)
          * (CAST(vy_hi AS DOUBLE) * 1099511627776.0 + vy_lo)) AS rho_sq
FROM d
"""


@register("cuped_adjusted_lift", CUPED_ORACLE)
def q_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data): the
    variance-reduction standard in modern A/B platforms. Pre-period
    purchase value (before Jan 16) is the covariate; theta = cov(x,y)/
    var(x) pooled across arms; the adjusted treatment effect is
    (ȳ₀-ȳ₁) - θ(x̄₀-x̄₁), and rho² reports the variance fraction CUPED
    removes.

    Exactness: per-user pre/post sums are exact cents (the
    value->DECIMAL(12,2)->cents ladder, ewma_user_value precedent);
    the pooled moment products n·Sxy - Sx·Sy live in HUGEINT/decimal
    and reach double via the 2^40 hi/lo split (int128->double DuckDB
    mis-rounding gotcha); theta, the adjusted diff, and rho² are ONE
    identical double expression tree on both engines.

    Scale: one map-side-combined per-user aggregate, then a 1-row
    moment aggregate — no joins, no windows. Reference tie-in: VecOp
    reduce semantics (src/op.rs:18-35) as an experimentation
    primitive."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    cut = F.lit(_CUPED_CUT + " 00:00:00").cast("timestamp")
    pv = ev.groupBy("user_id").agg(
        F.max(F.col("user_id") % 2).alias("arm"),
        F.sum(F.when(F.col("ts") < cut, cents).otherwise(0)).cast("long").alias("x"),
        F.sum(F.when(F.col("ts") >= cut, cents).otherwise(0)).cast("long").alias("y"),
    )
    mom = pv.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(19,0)) * y")).alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(19,0)) * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(19,0)) * y")).alias("syy"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("arm") == 0, F.col("x")).otherwise(0)).cast("long").alias("sx0"),
        F.sum(F.when(F.col("arm") == 0, F.col("y")).otherwise(0)).cast("long").alias("sy0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("arm") == 1, F.col("x")).otherwise(0)).cast("long").alias("sx1"),
        F.sum(F.when(F.col("arm") == 1, F.col("y")).otherwise(0)).cast("long").alias("sy1"),
    )
    d = mom.select(
        "n",
        "n0",
        "n1",
        "sx0",
        "sy0",
        "sx1",
        "sy1",
        F.expr(
            "CAST((CAST(n AS DECIMAL(19,0)) * sxy - CAST(sx AS DECIMAL(19,0)) * sy)"
            f" div {_MW_SPLIT} AS BIGINT)"
        ).alias("cov_hi"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(19,0)) * sxy - CAST(sx AS DECIMAL(19,0)) * sy)"
            f" % {_MW_SPLIT} AS BIGINT)"
        ).alias("cov_lo"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(19,0)) * sxx - CAST(sx AS DECIMAL(19,0)) * sx)"
            f" div {_MW_SPLIT} AS BIGINT)"
        ).alias("vx_hi"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(19,0)) * sxx - CAST(sx AS DECIMAL(19,0)) * sx)"
            f" % {_MW_SPLIT} AS BIGINT)"
        ).alias("vx_lo"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(19,0)) * syy - CAST(sy AS DECIMAL(19,0)) * sy)"
            f" div {_MW_SPLIT} AS BIGINT)"
        ).alias("vy_hi"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(19,0)) * syy - CAST(sy AS DECIMAL(19,0)) * sy)"
            f" % {_MW_SPLIT} AS BIGINT)"
        ).alias("vy_lo"),
    )
    split = float(_MW_SPLIT)
    cov_d = F.col("cov_hi").cast("double") * split + F.col("cov_lo")
    vx_d = F.col("vx_hi").cast("double") * split + F.col("vx_lo")
    vy_d = F.col("vy_hi").cast("double") * split + F.col("vy_lo")
    ybar0 = F.col("sy0").cast("double") / F.col("n0").cast("double")
    ybar1 = F.col("sy1").cast("double") / F.col("n1").cast("double")
    xbar0 = F.col("sx0").cast("double") / F.col("n0").cast("double")
    xbar1 = F.col("sx1").cast("double") / F.col("n1").cast("double")
    theta = cov_d / vx_d
    return d.select(
        F.col("n0").cast("long").alias("n_even"),
        F.col("n1").cast("long").alias("n_odd"),
        (ybar0 - ybar1).alias("raw_diff_cents"),
        theta.alias("theta"),
        ((ybar0 - ybar1) - theta * (xbar0 - xbar1)).alias("cuped_diff_cents"),
        ((cov_d * cov_d) / (vx_d * vy_d)).alias("rho_sq"),
    )


# --- Multiple OLS via exact 3x3 Cramer determinants ---------------------------

_MLR_SPLIT = 1152921504606846976  # 2^60: dets reach ~1e34 (int128) at sf1000

MLR_ORACLE = f"""
WITH rows_m AS (
    SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y,
           CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x1,
           CAST(l_quantity AS BIGINT) AS x2
    FROM lineitem
),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x1) AS BIGINT) AS s1,
           CAST(SUM(x2) AS BIGINT) AS s2,
           CAST(SUM(x1 * x1) AS BIGINT) AS s11,
           CAST(SUM(x1 * x2) AS BIGINT) AS s12,
           CAST(SUM(x2 * x2) AS BIGINT) AS s22,
           SUM(CAST(y AS HUGEINT)) AS sy,
           SUM(CAST(x1 AS HUGEINT) * y) AS s1y,
           SUM(CAST(x2 AS HUGEINT) * y) AS s2y,
           SUM(CAST(y AS HUGEINT) * y) AS syy
    FROM rows_m
),
dets AS (
    SELECT n, sy, s1y, s2y, syy,
           CAST(n AS HUGEINT) * (CAST(s11 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s12)
         - CAST(s1 AS HUGEINT) * (CAST(s1 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s2)
         + CAST(s2 AS HUGEINT) * (CAST(s1 AS HUGEINT) * s12 - CAST(s11 AS HUGEINT) * s2)
             AS det,
           CAST(sy AS HUGEINT) * (CAST(s11 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s12)
         - CAST(s1 AS HUGEINT) * (CAST(s1y AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s2y)
         + CAST(s2 AS HUGEINT) * (CAST(s1y AS HUGEINT) * s12 - CAST(s11 AS HUGEINT) * s2y)
             AS det0,
           CAST(n AS HUGEINT) * (CAST(s1y AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s2y)
         - CAST(sy AS HUGEINT) * (CAST(s1 AS HUGEINT) * s22 - CAST(s12 AS HUGEINT) * s2)
         + CAST(s2 AS HUGEINT) * (CAST(s1 AS HUGEINT) * s2y - CAST(s1y AS HUGEINT) * s2)
             AS det1,
           CAST(n AS HUGEINT) * (CAST(s11 AS HUGEINT) * s2y - CAST(s1y AS HUGEINT) * s12)
         - CAST(s1 AS HUGEINT) * (CAST(s1 AS HUGEINT) * s2y - CAST(s1y AS HUGEINT) * s2)
         + CAST(sy AS HUGEINT) * (CAST(s1 AS HUGEINT) * s12 - CAST(s11 AS HUGEINT) * s2)
             AS det2
    FROM mom
),
split AS (
    SELECT n, sy, s1y, s2y, syy,
           CAST(det // {_MLR_SPLIT} AS BIGINT) AS d_hi,
           CAST(det % {_MLR_SPLIT} AS BIGINT) AS d_lo,
           CAST(det0 // {_MLR_SPLIT} AS BIGINT) AS d0_hi,
           CAST(det0 % {_MLR_SPLIT} AS BIGINT) AS d0_lo,
           CAST(det1 // {_MLR_SPLIT} AS BIGINT) AS d1_hi,
           CAST(det1 % {_MLR_SPLIT} AS BIGINT) AS d1_lo,
           CAST(det2 // {_MLR_SPLIT} AS BIGINT) AS d2_hi,
           CAST(det2 % {_MLR_SPLIT} AS BIGINT) AS d2_lo,
           CAST(sy // 1048576 AS BIGINT) AS sy_hi,
           CAST(sy % 1048576 AS BIGINT) AS sy_lo,
           CAST(s1y // 1048576 AS BIGINT) AS s1y_hi,
           CAST(s1y % 1048576 AS BIGINT) AS s1y_lo,
           CAST(s2y // 1048576 AS BIGINT) AS s2y_hi,
           CAST(s2y % 1048576 AS BIGINT) AS s2y_lo,
           CAST(syy // 1048576 AS BIGINT) AS syy_hi,
           CAST(syy % 1048576 AS BIGINT) AS syy_lo
    FROM dets
)
SELECT n,
       (CAST(d0_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d0_lo)
       / (CAST(d_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d_lo) AS beta0_cents,
       (CAST(d1_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d1_lo)
       / (CAST(d_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d_lo) AS beta1_cents_per_bp,
       (CAST(d2_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d2_lo)
       / (CAST(d_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d_lo) AS beta2_cents_per_unit,
       (((CAST(d0_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d0_lo)
         / (CAST(d_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d_lo))
            * (CAST(sy_hi AS DOUBLE) * 1048576.0 + sy_lo)
        + ((CAST(d1_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d1_lo)
           / (CAST(d_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d_lo))
            * (CAST(s1y_hi AS DOUBLE) * 1048576.0 + s1y_lo)
        + ((CAST(d2_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d2_lo)
           / (CAST(d_hi AS DOUBLE) * {_MLR_SPLIT}.0 + d_lo))
            * (CAST(s2y_hi AS DOUBLE) * 1048576.0 + s2y_lo)
        - (CAST(sy_hi AS DOUBLE) * 1048576.0 + sy_lo)
          * (CAST(sy_hi AS DOUBLE) * 1048576.0 + sy_lo) / CAST(n AS DOUBLE))
       / ((CAST(syy_hi AS DOUBLE) * 1048576.0 + syy_lo)
          - (CAST(sy_hi AS DOUBLE) * 1048576.0 + sy_lo)
            * (CAST(sy_hi AS DOUBLE) * 1048576.0 + sy_lo) / CAST(n AS DOUBLE))
           AS r_sq
FROM split
"""


@register("lineitem_mlr_pricing", MLR_ORACLE)
def q_lineitem_mlr_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple linear regression price ~ discount + quantity solved in
    closed form: the 3x3 normal equations via Cramer's rule on EXACT
    integer moments — the grouped-OLS (brand_discount_ols) capability
    extended to multiple regressors, no iterative solver.

    Exactness: x1 = discount basis points, x2 = quantity, y = cents —
    all exact ints; the nine moments are exact DECIMAL(38,0)/HUGEINT;
    the four 3x3 determinants are pure int128 expressions (identical
    cofactor expansion order both engines, |det| < ~1e34 at sf1000 —
    inside int128); betas and R² reach double through the 2^60 hi/lo
    split (lo rounds once in the BIGINT->double cast — correctly
    rounded on BOTH engines, unlike the int128 direct cast) and ONE
    identical expression tree.

    Scale: a single map-side-combined moment aggregate; everything
    after is 1 row. Reference tie-in: VecOp reduce (src/op.rs:18-35)
    + CrossPOp normal-equation assembly (src/outer_product.rs)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("y"),
        (F.col("l_discount").cast("decimal(4,2)") * 100).cast("long").alias("x1"),
        F.col("l_quantity").cast("long").alias("x2"),
    )
    mom = li.agg(
        F.count("*").alias("n"),
        F.sum("x1").cast("long").alias("s1"),
        F.sum("x2").cast("long").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum(F.expr("CAST(y AS DECIMAL(19,0))")).alias("sy"),
        F.sum(F.expr("CAST(x1 AS DECIMAL(19,0)) * y")).alias("s1y"),
        F.sum(F.expr("CAST(x2 AS DECIMAL(19,0)) * y")).alias("s2y"),
        F.sum(F.expr("CAST(y AS DECIMAL(19,0)) * y")).alias("syy"),
    )
    d38 = lambda c: f"CAST({c} AS DECIMAL(38,0))"
    det_sql = (
        f"{d38('n')} * ({d38('s11')} * s22 - {d38('s12')} * s12)"
        f" - {d38('s1')} * ({d38('s1')} * s22 - {d38('s12')} * s2)"
        f" + {d38('s2')} * ({d38('s1')} * s12 - {d38('s11')} * s2)"
    )
    det0_sql = (
        f"{d38('sy')} * ({d38('s11')} * s22 - {d38('s12')} * s12)"
        f" - {d38('s1')} * ({d38('s1y')} * s22 - {d38('s12')} * s2y)"
        f" + {d38('s2')} * ({d38('s1y')} * s12 - {d38('s11')} * s2y)"
    )
    det1_sql = (
        f"{d38('n')} * ({d38('s1y')} * s22 - {d38('s12')} * s2y)"
        f" - {d38('sy')} * ({d38('s1')} * s22 - {d38('s12')} * s2)"
        f" + {d38('s2')} * ({d38('s1')} * s2y - {d38('s1y')} * s2)"
    )
    det2_sql = (
        f"{d38('n')} * ({d38('s11')} * s2y - {d38('s1y')} * s12)"
        f" - {d38('s1')} * ({d38('s1')} * s2y - {d38('s1y')} * s2)"
        f" + {d38('sy')} * ({d38('s1')} * s12 - {d38('s11')} * s2)"
    )
    dets = mom.select(
        "n",
        "sy",
        "s1y",
        "s2y",
        "syy",
        F.expr(f"CAST({det_sql} AS DECIMAL(38,0))").alias("det"),
        F.expr(f"CAST({det0_sql} AS DECIMAL(38,0))").alias("det0"),
        F.expr(f"CAST({det1_sql} AS DECIMAL(38,0))").alias("det1"),
        F.expr(f"CAST({det2_sql} AS DECIMAL(38,0))").alias("det2"),
    )
    sp = dets.select(
        "n",
        *[
            F.expr(f"CAST({c} div {_MLR_SPLIT} AS BIGINT)").alias(f"{a}_hi")
            for c, a in (("det", "d"), ("det0", "d0"), ("det1", "d1"), ("det2", "d2"))
        ],
        *[
            F.expr(f"CAST({c} % {_MLR_SPLIT} AS BIGINT)").alias(f"{a}_lo")
            for c, a in (("det", "d"), ("det0", "d0"), ("det1", "d1"), ("det2", "d2"))
        ],
        *[
            F.expr(f"CAST({c} div 1048576 AS BIGINT)").alias(f"{c}_hi")
            for c in ("sy", "s1y", "s2y", "syy")
        ],
        *[
            F.expr(f"CAST({c} % 1048576 AS BIGINT)").alias(f"{c}_lo")
            for c in ("sy", "s1y", "s2y", "syy")
        ],
    )
    big = float(_MLR_SPLIT)
    rec = lambda a: F.col(f"{a}_hi").cast("double") * big + F.col(f"{a}_lo")
    rec20 = lambda c: F.col(f"{c}_hi").cast("double") * 1048576.0 + F.col(f"{c}_lo")
    n_d = F.col("n").cast("double")
    b0 = rec("d0") / rec("d")
    b1 = rec("d1") / rec("d")
    b2 = rec("d2") / rec("d")
    ssr = (
        b0 * rec20("sy")
        + b1 * rec20("s1y")
        + b2 * rec20("s2y")
        - rec20("sy") * rec20("sy") / n_d
    )
    sst = rec20("syy") - rec20("sy") * rec20("sy") / n_d
    return sp.select(
        "n",
        b0.alias("beta0_cents"),
        b1.alias("beta1_cents_per_bp"),
        b2.alias("beta2_cents_per_unit"),
        (ssr / sst).alias("r_sq"),
    )


# --- split-conformal prediction intervals ------------------------------------

_CONF_ALPHA_NUM = 9  # 1 - alpha = 9/10

CONFORMAL_ORACLE = """
WITH obs AS (
    SELECT l_orderkey AS k1, l_linenumber AS k2,
           CAST('0x' || substr(md5('conf:' || CAST(l_orderkey AS VARCHAR)
                                   || ':' || CAST(l_linenumber AS VARCHAR)),
                               1, 15) AS BIGINT) % 4 AS split,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
    FROM lineitem
),
tr AS (
    SELECT CAST(SUM(CASE WHEN split <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN split <= 1 THEN x ELSE 0 END) AS BIGINT) AS sx,
           CAST(SUM(CASE WHEN split <= 1 THEN y ELSE 0 END) AS BIGINT) AS sy,
           CAST(SUM(CASE WHEN split <= 1 THEN
                    CAST(x AS DECIMAL(12,0)) * CAST(x AS DECIMAL(12,0))
                    ELSE CAST(0 AS DECIMAL(12,0)) END)
                AS DECIMAL(38,0)) AS sxx,
           CAST(SUM(CASE WHEN split <= 1 THEN
                    CAST(x AS DECIMAL(12,0)) * CAST(y AS DECIMAL(15,0))
                    ELSE CAST(0 AS DECIMAL(12,0)) END)
                AS DECIMAL(38,0)) AS sxy,
           CAST(SUM(CASE WHEN split = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_calib
    FROM obs
),
fit AS (
    SELECT n AS n_train,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope
    FROM tr
),
fit2 AS (
    SELECT n_train, slope,
           (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS intercept
    FROM fit CROSS JOIN tr
),
calib AS (
    SELECT k1, k2,
           ABS(CAST(y AS DOUBLE) - (intercept + slope * CAST(x AS DOUBLE)))
               AS r
    FROM obs CROSS JOIN fit2 WHERE split = 2
),
pick AS (
    SELECT r AS qhat
    FROM (SELECT r, ROW_NUMBER() OVER (ORDER BY r, k1, k2) AS rn FROM calib)
    CROSS JOIN tr
    WHERE rn = (9 * (n_calib + 1) + 9) // 10
),
test AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN
               ABS(CAST(y AS DOUBLE) - (intercept + slope * CAST(x AS DOUBLE)))
               <= qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
    FROM obs CROSS JOIN fit2 CROSS JOIN pick WHERE split = 3
)
SELECT n_train, n_calib, n_test, slope, intercept, qhat AS qhat_cents,
       n_covered,
       CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE) AS coverage
FROM fit2 CROSS JOIN tr CROSS JOIN pick CROSS JOIN test
"""


@register("conformal_price_intervals", CONFORMAL_ORACLE)
def q_conformal_price_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction: hash-split lineitem 50/25/25 into
    train/calibration/test, fit price ~ quantity by OLS on train, take
    the ceil(0.9*(n+1))-th smallest absolute calibration residual as the
    interval half-width, and report empirical test coverage — the
    distribution-free uncertainty-quantification recipe (Vovk;
    Angelopoulos & Bates 2023) guaranteeing coverage >= 90%.

    Exactness: OLS comes from exact decimal moments collapsing to ONE
    double expression (brand_discount_ols discipline); residuals are an
    identical double tree on both engines; the quantile is an exact
    order statistic (ceil via integer (9*(n+1)+9) div 10).

    Scale: the calibration quantile avoids a global sort — residuals
    bucket by floor(cents), ranks are bucket-partitioned row_numbers
    plus a bucket-level prefix sum (bounded #distinct cent buckets),
    the two-phase exact-selection pattern of the histogram-median
    family. Everything else is scalar aggregates crossed back."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("conf:"),
                            F.col("l_orderkey").cast("string"),
                            F.lit(":"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 4
        ).alias("split"),
        F.col("l_quantity").cast("long").alias("x"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("y"),
    ).persist()  # three split slices re-read it
    # ONE conditional pass yields train moments AND the calibration count
    is_tr = F.col("split") <= 1
    z12 = F.lit(0).cast("decimal(12,0)")
    tr = li.agg(
        F.sum(F.when(is_tr, 1).otherwise(0)).alias("n"),
        F.sum(F.when(is_tr, F.col("x")).otherwise(0)).alias("sx"),
        F.sum(F.when(is_tr, F.col("y")).otherwise(0)).alias("sy"),
        F.sum(
            F.when(
                is_tr,
                F.col("x").cast("decimal(12,0)") * F.col("x").cast("decimal(12,0)"),
            ).otherwise(z12)
        )
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(
            F.when(
                is_tr,
                F.col("x").cast("decimal(12,0)") * F.col("y").cast("decimal(15,0)"),
            ).otherwise(z12)
        )
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.when(F.col("split") == 2, 1).otherwise(0)).alias("n_calib"),
    )
    nd, sxd = F.col("n").cast("double"), F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    slope = (nd * F.col("sxy").cast("double") - sxd * syd) / (
        nd * F.col("sxx").cast("double") - sxd * sxd
    )
    fit = tr.select(
        F.col("n").alias("n_train"),
        F.col("n_calib"),
        slope.alias("slope"),
        ((syd - slope * sxd) / nd).alias("intercept"),
    )
    resid = F.abs(
        F.col("y").cast("double")
        - (F.col("intercept") + F.col("slope") * F.col("x").cast("double"))
    )
    calib = (
        li.filter(F.col("split") == 2)
        .crossJoin(F.broadcast(fit))
        .select(
            "k1",
            "k2",
            "n_calib",
            resid.alias("r"),
            F.floor(resid).alias("bucket"),
        )
    )
    # two-phase exact selection: per-bucket ranks + bucket prefix counts
    bc = calib.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wb = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bprefix = bc.select(
        "bucket", F.coalesce(F.sum("cnt").over(wb), F.lit(0)).alias("before")
    )
    rn_in = F.row_number().over(
        Window.partitionBy("bucket").orderBy("r", "k1", "k2")
    )
    k_rank = F.expr("(9 * (n_calib + 1) + 9) div 10")
    pick = (
        calib.select("bucket", "r", "n_calib", rn_in.alias("rn"))
        .join(F.broadcast(bprefix), "bucket")
        .filter(F.col("before") + F.col("rn") == k_rank)
        .select(F.col("r").alias("qhat"))
    )
    test = (
        li.filter(F.col("split") == 3)
        .crossJoin(F.broadcast(fit))
        .crossJoin(F.broadcast(pick))
        .agg(
            F.count("*").alias("n_test"),
            F.sum(F.when(resid <= F.col("qhat"), 1).otherwise(0)).alias(
                "n_covered"
            ),
        )
    )
    return (
        fit.crossJoin(F.broadcast(pick))
        .crossJoin(F.broadcast(test))
        .select(
            "n_train",
            "n_calib",
            "n_test",
            "slope",
            "intercept",
            F.col("qhat").alias("qhat_cents"),
            "n_covered",
            (
                F.col("n_covered").cast("double") / F.col("n_test").cast("double")
            ).alias("coverage"),
        )
    )


# --- PSI: population stability index between halves of the month -------------

from amorphous_mapreduce_spark.functions.intlog import (  # noqa: E402
    LOG2_SCALE as _PSI_SCALE,
    log2_scaled as _psi_log,
    log2_scaled_sql as _psi_log_sql,
)

_PSI_CUT = "2024-01-16"
_PSI_BAND_CENTS = 500  # $5 value bands
_PSI_SMOOTH = 1024  # fixed add-1-of-1024 smoothing mass


def _psi_lr_sql() -> str:
    return (
        f"({_psi_log_sql('c1 + 1')} - {_psi_log_sql(f'n1 + {_PSI_SMOOTH}')}"
        f" - {_psi_log_sql('c2 + 1')} + {_psi_log_sql(f'n2 + {_PSI_SMOOTH}')})"
    )


PSI_ORACLE = f"""
WITH v AS (
    SELECT CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
               // {_PSI_BAND_CENTS} AS bucket,
           CASE WHEN ts < TIMESTAMP '{_PSI_CUT} 00:00:00' THEN 1 ELSE 2 END
               AS period
    FROM events WHERE event_type = 'purchase'
),
b AS (
    SELECT bucket,
           CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
           CAST(SUM(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
    FROM v GROUP BY bucket
),
tot AS (
    SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
           CAST(COUNT(*) AS BIGINT) AS n_buckets
    FROM b
),
contrib AS (
    SELECT CAST(SUM(((c1 * {_PSI_SCALE}) // n1 - (c2 * {_PSI_SCALE}) // n2)
                    * {_psi_lr_sql()}) AS BIGINT) AS psi_scaled
    FROM b CROSS JOIN tot
)
SELECT n1, n2, n_buckets, psi_scaled,
       CAST(psi_scaled AS DOUBLE)
       / ({_PSI_SCALE}.0 * {_PSI_SCALE}.0) AS psi_bits
FROM contrib CROSS JOIN tot
"""


@register("psi_value_stability", PSI_ORACLE)
def q_psi_value_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the purchase-value distribution
    between the first and second half of the month — the model-ops
    drift gate (rule of thumb: PSI < 0.1 stable, > 0.25 shifted),
    complementing feature_drift_buckets' chi2 with the log-ratio
    metric.

    Exactness: proportions quantize to 2^-20 integers (floor div by the
    period totals); the smoothed log-ratio is four intlog integers; each
    bucket contribution is an exact int64 product (<= 2^20 * ~56*2^20 =
    2^46-ish per bucket), so the sum needs no decimal ladder; ONE double
    division at the end. PSI here is in bits (log2) — the deterministic
    spec.

    Scale: one map-side-combined bucket aggregate over the value bands,
    then everything runs on #buckets rows with the 1-row totals scalar
    crossed back."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    v = ev.select(
        F.expr(
            f"CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"
            f" div {_PSI_BAND_CENTS}"
        ).alias("bucket"),
        F.when(
            F.col("ts") < F.lit(f"{_PSI_CUT} 00:00:00").cast("timestamp"), 1
        )
        .otherwise(2)
        .alias("period"),
    )
    b = v.groupBy("bucket").agg(
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("period") == 2, 1).otherwise(0)).alias("c2"),
    )
    tot = b.agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.count("*").alias("n_buckets"),
    )
    lr = (
        _psi_log("c1 + 1")
        - _psi_log(f"n1 + {_PSI_SMOOTH}")
        - _psi_log("c2 + 1")
        + _psi_log(f"n2 + {_PSI_SMOOTH}")
    )
    dp = F.expr(f"(c1 * {_PSI_SCALE}) div n1 - (c2 * {_PSI_SCALE}) div n2")
    contrib = (
        b.crossJoin(F.broadcast(tot))
        .agg(F.sum(dp * lr).alias("psi_scaled"))
    )
    return contrib.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        "n_buckets",
        F.col("psi_scaled").cast("long").alias("psi_scaled"),
        (
            F.col("psi_scaled").cast("double")
            / F.lit(float(_PSI_SCALE) * float(_PSI_SCALE))
        ).alias("psi_bits"),
    )


# --- empirical-Bayes shrinkage of per-part return rates -----------------------

_EB_Q = 1048576  # 2^20 rate quantum
EB_TOP = 15

EB_ORACLE = f"""
WITH per AS (
    SELECT l_partkey AS part,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS k
    FROM lineitem GROUP BY l_partkey
),
q AS (SELECT part, n, k, (k * {_EB_Q}) // n AS p FROM per),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS np,
           CAST(SUM(p) AS BIGINT) AS s1,
           SUM(CAST(p AS HUGEINT) * p) AS s2
    FROM q
),
ab AS (
    SELECT np, s1,
           CAST(s1 AS DOUBLE) / (CAST(np AS DOUBLE) * {_EB_Q}.0) AS mu,
           (CAST(np AS DOUBLE) * CAST(s2 AS DOUBLE)
            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
           / (CAST(np AS DOUBLE) * CAST(np AS DOUBLE)
              * {_EB_Q}.0 * {_EB_Q}.0) AS var
    FROM mom
),
prior AS (
    SELECT mu, var,
           mu * (mu * (1.0 - mu) / var - 1.0) AS alpha,
           (1.0 - mu) * (mu * (1.0 - mu) / var - 1.0) AS beta
    FROM ab
)
SELECT part, n, k,
       CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS raw_rate,
       alpha, beta,
       (CAST(k AS DOUBLE) + alpha)
       / (CAST(n AS DOUBLE) + alpha + beta) AS posterior_rate
FROM q CROSS JOIN prior
ORDER BY posterior_rate DESC, part LIMIT {EB_TOP}
"""


@register("eb_return_rate_shrinkage", EB_ORACLE)
def q_eb_return_rate_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of per-part return
    rates: fit a Beta prior to the population by method of moments,
    then rank parts by posterior mean (k+alpha)/(n+alpha+beta) — the
    small-sample-safe leaderboard (a 1/1 part no longer beats a 40/50
    part), the standard ranking fix for sparse per-key rates.

    Exactness: per-part rates quantize to 2^-20 integers BEFORE the
    cross-part moment sums (the neyman quantize-then-sum rule); moments
    reach doubles once; prior and posterior are ONE shared double tree;
    ordering ties break on part id.

    Scale: one keyed aggregate to per-part counts, a 1-row moment
    aggregate, the prior crossed back, distributed top-k
    (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("k"),
    )
    q = per.withColumn("p", F.expr(f"(k * {_EB_Q}) div n"))
    mom = q.agg(
        F.count("*").alias("np"),
        F.sum("p").alias("s1"),
        F.sum(F.col("p").cast("decimal(19,0)") * F.col("p"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    npd = F.col("np").cast("double")
    s1d = F.col("s1").cast("double")
    mu = s1d / (npd * F.lit(float(_EB_Q)))
    var = (npd * F.col("s2").cast("double") - s1d * s1d) / (
        npd * npd * F.lit(float(_EB_Q)) * F.lit(float(_EB_Q))
    )
    v = mu * (F.lit(1.0) - mu) / var - F.lit(1.0)
    prior = mom.select(
        (mu * v).alias("alpha"), ((F.lit(1.0) - mu) * v).alias("beta")
    )
    return (
        q.crossJoin(F.broadcast(prior))
        .select(
            "part",
            "n",
            "k",
            (F.col("k").cast("double") / F.col("n").cast("double")).alias(
                "raw_rate"
            ),
            "alpha",
            "beta",
            (
                (F.col("k").cast("double") + F.col("alpha"))
                / (F.col("n").cast("double") + F.col("alpha") + F.col("beta"))
            ).alias("posterior_rate"),
        )
        .orderBy(F.desc("posterior_rate"), F.asc("part"))
        .limit(EB_TOP)
    )


# --- k-fold cross-validation by moment subtraction ----------------------------

_CV_FOLDS = 4

CV_ORACLE = f"""
WITH obs AS (
    SELECT CAST('0x' || substr(md5('cv:' || CAST(l_orderkey AS VARCHAR)
                                   || ':' || CAST(l_linenumber AS VARCHAR)),
                               1, 15) AS BIGINT) % {_CV_FOLDS} AS fold,
           CAST(l_quantity AS BIGINT) AS x,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
    FROM lineitem
),
fm AS (
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(CAST(x AS DECIMAL(12,0)) * CAST(x AS DECIMAL(12,0)))
                AS DECIMAL(38,0)) AS sxx,
           CAST(SUM(CAST(x AS DECIMAL(12,0)) * CAST(y AS DECIMAL(15,0)))
                AS DECIMAL(38,0)) AS sxy,
           CAST(SUM(CAST(y AS DECIMAL(15,0)) * CAST(y AS DECIMAL(15,0)))
                AS DECIMAL(38,0)) AS syy
    FROM obs GROUP BY fold
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(sx) AS BIGINT) AS tsx,
           CAST(SUM(sy) AS BIGINT) AS tsy,
           CAST(SUM(sxx) AS DECIMAL(38,0)) AS tsxx,
           CAST(SUM(sxy) AS DECIMAL(38,0)) AS tsxy
    FROM fm
),
fit AS (
    SELECT fold, n, sx, sy, sxx, sxy, syy,
           tn - n AS n_train,
           (CAST(tn - n AS DOUBLE) * CAST(tsxy - sxy AS DOUBLE)
            - CAST(tsx - sx AS DOUBLE) * CAST(tsy - sy AS DOUBLE))
           / (CAST(tn - n AS DOUBLE) * CAST(tsxx - sxx AS DOUBLE)
              - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE)) AS b
    FROM fm CROSS JOIN tot
),
fit2 AS (
    SELECT fold, n, sx, sy, sxx, sxy, syy, n_train, b,
           (CAST(tsy - sy AS DOUBLE) - b * CAST(tsx - sx AS DOUBLE))
           / CAST(n_train AS DOUBLE) AS a
    FROM fit CROSS JOIN tot
)
SELECT fold, n_train, n AS n_test, b AS slope, a AS intercept,
       sqrt((CAST(syy AS DOUBLE) + CAST(n AS DOUBLE) * a * a
             + b * b * CAST(sxx AS DOUBLE)
             - 2.0 * a * CAST(sy AS DOUBLE) - 2.0 * b * CAST(sxy AS DOUBLE)
             + 2.0 * a * b * CAST(sx AS DOUBLE))
            / CAST(n AS DOUBLE)) AS rmse_cents
FROM fit2 ORDER BY fold
"""


@register("kfold_cv_price_model", CV_ORACLE)
def q_kfold_cv_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-fold cross-validated OLS (price ~ quantity) where each fold's
    training fit comes from MOMENT SUBTRACTION — total sufficient
    statistics minus the held-out fold's — so k folds cost ONE scan
    instead of k (the leave-out algebra that makes CV viable at
    100 TB). Held-out RMSE expands to the closed form
    syy + n*a^2 + b^2*sxx - 2a*sy - 2b*sxy + 2ab*sx, so no residual
    pass is needed either.

    Exactness: fold moments are exact decimal/integer; train moments
    are exact differences; slope/intercept/RMSE are ONE shared double
    tree (sqrt is engine-safe).

    Scale: a single map-side-combined aggregate onto 4 fold rows, a
    4-row total, and 4-row arithmetic. Nothing else touches the data."""
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cv:"),
                            F.col("l_orderkey").cast("string"),
                            F.lit(":"),
                            F.col("l_linenumber").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % _CV_FOLDS
        ).alias("fold"),
        F.col("l_quantity").cast("long").alias("x"),
        (F.col("l_extendedprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    fm = obs.groupBy("fold").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast("decimal(12,0)") * F.col("x").cast("decimal(12,0)"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("x").cast("decimal(12,0)") * F.col("y").cast("decimal(15,0)"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("y").cast("decimal(15,0)") * F.col("y").cast("decimal(15,0)"))
        .cast("decimal(38,0)")
        .alias("syy"),
    ).persist()  # totals AND per-fold fits re-read the 4-row frame
    tot = fm.agg(
        F.sum("n").alias("tn"),
        F.sum("sx").alias("tsx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxx").cast("decimal(38,0)").alias("tsxx"),
        F.sum("sxy").cast("decimal(38,0)").alias("tsxy"),
    )
    j = fm.crossJoin(F.broadcast(tot))
    ntr = (F.col("tn") - F.col("n")).cast("double")
    dsx = (F.col("tsx") - F.col("sx")).cast("double")
    dsy = (F.col("tsy") - F.col("sy")).cast("double")
    dsxx = (F.col("tsxx") - F.col("sxx")).cast("double")
    dsxy = (F.col("tsxy") - F.col("sxy")).cast("double")
    b = (ntr * dsxy - dsx * dsy) / (ntr * dsxx - dsx * dsx)
    a = (dsy - b * dsx) / ntr
    nd = F.col("n").cast("double")
    sse = (
        F.col("syy").cast("double")
        + nd * a * a
        + b * b * F.col("sxx").cast("double")
        - F.lit(2.0) * a * F.col("sy").cast("double")
        - F.lit(2.0) * b * F.col("sxy").cast("double")
        + F.lit(2.0) * a * b * F.col("sx").cast("double")
    )
    return j.select(
        "fold",
        (F.col("tn") - F.col("n")).alias("n_train"),
        F.col("n").alias("n_test"),
        b.alias("slope"),
        a.alias("intercept"),
        F.sqrt(sse / nd).alias("rmse_cents"),
    ).orderBy("fold")


# --- standardized-mean-difference covariate balance ---------------------------

SMD_ORACLE = """
WITH per_user AS (
    SELECT user_id,
           CAST(user_id % 2 AS BIGINT) AS arm,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS purchase_cents,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events GROUP BY user_id
),
long_f AS (
    SELECT arm, 'n_events' AS covariate, n_events AS x FROM per_user
    UNION ALL
    SELECT arm, 'n_types', n_types FROM per_user
    UNION ALL
    SELECT arm, 'purchase_cents', purchase_cents FROM per_user
),
mom AS (
    SELECT covariate, arm,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS s1,
           SUM(CAST(x AS HUGEINT) * x) AS s2
    FROM long_f GROUP BY covariate, arm
),
wide AS (
    SELECT t.covariate,
           t.n AS n_t, t.s1 AS s1_t, CAST(t.s2 AS DOUBLE) AS s2_t,
           c.n AS n_c, c.s1 AS s1_c, CAST(c.s2 AS DOUBLE) AS s2_c
    FROM mom t JOIN mom c ON t.covariate = c.covariate
    WHERE t.arm = 0 AND c.arm = 1
)
SELECT covariate, n_t AS n_even, n_c AS n_odd,
       CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE)
       - CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE) AS mean_diff,
       CASE WHEN (s2_t / CAST(n_t AS DOUBLE)
                  - (CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE))
                    * (CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE)))
                 + (s2_c / CAST(n_c AS DOUBLE)
                    - (CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                      * (CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE))) = 0
            THEN NULL
            ELSE (CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                  - CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                 / sqrt(((s2_t / CAST(n_t AS DOUBLE)
                          - (CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE))
                            * (CAST(s1_t AS DOUBLE) / CAST(n_t AS DOUBLE)))
                         + (s2_c / CAST(n_c AS DOUBLE)
                            - (CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE))
                              * (CAST(s1_c AS DOUBLE)
                                 / CAST(n_c AS DOUBLE)))) / 2.0)
       END AS smd
FROM wide ORDER BY covariate
"""


@register("smd_covariate_balance", SMD_ORACLE)
def q_smd_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Covariate-balance check for the user_id-parity experiment split:
    standardized mean difference (Cohen's d with pooled variance) of
    per-user activity covariates across arms — the table every
    causal-inference readout leads with (|SMD| < 0.1 = balanced; the
    pre-test for ab_test_welch / cuped_adjusted_lift / diff_in_diff).

    Exactness: per-user covariates are exact integers; per-arm moments
    are exact (HUGEINT/decimal squares); mean and SMD are ONE shared
    double tree per covariate (sqrt engine-safe).

    Scale: one per-user aggregate, a 3x explode to covariate-long form,
    a 6-row moment rollup, 3-row arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (F.col("user_id") % 2).cast("long").alias("arm"),
        F.count("*").alias("n_events"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                (F.col("value").cast("decimal(12,2)") * 100).cast("long"),
            ).otherwise(0)
        ).alias("purchase_cents"),
        F.countDistinct("event_type").alias("n_types"),
    )
    long_f = per_user.select(
        "arm",
        F.expr(
            "stack(3, 'n_events', n_events, 'n_types', n_types,"
            " 'purchase_cents', purchase_cents) AS (covariate, x)"
        ),
    )
    mom = long_f.groupBy("covariate", "arm").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    t = mom.filter(F.col("arm") == 0).select(
        "covariate",
        F.col("n").alias("n_t"),
        F.col("s1").alias("s1_t"),
        F.col("s2").cast("double").alias("s2_t"),
    )
    c = mom.filter(F.col("arm") == 1).select(
        "covariate",
        F.col("n").alias("n_c"),
        F.col("s1").alias("s1_c"),
        F.col("s2").cast("double").alias("s2_c"),
    )
    mt = F.col("s1_t").cast("double") / F.col("n_t").cast("double")
    mc = F.col("s1_c").cast("double") / F.col("n_c").cast("double")
    vt = F.col("s2_t") / F.col("n_t").cast("double") - mt * mt
    vc = F.col("s2_c") / F.col("n_c").cast("double") - mc * mc
    return (
        t.join(c, "covariate")
        .select(
            "covariate",
            F.col("n_t").alias("n_even"),
            F.col("n_c").alias("n_odd"),
            (mt - mc).alias("mean_diff"),
            # zero pooled variance (a constant covariate) -> NULL on both
            # engines; Spark ANSI raises on /0 where DuckDB returns inf
            F.when(vt + vc == 0, F.lit(None).cast("double"))
            .otherwise((mt - mc) / F.sqrt((vt + vc) / F.lit(2.0)))
            .alias("smd"),
        )
        .orderBy("covariate")
    )


# --- clustered-design effective sample size ------------------------------------

DEFF_ORACLE = """
WITH per_user AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS w
    FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(w) AS BIGINT) AS s1,
           SUM(CAST(w AS HUGEINT) * w) AS s2
    FROM per_user
)
SELECT n_users, s1 AS n_purchases,
       CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(s2 AS DOUBLE)
           AS effective_sample_size,
       CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
       / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) AS design_effect,
       CAST(s1 AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_cluster_size
FROM mom
"""


@register("cluster_design_effect", DEFF_ORACLE)
def q_cluster_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Design effect of user-level clustering for purchase-grain
    experiment metrics: events from one user are correlated, so the
    effective sample size is (sum w)^2 / sum w^2 (Kish), and deff =
    n / ESS inflates every purchase-grain variance estimate — the power
    correction that pairs with smd_covariate_balance / ab_test_welch
    when randomization is by user but analysis is by event.

    Exactness: counts and squared counts are exact integers (HUGEINT /
    decimal squares); ESS and deff are single double expressions.

    Scale: one map-side-combined per-user count, a 1-row moment
    aggregate."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per = ev.groupBy("user_id").agg(F.count("*").alias("w"))
    mom = per.agg(
        F.count("*").alias("n_users"),
        F.sum("w").alias("s1"),
        F.sum(F.col("w").cast("decimal(19,0)") * F.col("w"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    return mom.select(
        "n_users",
        F.col("s1").alias("n_purchases"),
        (s1d * s1d / s2d).alias("effective_sample_size"),
        (s1d * s2d / (s1d * s1d)).alias("design_effect"),
        (s1d / F.col("n_users").cast("double")).alias("mean_cluster_size"),
    )


# --- exact Wasserstein-1 (earth mover) between two segments -----------------

# W1 = integral |F_a - F_b| dx over the dollar grid. Cross-multiplied:
# W1 * n_a * n_b = sum over every dollar d of |cumsum(ca*nb - cb*na)| —
# ONE signed delta column, ONE distributed prefix scan (prefix of a
# difference = difference of prefixes), gaps handled by densifying to
# the integer-dollar grid (domain-bounded, data-size independent —
# events_gap_fill precedent). KS (the sup norm) rides the same cumsum.
_W1_SEG_A = "BUILDING"
_W1_SEG_B = "MACHINERY"

W1_ORACLE = f"""
WITH v AS (
    SELECT CAST(floor(CAST(o_totalprice AS DECIMAL(12,2))) AS BIGINT) AS d,
           c_mktsegment AS seg
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN ('{_W1_SEG_A}', '{_W1_SEG_B}')
),
cnt AS (
    SELECT d,
           CAST(SUM(CASE WHEN seg = '{_W1_SEG_A}' THEN 1 ELSE 0 END)
                AS BIGINT) AS ca,
           CAST(SUM(CASE WHEN seg = '{_W1_SEG_B}' THEN 1 ELSE 0 END)
                AS BIGINT) AS cb
    FROM v GROUP BY d
),
scal AS (
    SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
           MIN(d) AS dmin, MAX(d) AS dmax
    FROM cnt
),
grid AS (
    SELECT unnest(generate_series(dmin, dmax)) AS d, na, nb FROM scal
),
cum AS (
    SELECT g.d, g.na, g.nb,
           CAST(SUM(COALESCE(c.ca, 0) * g.nb - COALESCE(c.cb, 0) * g.na)
                OVER (ORDER BY g.d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS dd
    FROM grid g LEFT JOIN cnt c ON c.d = g.d
)
SELECT MAX(na) AS n_a, MAX(nb) AS n_b,
       CAST(SUM(abs(dd)) AS BIGINT) AS w1_num,
       CAST(SUM(abs(dd)) AS DOUBLE) / CAST(MAX(na) * MAX(nb) AS DOUBLE)
           AS w1_dollars,
       CAST(MAX(abs(dd)) AS BIGINT) AS ks_num,
       CAST(MAX(abs(dd)) AS DOUBLE) / CAST(MAX(na) * MAX(nb) AS DOUBLE)
           AS ks_stat
FROM cum
"""


@register("wasserstein_price_segments", W1_ORACLE)
def q_wasserstein_price_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Wasserstein-1 (earth-mover) distance between the BUILDING
    and MACHINERY segments' order-value distributions at dollar grain,
    with the Kolmogorov-Smirnov sup-statistic riding the same cumulative
    — the integral-norm companion to ks_two_sample (W1 sees HOW FAR mass
    must move, not just the worst gap).

    Integer-exact: the CDF difference is cross-multiplied
    (cumsum(ca*nb - cb*na)), summed over the densified dollar grid so
    every unit gap contributes exactly once — no lead/lag, no floats
    until the two final divisions.

    Scale: one keyed join + per-dollar aggregate; the grid is bounded by
    the VALUE DOMAIN (~600k dollars), not row count; the running sum is
    operators/corpus_stats.distributed_prefix_sum (range sort +
    partition partials + O(#partitions) offset merge), never a
    single-partition window over the grid."""
    from amorphous_mapreduce_spark.operators.corpus_stats import (
        distributed_prefix_sum,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    v = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment").isin(_W1_SEG_A, _W1_SEG_B))
        .select(
            F.floor(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("long")
            .alias("d"),
            F.col("c_mktsegment").alias("seg"),
        )
    )
    cnt = v.groupBy("d").agg(
        F.sum((F.col("seg") == _W1_SEG_A).cast("bigint")).alias("ca"),
        F.sum((F.col("seg") == _W1_SEG_B).cast("bigint")).alias("cb"),
    )
    cnt = cnt.persist()  # read by the scalar agg AND the grid join
    scal = cnt.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.min("d").alias("dmin"),
        F.max("d").alias("dmax"),
    )
    grid = (
        scal.select(
            F.explode(F.sequence(F.col("dmin"), F.col("dmax"))).alias("d"),
            "na",
            "nb",
        )
        # the sequence explodes from ONE row — spread it before the join
        .repartition(32, "d")
    )
    joined = grid.join(cnt, "d", "left").select(
        "d",
        "na",
        "nb",
        (
            F.coalesce(F.col("ca"), F.lit(0)) * F.col("nb")
            - F.coalesce(F.col("cb"), F.lit(0)) * F.col("na")
        ).alias("delta"),
    )
    cum = distributed_prefix_sum(joined, "delta", ["d"], cum_col="dd")
    return cum.agg(
        F.max("na").alias("n_a"),
        F.max("nb").alias("n_b"),
        F.sum(F.abs("dd")).alias("w1_num"),
        (
            F.sum(F.abs("dd")).cast("double")
            / (F.max("na") * F.max("nb")).cast("double")
        ).alias("w1_dollars"),
        F.max(F.abs("dd")).alias("ks_num"),
        (
            F.max(F.abs("dd")).cast("double")
            / (F.max("na") * F.max("nb")).cast("double")
        ).alias("ks_stat"),
    )


# --- Hodges-Lehmann robust location of daily event value --------------------

HL_ORACLE = """
WITH daily AS (
    SELECT event_type, epoch_us(ts) // 86400000000 AS day,
           CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 100 AS BIGINT))
                AS BIGINT) AS v
    FROM events GROUP BY event_type, day
),
walsh AS (
    SELECT a.event_type, a.day AS d1, b.day AS d2, a.v + b.v AS s2
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type AND a.day <= b.day
),
ranked AS (
    SELECT event_type, s2,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY s2, d1, d2) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
    FROM walsh
)
SELECT event_type,
       CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
       CAST(MAX(CASE WHEN rn = (n_pairs + 1) // 2 THEN s2 END) AS BIGINT)
           AS hl_2x_cents,
       CAST(MAX(CASE WHEN rn = (n_pairs + 1) // 2 THEN s2 END) AS DOUBLE)
           / 2.0 AS hl_cents
FROM ranked GROUP BY event_type
"""


@register("hodges_lehmann_value", HL_ORACLE)
def q_hodges_lehmann_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann robust location estimate of daily event value per
    event type: the median of all Walsh averages (x_i + x_j)/2 over day
    pairs i <= j — the estimator behind the Wilcoxon signed-rank CI,
    more efficient than the median and still 29%-breakdown robust.
    The Walsh sums stay INTEGER cents (the /2 happens once at the end),
    the median is the lower order statistic under a (s2, d1, d2) total
    order — the theil_sen_trend template applied to locations.

    Scale: pairs form on the DAILY aggregate — calendar-bounded (days²
    per type), never event volume; rank windows partition by type."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.expr("unix_micros(ts) div 86400000000").alias("day"),
            F.col("value").cast("decimal(18,6)").alias("dv"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum((F.col("dv") * 100).cast("bigint")).alias("v"))
    )
    daily = daily.persist()  # both pair-join sides (self-join gotcha)
    a = daily.select(
        "event_type", F.col("day").alias("d1"), F.col("v").alias("v1")
    )
    b = daily.select(
        "event_type", F.col("day").alias("d2"), F.col("v").alias("v2")
    )
    walsh = (
        a.join(b, "event_type")
        .filter(F.col("d1") <= F.col("d2"))
        .select("event_type", "d1", "d2", (F.col("v1") + F.col("v2")).alias("s2"))
    )
    wr = Window.partitionBy("event_type").orderBy("s2", "d1", "d2")
    ranked = walsh.select(
        "event_type",
        "s2",
        F.row_number().over(wr).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n_pairs"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n_pairs").alias("n_pairs"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(n_pairs + 1) div 2"), F.col("s2")
            )
        ).alias("hl_2x_cents"),
        (
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n_pairs + 1) div 2"), F.col("s2")
                )
            ).cast("double")
            / 2.0
        ).alias("hl_cents"),
    )


# --- RANSAC robust line fit (hash-panel candidates) ---------------------------

_RANSAC_T = 32  # candidate models
_RANSAC_THR = 2000  # inlier threshold, cents

# Endpoint sampling (round-7 rewrite, VERDICT_r06 item 8): ONE md5 per
# row (reduced mod 2147483647), then 64 affine mixes — the minhash
# permutation family ((hm*(2*slot+1) + slot*12345) % 2147483647), the
# bootstrap_revenue_ci one-digest multi-draw trick — packed with pk into
# a single BIGINT (mix * 2^32 + pk; pk < 2^32 through sf100) so each
# slot's endpoint is MIN(pack): the previous ×64 panel explode shuffled
# 64n rows through a window (slope2 11.3, ~50 s at sf1); now it's 64
# min-aggregates in one partial-aggregated scan.
_RANSAC_PANEL_SQL = ", ".join(
    f"('a', {t}, {2 * t}), ('b', {t}, {2 * t + 1})" for t in range(_RANSAC_T)
)

RANSAC_ORACLE = f"""
WITH items AS (
    SELECT p_partkey AS pk, CAST(p_size AS BIGINT) AS sx,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS yc
    FROM part
),
hashed AS (
    SELECT pk, sx, yc,
           CAST('0x' || substr(md5('ransac_' || CAST(pk AS VARCHAR)), 1, 15)
                AS BIGINT) % 2147483647 AS hm
    FROM items
),
slotmins AS (
    SELECT e.ep, e.t,
           MIN(((hm * (2 * e.slot + 1) + e.slot * 12345) % 2147483647)
               * 4294967296 + pk) AS pack
    FROM hashed CROSS JOIN (VALUES {_RANSAC_PANEL_SQL}) AS e(ep, t, slot)
    GROUP BY e.ep, e.t
),
picked AS (
    SELECT s.ep, s.t, i.sx, i.yc
    FROM slotmins s JOIN items i ON i.pk = s.pack % 4294967296
),
cands AS (
    SELECT t,
           MAX(CASE WHEN ep = 'a' THEN sx END) AS xa,
           MAX(CASE WHEN ep = 'a' THEN yc END) AS ya,
           MAX(CASE WHEN ep = 'b' THEN sx END) AS xb,
           MAX(CASE WHEN ep = 'b' THEN yc END) AS yb
    FROM picked GROUP BY t
),
lines AS (
    SELECT t, ((yb - ya) * 1048576) // (xb - xa) AS m_q,
           ya * 1048576 - (((yb - ya) * 1048576) // (xb - xa)) * xa AS b_q
    FROM cands WHERE xa <> xb
),
scored AS (
    SELECT l.t, l.m_q, l.b_q,
           CAST(SUM(CASE WHEN abs(i.yc * 1048576 - (l.m_q * i.sx + l.b_q))
                              <= {_RANSAC_THR} * 1048576
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
    FROM lines l CROSS JOIN items i
    GROUP BY l.t, l.m_q, l.b_q
),
winner AS (
    SELECT t, m_q, b_q, n_inliers FROM scored
    ORDER BY n_inliers DESC, t LIMIT 1
),
refit AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_in,
           CAST(SUM(i.sx) AS BIGINT) AS s_x,
           CAST(SUM(i.yc) AS BIGINT) AS s_y,
           CAST(SUM(i.sx * i.yc) AS BIGINT) AS s_xy,
           CAST(SUM(i.sx * i.sx) AS BIGINT) AS s_xx
    FROM items i CROSS JOIN winner w
    WHERE abs(i.yc * 1048576 - (w.m_q * i.sx + w.b_q))
          <= {_RANSAC_THR} * 1048576
),
np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_points FROM items)
SELECT w.t AS cand, w.m_q, w.b_q, w.n_inliers, np.n_points,
       CAST(w.n_inliers AS DOUBLE) / CAST(np.n_points AS DOUBLE)
           AS inlier_frac,
       (CAST(r.n_in AS DOUBLE) * CAST(r.s_xy AS DOUBLE)
        - CAST(r.s_x AS DOUBLE) * CAST(r.s_y AS DOUBLE))
       / (CAST(r.n_in AS DOUBLE) * CAST(r.s_xx AS DOUBLE)
          - CAST(r.s_x AS DOUBLE) * CAST(r.s_x AS DOUBLE)) AS refit_slope,
       (CAST(r.s_y AS DOUBLE)
        - (CAST(r.n_in AS DOUBLE) * CAST(r.s_xy AS DOUBLE)
           - CAST(r.s_x AS DOUBLE) * CAST(r.s_y AS DOUBLE))
          / (CAST(r.n_in AS DOUBLE) * CAST(r.s_xx AS DOUBLE)
             - CAST(r.s_x AS DOUBLE) * CAST(r.s_x AS DOUBLE))
          * CAST(r.s_x AS DOUBLE))
       / CAST(r.n_in AS DOUBLE) AS refit_intercept
FROM winner w CROSS JOIN refit r CROSS JOIN np
"""


@register("ransac_price_fit", RANSAC_ORACLE)
def q_ransac_price_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC robust line fit of price-on-size: 32 candidate lines from
    md5-chosen point pairs (the hash-panel trick from
    quantization_recall — sampling as deterministic dataflow), inliers
    counted within a fixed residual band, winner refit by exact OLS on
    its inliers. The consensus sibling of theil_sen_trend (median
    slope) and lineitem_mlr_pricing (L2): outliers can't drag the fit.

    Candidate slopes/intercepts are 2^20-quantized integer rationals
    (truncating div matches DuckDB //), so inlier sets replay exactly;
    the refit is a fixed double expression over exact int64 moments
    (size <= 50 keeps every moment in int64 through sf10).

    Scale: endpoint picking is ONE md5 per row + 64 affine-mixed
    min-aggregates fused into a single partial-aggregated scan (the
    one-digest multi-draw trick; replaces the ×64 panel explode whose
    64n-row window shuffle was slope2 11.3 / ~50 s at sf1 — VERDICT_r06
    item 8), then a broadcast join of the 64 winner pks back to part;
    scoring joins the <=32-row broadcast line panel onto one pass of
    part — no pairwise anything."""
    from amorphous_mapreduce_spark.functions.hashing import hex_hash64

    part = load_table(spark, sf_dir, "part")
    items = part.select(
        F.col("p_partkey").alias("pk"),
        F.col("p_size").cast("long").alias("sx"),
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("yc"),
    ).persist()
    hm = F.pmod(
        hex_hash64(F.concat(F.lit("ransac_"), F.col("pk").cast("string"))),
        F.lit(2147483647),
    )
    hashed = items.select("pk", hm.alias("hm"))
    slots = [(ep, t, 2 * t + (1 if ep == "b" else 0)) for t in range(_RANSAC_T) for ep in ("a", "b")]
    mins = hashed.agg(
        *[
            F.min(
                F.pmod(
                    F.col("hm") * F.lit(2 * slot + 1) + F.lit(slot * 12345),
                    F.lit(2147483647),
                )
                * F.lit(4294967296)
                + F.col("pk")
            ).alias(f"p_{ep}_{t}")
            for ep, t, slot in slots
        ]
    )
    winners = mins.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ep).alias("ep"),
                        F.lit(t).alias("t"),
                        F.pmod(F.col(f"p_{ep}_{t}"), F.lit(4294967296)).alias(
                            "pk"
                        ),
                    )
                    for ep, t, _ in slots
                ]
            )
        ).alias("s")
    ).select("s.ep", "s.t", "s.pk")
    picked = items.join(F.broadcast(winners), "pk").select("ep", "t", "sx", "yc")
    cands = picked.groupBy("t").agg(
        F.max(F.when(F.col("ep") == "a", F.col("sx"))).alias("xa"),
        F.max(F.when(F.col("ep") == "a", F.col("yc"))).alias("ya"),
        F.max(F.when(F.col("ep") == "b", F.col("sx"))).alias("xb"),
        F.max(F.when(F.col("ep") == "b", F.col("yc"))).alias("yb"),
    )
    lines = cands.filter(F.col("xa") != F.col("xb")).select(
        "t",
        F.expr("((yb - ya) * 1048576) div (xb - xa)").alias("m_q"),
        F.expr(
            "ya * 1048576 - (((yb - ya) * 1048576) div (xb - xa)) * xa"
        ).alias("b_q"),
    )
    resid_ok = (
        F.abs(
            F.col("yc") * F.lit(1048576)
            - (F.col("m_q") * F.col("sx") + F.col("b_q"))
        )
        <= F.lit(_RANSAC_THR * 1048576)
    )
    scored = (
        items.crossJoin(F.broadcast(lines))
        .groupBy("t", "m_q", "b_q")
        .agg(F.sum(F.when(resid_ok, 1).otherwise(0)).alias("n_inliers"))
    )
    winner = scored.orderBy(F.desc("n_inliers"), F.asc("t")).limit(1)
    refit = (
        items.crossJoin(F.broadcast(winner))
        .filter(resid_ok)
        .agg(
            F.count("*").alias("n_in"),
            F.sum("sx").alias("s_x"),
            F.sum("yc").alias("s_y"),
            F.sum(F.col("sx") * F.col("yc")).alias("s_xy"),
            F.sum(F.col("sx") * F.col("sx")).alias("s_xx"),
        )
    )
    np_ = items.agg(F.count("*").alias("n_points"))
    out = winner.crossJoin(F.broadcast(refit)).crossJoin(F.broadcast(np_))
    nd = F.col("n_in").cast("double")
    sx = F.col("s_x").cast("double")
    sy = F.col("s_y").cast("double")
    slope = (nd * F.col("s_xy").cast("double") - sx * sy) / (
        nd * F.col("s_xx").cast("double") - sx * sx
    )
    return out.select(
        F.col("t").alias("cand"),
        "m_q",
        "b_q",
        "n_inliers",
        "n_points",
        (F.col("n_inliers").cast("double") / F.col("n_points").cast("double"))
        .alias("inlier_frac"),
        slope.alias("refit_slope"),
        ((sy - slope * sx) / nd).alias("refit_intercept"),
    )


# --- SPRT sequential A/B monitoring boundary ----------------------------------

# Wald SPRT on the per-event purchase indicator, one test per hash
# variant: H0 rate = 0.15 vs H1 rate = 0.25, alpha = beta = 0.05
# (boundaries +-log2(19)). The per-event log-likelihood increments are
# FIXED literals quantized to 2^20 (the periodogram LUT stance — the
# quantized constant IS the spec), so the running LLR is an exact
# BIGINT prefix sum and the crossing day is integer-comparable on both
# engines. W1 = round(2^20*log2(.25/.15)), W0 = round(2^20*log2(.75/.85)).
_SPRT_W1 = 772764
_SPRT_W0 = -189344
_SPRT_UP = 4454275  # round(2^20 * log2(19))

_SPRT_VAR = (
    "CAST('0x' || substr(md5('ab_' || CAST(user_id AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 2"
)

SPRT_ORACLE = f"""
WITH ev AS (
    SELECT {_SPRT_VAR} AS variant,
           epoch_us(ts) // 86400000000 AS day,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
    FROM events
),
daily AS (
    SELECT variant, day, CAST(COUNT(*) AS BIGINT) AS n_d,
           CAST(SUM(conv) AS BIGINT) AS c_d
    FROM ev GROUP BY variant, day
),
cum AS (
    SELECT variant, day, n_d, c_d,
           CAST(SUM(n_d) OVER w AS BIGINT) AS cn,
           CAST(SUM(c_d) OVER w AS BIGINT) AS cc
    FROM daily WINDOW w AS (PARTITION BY variant ORDER BY day
                            ROWS UNBOUNDED PRECEDING)
),
llr AS (
    SELECT variant, day, cn, cc,
           cc * {_SPRT_W1} + (cn - cc) * {_SPRT_W0} AS llr_scaled
    FROM cum
)
SELECT variant,
       MAX(cn) AS n_events, MAX(cc) AS n_conv,
       CAST(MAX_BY(llr_scaled, day) AS BIGINT) AS llr_final_scaled,
       CAST(MAX_BY(llr_scaled, day) AS DOUBLE) / 1048576.0
           AS llr_final_bits,
       MIN(CASE WHEN llr_scaled >= {_SPRT_UP} THEN day END) AS first_up_day,
       MIN(CASE WHEN llr_scaled <= -{_SPRT_UP} THEN day END)
           AS first_down_day,
       CASE WHEN MIN(CASE WHEN llr_scaled >= {_SPRT_UP} THEN day END)
                 IS NOT NULL
             AND (MIN(CASE WHEN llr_scaled <= -{_SPRT_UP} THEN day END)
                      IS NULL
                  OR MIN(CASE WHEN llr_scaled >= {_SPRT_UP} THEN day END)
                     <= MIN(CASE WHEN llr_scaled <= -{_SPRT_UP} THEN day END))
            THEN 'accept_h1'
            WHEN MIN(CASE WHEN llr_scaled <= -{_SPRT_UP} THEN day END)
                 IS NOT NULL
            THEN 'accept_h0' ELSE 'continue' END AS decision
FROM llr GROUP BY variant ORDER BY variant
"""


@register("sprt_ab_boundary", SPRT_ORACLE)
def q_sprt_ab_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT sequential monitor per experiment arm: the running
    log-likelihood ratio of 'purchase rate is 0.25' vs 'purchase rate
    is 0.15' over the event stream, with the day each arm first crosses
    the +-log2(19) decision boundary (alpha = beta = 0.05) — the
    always-valid sequential test an experimentation platform runs so it
    can STOP early instead of waiting for a fixed horizon (fixed-horizon
    inference lives in ab_test_welch; this is its streaming sibling).

    Determinism: per-event LLR increments are literal 2^20-scaled
    integers, the running LLR is an exact BIGINT prefix sum (day grain,
    one PARTITIONED window per arm over the calendar-bounded daily
    frame), and boundary crossings are integer comparisons — no float
    threshold can flip engines. int64-safe while events-per-arm
    * 772764 < 2^63 (~1.2e13 events/arm).

    Scale: one keyed (variant, day) aggregate over events, then a
    calendar-bounded window; output is one row per arm. Reference
    tie-in: per-key count/merge (W7-W8, src/word_count.rs:96-118)
    driving the sequential-analysis head."""
    ev = load_table(spark, sf_dir, "events").select(
        F.pmod(
            hex_hash64(
                F.concat(F.lit("ab_"), F.col("user_id").cast("string"))
            ),
            F.lit(2),
        ).alias("variant"),
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("conv"),
    )
    daily = ev.groupBy("variant", "day").agg(
        F.count("*").alias("n_d"), F.sum("conv").alias("c_d")
    )
    w = (
        Window.partitionBy("variant")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = daily.select(
        "variant",
        "day",
        F.sum("n_d").over(w).alias("cn"),
        F.sum("c_d").over(w).alias("cc"),
    )
    llr = cum.select(
        "variant",
        "day",
        "cn",
        "cc",
        (
            F.col("cc") * F.lit(_SPRT_W1)
            + (F.col("cn") - F.col("cc")) * F.lit(_SPRT_W0)
        ).alias("llr_scaled"),
    )
    up = F.min(
        F.when(F.col("llr_scaled") >= _SPRT_UP, F.col("day"))
    )
    down = F.min(
        F.when(F.col("llr_scaled") <= -_SPRT_UP, F.col("day"))
    )
    return (
        llr.groupBy("variant")
        .agg(
            F.max("cn").alias("n_events"),
            F.max("cc").alias("n_conv"),
            F.max_by("llr_scaled", "day").alias("llr_final_scaled"),
            (
                F.max_by("llr_scaled", "day").cast("double")
                / F.lit(1048576.0)
            ).alias("llr_final_bits"),
            up.alias("first_up_day"),
            down.alias("first_down_day"),
            F.when(
                up.isNotNull() & (down.isNull() | (up <= down)),
                F.lit("accept_h1"),
            )
            .when(down.isNotNull(), F.lit("accept_h0"))
            .otherwise(F.lit("continue"))
            .alias("decision"),
        )
        .orderBy("variant")
    )


# --- exact Kendall tau-b per brand (2-D suffix sums on the value grid) --------

# Kendall rank correlation between quantity and discount per brand,
# EXACT at any scale: both variables live on tiny integer domains
# (qty 1..50, discount 0..10 cents-of-rate), so concordant/discordant
# pair counts come from the 50x11 JOINT CONTINGENCY grid per brand —
# two cumulative windows give the 2-D suffix sums S>(x,y) (and the
# mixed S<(x,y) for discordant), and C = sum n_xy * S>(x,y) is pure
# integer. tau-b = (C - D) / (sqrt(n2 - Tx) * sqrt(n2 - Ty)) is a
# sqrt-only double expression (wilson-CI class: engine-identical), with
# n2 = n(n-1)/2 and the usual tie corrections.

KENDALL_ORACLE = """
WITH obs AS (
    SELECT p.p_brand AS brand,
           CAST(l.l_quantity AS BIGINT) AS x,
           CAST(round(l.l_discount * 100) AS BIGINT) AS y
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
grid AS (
    SELECT b.brand, gx.x, gy.y FROM
        (SELECT DISTINCT brand FROM obs) b,
        (SELECT unnest(generate_series(1, 50)) AS x) gx,
        (SELECT unnest(generate_series(0, 10)) AS y) gy
),
cells AS (
    SELECT g.brand, g.x, g.y,
           CAST(COALESCE(o.n, 0) AS BIGINT) AS n
    FROM grid g LEFT JOIN (
        SELECT brand, x, y, COUNT(*) AS n FROM obs GROUP BY 1, 2, 3
    ) o ON o.brand = g.brand AND o.x = g.x AND o.y = g.y
),
sufy AS (  -- sum over y' > y within (brand, x)
    SELECT brand, x, y, n,
           SUM(n) OVER (PARTITION BY brand, x ORDER BY y DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS sy_gt,
           SUM(n) OVER (PARTITION BY brand, x ORDER BY y ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS sy_lt
    FROM cells
),
suf2 AS (  -- then sum those over x' > x within (brand, y)
    SELECT brand, x, y, n,
           SUM(COALESCE(sy_gt, 0)) OVER (
               PARTITION BY brand, y ORDER BY x DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s_cc,
           SUM(COALESCE(sy_lt, 0)) OVER (
               PARTITION BY brand, y ORDER BY x DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s_dd
    FROM sufy
),
cd AS (
    SELECT brand,
           CAST(SUM(n * COALESCE(s_cc, 0)) AS BIGINT) AS c_pairs,
           CAST(SUM(n * COALESCE(s_dd, 0)) AS BIGINT) AS d_pairs
    FROM suf2 GROUP BY brand
),
ties AS (
    SELECT brand,
           CAST(SUM(n) AS BIGINT) AS n_obs,
           CAST(SUM(n * (n - 1)) AS BIGINT) // 2 AS t_xy
    FROM cells GROUP BY brand
),
tx AS (
    SELECT brand, CAST(SUM(rn * (rn - 1)) AS BIGINT) // 2 AS t_x FROM (
        SELECT brand, x, SUM(n) AS rn FROM cells GROUP BY 1, 2
    ) GROUP BY brand
),
ty AS (
    SELECT brand, CAST(SUM(cn * (cn - 1)) AS BIGINT) // 2 AS t_y FROM (
        SELECT brand, y, SUM(n) AS cn FROM cells GROUP BY 1, 2
    ) GROUP BY brand
)
SELECT cd.brand, t.n_obs, cd.c_pairs, cd.d_pairs,
       CAST(cd.c_pairs - cd.d_pairs AS DOUBLE)
           / (sqrt(CAST(t.n_obs * (t.n_obs - 1) // 2 - tx.t_x AS DOUBLE))
              * sqrt(CAST(t.n_obs * (t.n_obs - 1) // 2 - ty.t_y AS DOUBLE)))
           AS tau_b
FROM cd
JOIN ties t USING (brand)
JOIN tx USING (brand)
JOIN ty USING (brand)
ORDER BY brand
"""


@register("kendall_tau_qty_discount", KENDALL_ORACLE)
def q_kendall_tau_qty_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall tau-b between quantity and discount per brand — the
    rank-correlation companion of lineitem_correlation_matrix's Pearson
    view, robust to the uniform marginals.

    Scale: concordant/discordant pair counts come from the DENSE 50x11
    contingency grid per brand (two cumulative windows = 2-D suffix
    sums; every window partition is a <= 50-row value-domain frame), so
    the n^2 pair space never materializes. Counts stay BIGINT; tau-b is
    a sqrt-only double expression (engine-identical)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    obs = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        F.col("p_brand").alias("brand"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_discount") * 100).cast("long").alias("y"),
    )
    counts = obs.groupBy("brand", "x", "y").agg(
        F.count("*").cast("long").alias("n")
    )
    grid = (
        obs.select("brand")
        .distinct()
        .select(
            "brand",
            F.explode(F.sequence(F.lit(1), F.lit(50))).alias("x"),
        )
        .select(
            "brand",
            "x",
            F.explode(F.sequence(F.lit(0), F.lit(10))).alias("y"),
        )
    )
    # counts is VALUE-DOMAIN bounded (|brands| x 50 x 11 <= 13,750 rows at
    # ANY SF) — broadcast beats the planner's sort-merge pick (round 8).
    cells = grid.join(F.broadcast(counts), ["brand", "x", "y"], "left").select(
        "brand",
        "x",
        "y",
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
    )
    row_pre = Window.partitionBy("brand", "x").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sufy = cells.select(
        "brand",
        "x",
        "y",
        "n",
        F.sum("n").over(row_pre.orderBy(F.desc("y"))).alias("sy_gt"),
        F.sum("n").over(row_pre.orderBy(F.asc("y"))).alias("sy_lt"),
    )
    col_pre = Window.partitionBy("brand", "y").rowsBetween(
        Window.unboundedPreceding, -1
    )
    suf2 = sufy.select(
        "brand",
        "x",
        "y",
        "n",
        F.sum(F.coalesce(F.col("sy_gt"), F.lit(0)))
        .over(col_pre.orderBy(F.desc("x")))
        .alias("s_cc"),
        F.sum(F.coalesce(F.col("sy_lt"), F.lit(0)))
        .over(col_pre.orderBy(F.desc("x")))
        .alias("s_dd"),
    )
    cells = cells.persist()  # cd grid + tie margins all read it
    cd = suf2.groupBy("brand").agg(
        F.sum(F.col("n") * F.coalesce(F.col("s_cc"), F.lit(0)))
        .cast("long")
        .alias("c_pairs"),
        F.sum(F.col("n") * F.coalesce(F.col("s_dd"), F.lit(0)))
        .cast("long")
        .alias("d_pairs"),
    )
    ties = cells.groupBy("brand").agg(
        F.sum("n").cast("long").alias("n_obs")
    )
    tx = (
        cells.groupBy("brand", "x")
        .agg(F.sum("n").alias("rn"))
        .groupBy("brand")
        .agg(
            F.expr("CAST(sum(rn * (rn - 1)) div 2 AS BIGINT)").alias("t_x")
        )
    )
    ty = (
        cells.groupBy("brand", "y")
        .agg(F.sum("n").alias("cn"))
        .groupBy("brand")
        .agg(
            F.expr("CAST(sum(cn * (cn - 1)) div 2 AS BIGINT)").alias("t_y")
        )
    )
    n2 = F.expr("CAST(n_obs * (n_obs - 1) div 2 AS BIGINT)")
    return (
        # one row per brand on every side — broadcast the margins
        cd.join(F.broadcast(ties), "brand")
        .join(F.broadcast(tx), "brand")
        .join(F.broadcast(ty), "brand")
        .select(
            "brand",
            "n_obs",
            "c_pairs",
            "d_pairs",
            (
                (F.col("c_pairs") - F.col("d_pairs")).cast("double")
                / (
                    F.sqrt((n2 - F.col("t_x")).cast("double"))
                    * F.sqrt((n2 - F.col("t_y")).cast("double"))
                )
            ).alias("tau_b"),
        )
        .orderBy("brand")
    )
