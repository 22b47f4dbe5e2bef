"""Model-eval + trend analytics: keyed RANGE frames, bucket-exact ROC
AUC / KS separability, Markov transition matrices, per-group OLS trends.

These are the evaluation-side operators of a training-data pipeline:
once quality scores / classifiers exist (operators.text_analysis,
operators.curation), the pipeline needs to MEASURE them — AUC/KS of a
score against an outcome, transition structure of behavioural streams,
and trend fits over time — all expressed as exact integer/decimal
dataflow so the DuckDB oracle hash-matches bit-for-bit.

Reference tie-in: every query is the reference's VecOp per-key
reduction capability (src/op.rs:100-130, src/word_count.rs:121-127)
over derived keys; no new physical primitive is required.

Scale notes: AUC/KS run on the *distinct-score histogram* (score
quantization is the standard trick — here l_discount is already
11-valued; a continuous score would be binned first exactly like
approx_median_hist). The cumulative inequality self-join therefore
touches O(#buckets^2) rows, independent of data volume. The RANGE
window and the transition lead() are keyed (customer / user). The OLS
sums are plain decimal aggregates; the final slope arithmetic is a
fixed double expression evaluated identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.agg import dec
from amorphous_mapreduce_spark.functions.hashing import hex_hash64
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- keyed RANGE frame: orders in the customer's prior 90 days ------------

PRIOR_90D_ORACLE = """
WITH o AS (
    SELECT o_orderkey, o_custkey,
           CAST(datediff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS INT) AS day
    FROM orders
)
SELECT o_orderkey, o_custkey, day,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
                           RANGE BETWEEN 90 PRECEDING
                                     AND 1 PRECEDING) AS BIGINT)
           AS prior_orders
FROM o
"""


@register("orders_prior_90d", PRIOR_90D_ORACLE)
def q_orders_prior_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order count of the same customer's orders in the preceding
    90 days — a keyed RANGE window frame on integer day numbers (the
    purchase-frequency feature shape). Keyed by customer: no global
    sort, partition cardinality bounded by per-customer order count."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01")).alias("day"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-90, -1)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day",
        F.count(F.lit(1)).over(w).alias("prior_orders"),
    )


# --- bucket-exact ROC AUC + KS: does discount predict returns? ------------

SEPARABILITY_ORACLE = """
WITH scored AS (
    SELECT l_discount AS score,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS is_pos
    FROM lineitem
), hist AS (
    SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(is_pos) AS BIGINT) AS pos_n
    FROM scored GROUP BY score
), cum AS (
    SELECT h.score, h.n, h.pos_n,
           CAST(COALESCE(SUM(h2.n), 0) AS BIGINT) AS cum_b,
           CAST(COALESCE(SUM(h2.pos_n), 0) AS BIGINT) AS cum_pos_b
    FROM hist h LEFT JOIN hist h2 ON h2.score < h.score
    GROUP BY h.score, h.n, h.pos_n
), tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS ntot,
           CAST(SUM(pos_n) AS BIGINT) AS np
    FROM hist
), cells AS (
    SELECT c.pos_n * (2 * c.cum_b + c.n + 1) AS s2_c,
           ABS((c.cum_pos_b + c.pos_n) * (t.ntot - t.np)
               - ((c.cum_b + c.n) - (c.cum_pos_b + c.pos_n)) * t.np)
               AS d_num,
           t.np AS np, t.ntot - t.np AS nn
    FROM cum c CROSS JOIN tot t
)
SELECT np, nn,
       CAST(SUM(s2_c) - np * (np + 1) AS BIGINT) AS u2,
       CAST(SUM(s2_c) - np * (np + 1) AS BIGINT)
           / CAST(2 * np * nn AS BIGINT) AS auc,
       CAST(MAX(d_num) AS BIGINT) AS ks_num,
       CAST(MAX(d_num) AS BIGINT) / CAST(np * nn AS BIGINT) AS ks
FROM cells GROUP BY np, nn
"""


@register("discount_return_separability", SEPARABILITY_ORACLE)
def q_discount_return_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC (Mann-Whitney U with midrank ties, kept as the
    integer 2*U) and KS statistic of l_discount as a predictor of
    returns. Runs entirely on the distinct-score histogram: ranks come
    from bucket cumulations (inequality self-join over O(#buckets)
    rows), never a global row sort — the scale path for AUC at 100 TB
    (continuous scores would be fixed-width-binned first)."""
    scored = _t(spark, sf_dir, "lineitem").select(
        F.col("l_discount").alias("score"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_pos"),
    )
    hist = (
        scored.groupBy("score")
        .agg(F.count("*").alias("n"), F.sum("is_pos").cast("long").alias("pos_n"))
        .persist()
    )
    h2 = hist.select(
        F.col("score").alias("score2"),
        F.col("n").alias("n2"),
        F.col("pos_n").alias("pos2"),
    )
    cum = (
        hist.join(h2, F.col("score2") < F.col("score"), "left")
        .groupBy("score", "n", "pos_n")
        .agg(
            F.coalesce(F.sum("n2"), F.lit(0)).cast("long").alias("cum_b"),
            F.coalesce(F.sum("pos2"), F.lit(0)).cast("long").alias("cum_pos_b"),
        )
    )
    tot = hist.agg(
        F.sum("n").cast("long").alias("ntot"),
        F.sum("pos_n").cast("long").alias("np"),
    )
    cells = cum.crossJoin(F.broadcast(tot)).select(
        (F.col("pos_n") * (2 * F.col("cum_b") + F.col("n") + 1)).alias("s2_c"),
        F.abs(
            (F.col("cum_pos_b") + F.col("pos_n")) * (F.col("ntot") - F.col("np"))
            - ((F.col("cum_b") + F.col("n")) - (F.col("cum_pos_b") + F.col("pos_n")))
            * F.col("np")
        ).alias("d_num"),
        F.col("np"),
        (F.col("ntot") - F.col("np")).alias("nn"),
    )
    u2 = (F.sum("s2_c") - F.col("np") * (F.col("np") + 1)).cast("long")
    ks_num = F.max("d_num").cast("long")
    return cells.groupBy("np", "nn").agg(
        u2.alias("u2"),
        (u2 / (2 * F.col("np") * F.col("nn")).cast("long")).alias("auc"),
        ks_num.alias("ks_num"),
        (ks_num / (F.col("np") * F.col("nn")).cast("long")).alias("ks"),
    )


# --- Markov transition matrix over the event stream -----------------------

TRANSITIONS_ORACLE = """
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
), seq AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS to_type
    FROM ev
), trans AS (
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
), tot AS (
    SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS from_total
    FROM trans GROUP BY from_type
)
SELECT t.from_type, t.to_type, t.n_trans,
       t.n_trans / o.from_total AS p
FROM trans t JOIN tot o USING (from_type)
"""


@register("event_transitions", TRANSITIONS_ORACLE)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user —
    lead() over a keyed (user) window on epoch-µs order, then two hash
    aggregations; p is one deterministic double division. The
    user-journey model behind next-event prediction features."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_trans")
    )
    tot = trans.groupBy("from_type").agg(
        F.sum("n_trans").cast("long").alias("from_total")
    )
    return trans.join(tot, "from_type").select(
        "from_type",
        "to_type",
        "n_trans",
        (F.col("n_trans") / F.col("from_total")).alias("p"),
    )


# --- per-nation OLS trend of daily revenue --------------------------------

TREND_ORACLE = """
WITH daily AS (
    SELECT n_name AS nation,
           CAST(datediff('day', DATE '1970-01-01',
                         CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, day
), sums AS (
    SELECT nation,
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(CAST(SUM(day) AS BIGINT) AS DOUBLE) AS sx,
           CAST(SUM(rev) AS DOUBLE) AS sy,
           CAST(CAST(SUM(day * day) AS BIGINT) AS DOUBLE) AS sxx,
           -- scaled-BIGINT two-step: Sxy exceeds 2^52 scaled cents at
           -- sf1, where DuckDB's decimal->double cast double-rounds
           CAST(CAST(SUM(day * rev) * 100 AS BIGINT) AS DOUBLE) / 100.0
               AS sxy
    FROM daily GROUP BY nation
)
SELECT nation, CAST(n AS BIGINT) AS n_days,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
           AS intercept
FROM sums
"""


@register("nation_revenue_trend", TREND_ORACLE)
def q_nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation least-squares trend (slope + intercept) of daily order
    revenue: decimal-exact sufficient statistics (n, Sx, Sy, Sxx, Sxy)
    from two keyed aggregations, then a fixed double expression — the
    closed-form distributed OLS that replaces any iterative fit. Dims
    broadcast; no windows."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    daily = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day"),
            dec("o_totalprice", "decimal(18,2)").alias("price"),
        )
        .groupBy("nation", "day")
        .agg(F.sum("price").alias("rev"))
    )
    sums = daily.groupBy("nation").agg(
        F.count("*").cast("double").alias("n"),
        F.sum("day").cast("double").alias("sx"),
        F.sum("rev").cast("double").alias("sy"),
        F.sum(F.col("day") * F.col("day")).cast("double").alias("sxx"),
        # scaled-BIGINT two-step (see oracle note): identical double
        # rounding on both engines past 2^52 scaled cents
        (
            (F.sum(F.col("day") * F.col("rev")) * F.lit(100))
            .cast("long")
            .cast("double")
            / F.lit(100.0)
        ).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "nation",
        F.col("n").cast("long").alias("n_days"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )


# --- per-label embedding centroid drift -------------------------------------

DRIFT_QUANT = 1000

DRIFT_ORACLE = f"""
WITH q AS (
    SELECT label, vec_id % 2 AS half,
           generate_subscripts(embedding, 1) AS dim,
           CAST(round(CAST(unnest(embedding) AS DOUBLE) * {DRIFT_QUANT})
                AS BIGINT) AS qx
    FROM embeddings
), s AS (
    SELECT label, half, dim, CAST(SUM(qx) AS BIGINT) AS s, COUNT(*) AS n
    FROM q GROUP BY label, half, dim
)
SELECT e.label, MAX(e.n) AS n_even, MAX(o.n) AS n_odd,
       CAST(SUM(ABS(e.s * o.n - o.s * e.n)) AS BIGINT) AS drift_l1_scaled
FROM s e JOIN s o ON e.label = o.label AND e.dim = o.dim
WHERE e.half = 0 AND o.half = 1
GROUP BY e.label
"""


@register("label_centroid_drift", DRIFT_ORACLE)
def q_label_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per label, the L1 distance between the
    even-id and odd-id half-corpus centroids, kept exact by comparing
    cross-multiplied sums (|s1*n2 - s2*n1| = n1*n2 * |mean1 - mean2| per
    dim) instead of dividing — no float ever enters the pipeline.

    The per-(label, half, dim) sums are one keyed aggregate over the
    exploded (row x dim) stream — embarrassingly parallel at any scale;
    the drift join matches |labels| x |dims| rows. Same integer
    quantization as operators/kmeans.py (round(x*1000))."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x * DRIFT_QUANT).cast("long"),
            )
        ).alias("dim", "qx"),
    )
    s = q.groupBy("label", "half", "dim").agg(
        F.sum("qx").alias("s"), F.count("*").alias("n")
    )
    e = s.filter(F.col("half") == 0).select(
        "label", "dim", F.col("s").alias("s_e"), F.col("n").alias("n_e")
    )
    o = s.filter(F.col("half") == 1).select(
        "label", "dim", F.col("s").alias("s_o"), F.col("n").alias("n_o")
    )
    return (
        e.join(o, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.max("n_e").alias("n_even"),
            F.max("n_o").alias("n_odd"),
            F.sum(
                F.abs(F.col("s_e") * F.col("n_o") - F.col("s_o") * F.col("n_e"))
            ).alias("drift_l1_scaled"),
        )
    )


# --- exact embedding Gram matrix (PCA / covariance prep) --------------------

GRAM_QUANT = 1000

GRAM_ORACLE = f"""
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(round(CAST(unnest(embedding) AS DOUBLE) * {GRAM_QUANT})
                AS BIGINT) AS qx
    FROM embeddings
)
SELECT a.dim AS i, b.dim AS j,
       CAST(SUM(a.qx * b.qx) AS BIGINT) AS gram_q,
       COUNT(*) AS n_rows
FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim
"""


@register("embedding_gram", GRAM_ORACLE)
def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gram matrix EᵀE of the embedding corpus (upper triangle,
    d(d+1)/2 rows) — the sufficient statistic for covariance/PCA/whitening
    and the all-rows analogue of the reference's rank-k outer-product
    accumulation (G6, src/outer_product.rs:146-169): EᵀE = Σ_rows e·eᵀ.

    Integer-quantized (round(x*1000), the operators/kmeans.py convention)
    so the cross-row sum is order-independent and bit-identical in both
    engines — no float accumulation ever happens.

    Scale: the per-row d²/2 fan-out feeds a map-side-combined hash
    aggregate keyed on (i, j), so each partition emits at most d(d+1)/2
    partial rows regardless of row count — the shuffle is
    #partitions x d², never O(rows). repartition() first because the
    single-file fixture would otherwise run the fan-out on one core."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(32)
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * GRAM_QUANT).cast("long"),
        ).alias("qarr"),
    )
    a = q.select("vec_id", "qarr", F.posexplode("qarr").alias("i", "qi"))
    b = a.select(
        "i", "qi", F.posexplode("qarr").alias("j", "qj")
    ).filter(F.col("j") >= F.col("i"))
    return b.groupBy("i", "j").agg(
        F.sum(F.col("qi") * F.col("qj")).alias("gram_q"),
        F.count("*").alias("n_rows"),
    )


# --- exact rank-biased overlap between two rankings -------------------------

# RBO@20 with dyadic weights, made exact: metric = Σ_d 2^(20-d)·L·ov_d/d
# with L = lcm(1..20), so every term is an integer. Each item common to
# both top-20 lists contributes W(max(rank_a, rank_b)) where
# W(m) = Σ_{d=m..20} 2^(20-d)·L/d — 20 precomputed integer literals.
# Perfect agreement sums to _RBO_DENOM; rbo = rbo_scaled / denom in [0,1].
_RBO_K = 20
_RBO_L = 232792560  # lcm(1..20)
_RBO_W = {
    m: sum((1 << (_RBO_K - d)) * (_RBO_L // d) for d in range(m, _RBO_K + 1))
    for m in range(1, _RBO_K + 1)
}
_RBO_DENOM = sum((1 << (_RBO_K - d)) * _RBO_L for d in range(1, _RBO_K + 1))

_W_CASE = "CASE m " + " ".join(
    f"WHEN {m} THEN {w}" for m, w in _RBO_W.items()
) + " END"

RBO_ORACLE = f"""
WITH pr AS (
    SELECT l_partkey AS p,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev,
           SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
    FROM lineitem GROUP BY l_partkey
),
ta AS (
    SELECT p, ROW_NUMBER() OVER (ORDER BY rev DESC, p ASC) AS ra
    FROM pr ORDER BY rev DESC, p ASC LIMIT {_RBO_K}
),
tb AS (
    SELECT p, ROW_NUMBER() OVER (ORDER BY qty DESC, p ASC) AS rb
    FROM pr ORDER BY qty DESC, p ASC LIMIT {_RBO_K}
),
common AS (
    SELECT GREATEST(ta.ra, tb.rb) AS m FROM ta JOIN tb USING (p)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_common,
       CAST(COALESCE(SUM({_W_CASE}), 0) AS BIGINT) AS rbo_scaled,
       CAST({_RBO_DENOM} AS BIGINT) AS rbo_denom
FROM common
"""


@register("rbo_rankings", RBO_ORACLE)
def q_rbo_rankings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap (RBO@20, p = 1/2) between two part rankings —
    by revenue vs by shipped quantity — the top-weighted ranking-
    similarity metric an eval harness uses to compare retrieval or
    scoring variants, made EXACT: dyadic weights times lcm(1..20) turn
    every term into an integer, so rbo = rbo_scaled / rbo_denom with no
    float anywhere.

    Scale: the per-part aggregate is one keyed pass; both top-20s are
    distributed TakeOrderedAndProject; everything after operates on
    <= 20 rows. Deterministic total-order tie-breaks on both rankings."""
    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(dec("l_extendedprice")).alias("rev"),
        F.sum(dec("l_quantity")).alias("qty"),
    )
    ta = (
        pr.orderBy(F.desc("rev"), F.asc("p"))
        .limit(_RBO_K)
        .select(
            "p",
            F.row_number()
            .over(Window.orderBy(F.desc("rev"), F.asc("p")))
            .alias("ra"),
        )
    )
    tb = (
        pr.orderBy(F.desc("qty"), F.asc("p"))
        .limit(_RBO_K)
        .select(
            "p",
            F.row_number()
            .over(Window.orderBy(F.desc("qty"), F.asc("p")))
            .alias("rb"),
        )
    )
    common = ta.join(tb, "p").select(
        F.greatest(F.col("ra"), F.col("rb")).alias("m")
    )
    return common.agg(
        F.count("*").alias("n_common"),
        F.coalesce(F.sum(F.expr(_W_CASE)), F.lit(0)).cast("long").alias("rbo_scaled"),
        F.lit(_RBO_DENOM).cast("long").alias("rbo_denom"),
    )


# --- cumulative gains / decile lift table ----------------------------------

GAINS_ORACLE = """
WITH rev AS (
    SELECT o_custkey AS c,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS cents
    FROM orders GROUP BY 1
),
cust AS (
    SELECT c_custkey AS c, c_acctbal, COALESCE(rev.cents, 0) AS cents
    FROM customer LEFT JOIN rev ON customer.c_custkey = rev.c
),
ranked AS (
    SELECT c, cents,
           ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c) AS rnk
    FROM cust
),
tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM ranked
),
dec AS (
    SELECT ((rnk - 1) * 10) // n AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS decile_cents
    FROM ranked CROSS JOIN tot
    GROUP BY decile, n
)
SELECT decile, n_customers, decile_cents,
       CAST(SUM(decile_cents) OVER (ORDER BY decile) AS BIGINT) AS cum_cents,
       CAST(decile_cents AS DOUBLE) / CAST(t.total_cents AS DOUBLE)
           AS revenue_share,
       CAST(SUM(decile_cents) OVER (ORDER BY decile) AS DOUBLE)
           / CAST(t.total_cents AS DOUBLE) AS cum_gain,
       (CAST(decile_cents AS DOUBLE) * CAST(t.n AS DOUBLE))
       / (CAST(t.total_cents AS DOUBLE) * CAST(n_customers AS DOUBLE))
           AS lift
FROM dec CROSS JOIN tot t
"""


@register("acctbal_revenue_gains", GAINS_ORACLE)
def q_acctbal_revenue_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-gains / decile-lift table: rank customers by account
    balance (the 'model score'), tabulate how much realized order
    revenue each score decile captures, with cumulative gain and lift
    vs the uniform baseline — the marketing/model-eval chart behind
    every targeting decision.

    Scale: ranks come from the distributed prefix-sum template (range
    sort + partition partials, no single-partition window over
    customers); revenue is an exact decimal-cents aggregate; deciles
    reduce to a 10-row frame whose cumulative window is constant-size.
    The 1-row (n, total) scalar crosses back — the standard
    scalar-total pattern. All shares/lifts are single IEEE ops over
    exact integers, so DuckDB hash-matches them."""
    from amorphous_mapreduce_spark.operators.corpus_stats import (
        distributed_prefix_sum,
    )

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rev = (
        orders.select(
            F.col("o_custkey").alias("c"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("c")
        .agg(F.sum("cents").alias("cents"))
    )
    cust = (
        customer.select(F.col("c_custkey").alias("c"), "c_acctbal")
        .join(rev, "c", "left")
        .select("c", "c_acctbal", F.coalesce("cents", F.lit(0)).alias("cents"))
    )
    ranked = distributed_prefix_sum(
        cust, "cents", [F.desc("c_acctbal"), F.asc("c")], rank_col="rnk",
        cum_col="cum",
    )
    tot = ranked.agg(
        F.count("*").alias("n"), F.sum("cents").alias("total_cents")
    )
    dec_rows = (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.expr("((rnk - 1) * 10) div n").alias("decile"),
            "cents",
            "cum",
            "n",
            "total_cents",
        )
        .groupBy("decile", "n", "total_cents")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cents").alias("decile_cents"),
            F.max("cum").alias("cum_cents"),
        )
    )
    td = F.col("total_cents").cast("double")
    return dec_rows.select(
        "decile",
        "n_customers",
        "decile_cents",
        "cum_cents",
        (F.col("decile_cents").cast("double") / td).alias("revenue_share"),
        (F.col("cum_cents").cast("double") / td).alias("cum_gain"),
        (
            (F.col("decile_cents").cast("double") * F.col("n").cast("double"))
            / (td * F.col("n_customers").cast("double"))
        ).alias("lift"),
    )


# --- power iteration: top principal direction of the embedding Gram --------

PI_ITERS = 8
PI_SCALE = 4096  # target magnitude of the fixed-point eigenvector


def _pi_oracle() -> str:
    ctes = [
        f"""q AS MATERIALIZED (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(round(CAST(unnest(embedding) AS DOUBLE) * {GRAM_QUANT})
                AS BIGINT) AS qx
    FROM embeddings
)""",
        """g AS MATERIALIZED (
    SELECT a.dim AS i, b.dim AS j, CAST(SUM(a.qx * b.qx) AS BIGINT) AS g
    FROM q a JOIN q b ON a.vec_id = b.vec_id
    GROUP BY a.dim, b.dim
)""",
        f"""v0 AS MATERIALIZED (
    SELECT DISTINCT i AS dim, CAST({PI_SCALE} AS BIGINT) AS v FROM g
)""",
    ]
    for k in range(1, PI_ITERS + 1):
        ctes.append(
            f"""gv{k} AS MATERIALIZED (
    SELECT g.i AS dim, CAST(SUM(g.g * v.v) AS BIGINT) AS gv
    FROM g JOIN v{k - 1} v ON g.j = v.dim
    GROUP BY g.i
)"""
        )
        ctes.append(
            f"""v{k} AS MATERIALIZED (
    SELECT dim,
           gv // GREATEST(1, (SELECT MAX(ABS(gv)) FROM gv{k}) // {PI_SCALE})
               AS v
    FROM gv{k}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT dim, v AS v_q FROM v{PI_ITERS}"
    )


POWER_ITER_ORACLE = _pi_oracle()


@register("embedding_power_iteration", POWER_ITER_ORACLE)
def q_embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding Gram matrix via
    fixed-point power iteration — the distributed-PCA first step.
    The Gram (d x d, corpus-size independent — the ONLY data-sized
    stage, same kernel as embedding_gram) is iterated 8 times:
    v <- (G v) // max-rescale, all in BIGINT. The rescale divisor is
    data-dependent but integer-exact, and Spark's `div` and DuckDB's
    `//` both truncate toward zero, so every iterate — and hence the
    final quantized eigenvector — is bit-identical cross-engine.

    Scale: after the one corpus-sized Gram aggregate, the post-Gram
    state is corpus-size-INDEPENDENT (d² = 4096 gram rows + the d=64
    vector), so all 8 matvec+rescale rounds run inside ONE grouped
    Arrow kernel — the markov_removal_attribution pattern — instead of
    the 8-job localCheckpoint chain the round-3 verdict measured at
    5.1 s of pure scheduling latency (VERDICT_r03 item 3). Python
    arbitrary-precision ints reproduce the BIGINT arithmetic exactly;
    the truncating rescale guards the sign (gv may be negative and
    Python // floors where Spark `div` truncates toward zero — the
    markov sign guard)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * GRAM_QUANT).cast("long"),
            )
        ).alias("dim", "qx"),
    )
    a = q.select("vec_id", F.col("dim").alias("i"), F.col("qx").alias("ax"))
    b = q.select("vec_id", F.col("dim").alias("j"), F.col("qx").alias("bx"))
    gram = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("g"))
    )

    n_iters, scale = PI_ITERS, PI_SCALE

    def _iterate(pdf):
        import pandas as pd

        rows = [
            (int(i_), int(j_), int(g_))
            for i_, j_, g_ in zip(pdf["i"], pdf["j"], pdf["g"])
        ]
        v = {i_: scale for i_, _, _ in rows}
        for _ in range(n_iters):
            gv: dict[int, int] = {}
            for i_, j_, g_ in rows:
                gv[i_] = gv.get(i_, 0) + g_ * v.get(j_, 0)
            mx = max(abs(x) for x in gv.values())
            d_ = max(1, mx // scale)  # mx >= 0 so // == div here
            # Spark div / DuckDB // truncate toward zero; Python //
            # floors — route negatives through abs to match.
            v = {
                i_: (x // d_ if x >= 0 else -((-x) // d_))
                for i_, x in gv.items()
            }
        return pd.DataFrame(
            {"dim": list(v.keys()), "v_q": [v[k] for k in v]}
        )

    return (
        gram.groupBy(F.lit(0).alias("one"))
        .applyInPandas(_iterate, "dim int, v_q long")
    )


# --- decision stump: optimal split learning ---------------------------------

STUMP_ORACLE = """
WITH norm AS (
    SELECT doc_id, n_chars,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
    FROM documents
),
labeled AS (
    SELECT n.doc_id, n.n_chars,
           CASE WHEN c.n > 1 THEN 1 ELSE 0 END AS is_dup
    FROM norm n
    JOIN (SELECT h, COUNT(*) AS n FROM norm GROUP BY h) c ON n.h = c.h
),
hist AS (
    SELECT n_chars AS x, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(is_dup) AS BIGINT) AS pos
    FROM labeled GROUP BY 1
),
cum AS (
    SELECT x, cnt, pos,
           CAST(SUM(cnt) OVER (ORDER BY x) AS BIGINT) AS n_l,
           CAST(SUM(pos) OVER (ORDER BY x) AS BIGINT) AS pos_l
    FROM hist
),
tot AS (
    SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS npos
    FROM hist
),
scored AS (
    SELECT x AS split_value, n_l, pos_l,
           n - n_l AS n_r, npos - pos_l AS pos_r,
           (CAST(pos_l * (n - n_l) - (npos - pos_l) * n_l AS DOUBLE)
            * CAST(pos_l * (n - n_l) - (npos - pos_l) * n_l AS DOUBLE))
           / (CAST(n_l AS DOUBLE) * CAST(n - n_l AS DOUBLE)) AS gain_score
    FROM cum CROSS JOIN tot
    WHERE n_l < n
)
SELECT split_value, n_l AS n_left, pos_l AS pos_left,
       n_r AS n_right, pos_r AS pos_right, gain_score
FROM scored
ORDER BY gain_score DESC, split_value
LIMIT 1
"""


@register("decision_stump_dup", STUMP_ORACLE)
def q_decision_stump_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn a decision stump IN SQL: the single n_chars threshold that
    best separates exact-duplicate documents from originals, by
    exhaustive split search maximizing the two-sample separation score
    (pos_l*n_r - pos_r*n_l)²/(n_l*n_r) — the chi-square/Gini-gain
    numerator in cross-multiplied integer form. The first tree node of
    any GBDT, learned as a dataflow: histogram -> prefix sums ->
    argmax (exactly how LightGBM's histogram-based splitter works,
    here distributed).

    Exactness: the cross term stays in int64 (cast to double while
    still exact, ≤2^53 at fixture scales); the score is a fixed IEEE
    expression; argmax breaks ties on the smaller threshold. The
    candidate prefix sums ride the distributed prefix-sum template
    with both (count, positives) packed into one 2^20-split integer.

    Scale: label join is one hash aggregate on the content digest; the
    histogram is value-domain sized; no corpus-sized window anywhere."""
    from amorphous_mapreduce_spark.operators.corpus_stats import (
        distributed_prefix_sum,
    )
    from amorphous_mapreduce_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id", "n_chars", F.md5(normalize_text("text")).alias("h")
    )
    groups = norm.groupBy("h").agg(F.count("*").alias("n"))
    labeled = norm.join(groups, "h").select(
        "n_chars", F.when(F.col("n") > 1, 1).otherwise(0).alias("is_dup")
    )
    hist = labeled.groupBy(F.col("n_chars").alias("x")).agg(
        F.count("*").alias("cnt"), F.sum("is_dup").alias("pos")
    )
    packed = hist.select(
        "x",
        "cnt",
        "pos",
        (F.col("cnt") * F.lit(1 << 20) + F.col("pos")).alias("packed"),
    )
    cum = distributed_prefix_sum(packed, "packed", [F.asc("x")], cum_col="c")
    cum = cum.select(
        "x",
        F.expr("c div 1048576").alias("n_l"),
        F.pmod(F.col("c"), F.lit(1 << 20)).alias("pos_l"),
    )
    tot = hist.agg(F.sum("cnt").alias("n"), F.sum("pos").alias("npos"))
    scored = cum.crossJoin(F.broadcast(tot)).filter(F.col("n_l") < F.col("n"))
    num = (
        F.col("pos_l") * (F.col("n") - F.col("n_l"))
        - (F.col("npos") - F.col("pos_l")) * F.col("n_l")
    ).cast("double")
    out = scored.select(
        F.col("x").alias("split_value"),
        F.col("n_l").alias("n_left"),
        F.col("pos_l").alias("pos_left"),
        (F.col("n") - F.col("n_l")).alias("n_right"),
        (F.col("npos") - F.col("pos_l")).alias("pos_right"),
        (
            num * num
            / (
                F.col("n_l").cast("double")
                * (F.col("n") - F.col("n_l")).cast("double")
            )
        ).alias("gain_score"),
    )
    return out.orderBy(F.desc("gain_score"), F.asc("split_value")).limit(1)


# --- leakage-free out-of-fold target encoding --------------------------------

OOF_FOLDS = 5

OOF_ORACLE = f"""
WITH li AS (
    SELECT p.p_brand AS brand,
           CAST('0x' || substr(md5('fold_' || CAST(l.l_orderkey AS VARCHAR)
                               || '_' || CAST(l.l_linenumber AS VARCHAR)),
                1, 15) AS BIGINT) % {OOF_FOLDS} AS fold,
           CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
cell AS (
    SELECT brand, fold,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS pos
    FROM li GROUP BY brand, fold
),
tot AS (
    SELECT brand,
           CAST(SUM(n) AS BIGINT) AS n_tot,
           CAST(SUM(pos) AS BIGINT) AS pos_tot
    FROM cell GROUP BY brand
)
SELECT c.brand, c.fold, c.n AS n_fold, c.pos AS pos_fold,
       CASE WHEN t.n_tot = c.n THEN NULL
            ELSE CAST(t.pos_tot - c.pos AS DOUBLE)
                 / CAST(t.n_tot - c.n AS DOUBLE) END AS oof_encoding
FROM cell c JOIN tot t ON c.brand = t.brand
"""


@register("oof_target_encoding", OOF_ORACLE)
def q_oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-FREE target encoding of brand by return rate: each
    (brand, fold) cell's encoding is computed from the OTHER folds'
    statistics only ((pos_tot - pos_fold)/(n_tot - n_fold)) — the
    out-of-fold trick that keeps a target-encoded categorical feature
    from memorizing its own label (the categorical sibling of
    feature_store_pit's structural no-leakage guarantee). Fold
    assignment is an MD5 hash of the row key — replayable, split-stable.

    Scale: one (brand, fold) hash aggregate; brand totals re-aggregate
    the cell frame; the encoding is a single division of exact
    integers. NULL-guarded for single-fold brands."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    rows = (
        li.select(
            "l_partkey",
            F.pmod(
                hex_hash64(
                    F.concat(
                        F.lit("fold_"),
                        F.col("l_orderkey").cast("string"),
                        F.lit("_"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                F.lit(OOF_FOLDS),
            ).alias("fold"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
        .join(F.broadcast(part), "l_partkey")
        .select(F.col("p_brand").alias("brand"), "fold", "y")
    )
    cell = rows.groupBy("brand", "fold").agg(
        F.count("*").alias("n_fold"), F.sum("y").alias("pos_fold")
    )
    tot = cell.groupBy("brand").agg(
        F.sum("n_fold").alias("n_tot"), F.sum("pos_fold").alias("pos_tot")
    )
    return cell.join(F.broadcast(tot), "brand").select(
        "brand",
        "fold",
        "n_fold",
        "pos_fold",
        F.when(
            F.col("n_tot") != F.col("n_fold"),
            (F.col("pos_tot") - F.col("pos_fold")).cast("double")
            / (F.col("n_tot") - F.col("n_fold")).cast("double"),
        ).alias("oof_encoding"),
    )


# --- Qini uplift curve --------------------------------------------------------

QINI_SPLIT_DAY = 19738  # score period before, outcome period after

QINI_ORACLE = f"""
WITH pre AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS score
    FROM events WHERE epoch_us(ts) // 86400000000 < {QINI_SPLIT_DAY}
    GROUP BY user_id
),
post AS (
    SELECT user_id,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM events WHERE epoch_us(ts) // 86400000000 >= {QINI_SPLIT_DAY}
    GROUP BY user_id
),
pop AS (
    SELECT p.user_id, p.score,
           CAST(p.user_id % 2 AS INT) AS treat,
           COALESCE(o.conv, 0) AS conv
    FROM pre p LEFT JOIN post o ON p.user_id = o.user_id
),
ranked AS (
    SELECT score, treat, conv,
           ROW_NUMBER() OVER (ORDER BY score DESC, user_id) AS rn,
           COUNT(*) OVER () AS n
    FROM pop
),
dec AS (
    SELECT ((rn - 1) * 5) // n AS bucket,
           CAST(SUM(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
           CAST(SUM(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
           CAST(SUM(CASE WHEN treat = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_t,
           CAST(SUM(CASE WHEN treat = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS conv_c
    FROM ranked GROUP BY 1
),
cum AS (
    SELECT bucket, n_t, n_c, conv_t, conv_c,
           CAST(SUM(n_t) OVER w AS BIGINT) AS cn_t,
           CAST(SUM(n_c) OVER w AS BIGINT) AS cn_c,
           CAST(SUM(conv_t) OVER w AS BIGINT) AS cconv_t,
           CAST(SUM(conv_c) OVER w AS BIGINT) AS cconv_c
    FROM dec WINDOW w AS (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
)
SELECT bucket, n_t, n_c, conv_t, conv_c,
       CASE WHEN cn_c = 0 THEN NULL
            ELSE CAST(cconv_t AS DOUBLE)
                 - CAST(cconv_c AS DOUBLE) * CAST(cn_t AS DOUBLE)
                   / CAST(cn_c AS DOUBLE) END AS qini
FROM cum
"""


@register("qini_uplift_curve", QINI_ORACLE)
def q_qini_uplift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve: users scored by pre-period activity, split
    into quintiles, and the cumulative INCREMENTAL conversions of the
    (synthetic odd-id) treated group over the control baseline
    Q(k) = conv_t(k) − conv_c(k)·N_t(k)/N_c(k) — the uplift-model
    evaluation standard. Completes the experimentation suite (Welch
    test, diff-in-diff, Markov removal, Shapley, now targeting
    curves). Score is strictly PRE-period (leakage-free by
    construction, same discipline as feature_store_pit).

    Scale: two keyed per-user aggregates + prefix ranks via the
    5-quantile bucket formula over the user dimension; the cumulative
    window runs over the constant 5-row quintile frame."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("long")
    pre = (
        ev.filter(day < QINI_SPLIT_DAY)
        .groupBy("user_id")
        .agg(F.count("*").alias("score"))
    )
    post = (
        ev.filter(day >= QINI_SPLIT_DAY)
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv")
        )
    )
    pop = (
        pre.join(post, "user_id", "left")
        .select(
            "user_id",
            "score",
            (F.col("user_id") % 2).cast("int").alias("treat"),
            F.coalesce("conv", F.lit(0)).alias("conv"),
        )
    )
    from amorphous_mapreduce_spark.operators.corpus_stats import (
        distributed_prefix_sum,
    )

    ranked = distributed_prefix_sum(
        pop.select("user_id", "score", "treat", "conv", F.lit(1).alias("_one")),
        "_one",
        [F.desc("score"), F.asc("user_id")],
        rank_col="rn",
    )
    n_tot = pop.agg(F.count("*").alias("n"))
    dec_rows = (
        ranked.crossJoin(F.broadcast(n_tot))
        .select(
            F.expr("((rn - 1) * 5) div n").alias("bucket"),
            "treat",
            "conv",
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("treat") == 1, 1).otherwise(0)).alias("n_t"),
            F.sum(F.when(F.col("treat") == 0, 1).otherwise(0)).alias("n_c"),
            F.sum(F.when(F.col("treat") == 1, F.col("conv")).otherwise(0)).alias(
                "conv_t"
            ),
            F.sum(F.when(F.col("treat") == 0, F.col("conv")).otherwise(0)).alias(
                "conv_c"
            ),
        )
    )
    wc = (
        Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dec_rows.select(
        "bucket",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.sum("n_t").over(wc).alias("cn_t"),
        F.sum("n_c").over(wc).alias("cn_c"),
        F.sum("conv_t").over(wc).alias("cconv_t"),
        F.sum("conv_c").over(wc).alias("cconv_c"),
    )
    return cum.select(
        "bucket",
        "n_t",
        "n_c",
        "conv_t",
        "conv_c",
        F.when(
            F.col("cn_c") != 0,
            F.col("cconv_t").cast("double")
            - F.col("cconv_c").cast("double")
            * F.col("cn_t").cast("double")
            / F.col("cn_c").cast("double"),
        ).alias("qini"),
    )


# --- nDCG@10 of the BM25 ranking -------------------------------------------

# floor(2^20 / log2(pos+1)) for pos 1..10 — the DCG discount ladder as
# integer literals, so no engine evaluates a logarithm at query time.
_NDCG_W = [
    1048576, 661577, 524288, 451597, 405644,
    373510, 349525, 330788, 315652, 303106,
]
_NDCG_REL_SQL = (
    "CAST('0x' || substr(md5('rel:' || CAST(id AS VARCHAR)), 1, 15) "
    "AS BIGINT) % 4"
)


def _ndcg_w_case(col: str) -> str:
    whens = " ".join(
        f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W)
    )
    return f"CASE {col} {whens} END"


def _bm25_oracle() -> str:
    from amorphous_mapreduce_spark.queries.text_queries import BM25_ORACLE

    return BM25_ORACLE


NDCG_ORACLE = (
    "WITH base AS ("
    + _bm25_oracle()
    + f"""
),
ranked AS (
    SELECT id,
           ROW_NUMBER() OVER (ORDER BY score DESC, id) AS pos,
           {_NDCG_REL_SQL} AS rel
    FROM base
),
g AS (
    SELECT id, pos,
           CASE rel WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 ELSE 7 END
               AS gain
    FROM ranked WHERE pos <= 10
),
g2 AS (
    SELECT pos, gain,
           ROW_NUMBER() OVER (ORDER BY gain DESC, id) AS irank
    FROM g
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(gain * {_ndcg_w_case("pos")}) AS BIGINT) AS dcg_scaled,
       CAST(SUM(gain * {_ndcg_w_case("irank")}) AS BIGINT) AS idcg_scaled,
       CAST(CAST(SUM(gain * {_ndcg_w_case("pos")}) AS BIGINT) AS DOUBLE)
           / NULLIF(CAST(CAST(SUM(gain * {_ndcg_w_case("irank")}) AS BIGINT)
                         AS DOUBLE), 0.0) AS ndcg
FROM g2
"""
)


@register("ndcg_retrieval", NDCG_ORACLE)
def q_ndcg_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the BM25 ranking against hash-derived graded relevance
    labels (0-3) — the standard offline retrieval-quality metric,
    computed over the retrieved set (ideal = best reordering of the same
    10 results).

    Engine-exact: the log2 position discounts are precomputed integer
    literals (floor(2^20/log2(pos+1))), gains are the 2^rel - 1 ladder
    via a bounded array lookup (shift amounts must be literals in
    Spark), so DCG and ideal-DCG are pure BIGINT sums; nDCG is one final
    division with a NULLIF guard (Spark ANSI raises on /0 where DuckDB
    returns nan — langid_prf precedent). The candidate set is the
    distributed TakeOrdered top-10; both position assignments are
    windows over <= 10 rows.
    """
    from amorphous_mapreduce_spark.operators.text_analysis import bm25_scores
    from amorphous_mapreduce_spark.queries.text_queries import BM25_TERMS

    docs = load_table(spark, sf_dir, "documents")
    top = (
        bm25_scores(docs, BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(10)
    )
    rel = F.pmod(
        hex_hash64(F.concat(F.lit("rel:"), F.col("id").cast("string"))),
        F.lit(4),
    )
    gains = F.array(F.lit(0), F.lit(1), F.lit(3), F.lit(7))
    ranked = top.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("id")))
        .alias("pos"),
        F.element_at(gains, (rel + 1).cast("int")).alias("gain"),
    )
    weights = F.array(*[F.lit(w) for w in _NDCG_W])
    g2 = ranked.select(
        "pos",
        "gain",
        F.row_number()
        .over(Window.orderBy(F.desc("gain"), F.asc("id")))
        .alias("irank"),
    )
    dcg = F.sum(F.col("gain") * F.element_at(weights, F.col("pos").cast("int")))
    idcg = F.sum(
        F.col("gain") * F.element_at(weights, F.col("irank").cast("int"))
    )
    return g2.agg(
        F.count("*").alias("n_docs"),
        dcg.alias("dcg_scaled"),
        idcg.alias("idcg_scaled"),
        (
            dcg.cast("double")
            / F.nullif(idcg.cast("double"), F.lit(0.0))
        ).alias("ndcg"),
    )


# --- MAP@10 over a multi-query BM25 panel ------------------------------------

# lcm(1..10) = 2520: precision@k masses stay exact integers for k <= 10.
_AP_LCM = 2520

MAP_PANEL = (
    ("q0", ("spark", "window", "merge")),
    ("q1", ("hash", "join", "filter")),
    ("q2", ("stream", "batch", "sort")),
)


def _bm25_cte(terms: tuple[str, str, str]) -> str:
    """The BM25_ORACLE body (text_queries.py:51-81) parameterized by the
    query terms — same rational Robertson IDF, same fixed expression
    tree, so per-term scores match bm25_scores() bit-for-bit."""
    ts = []
    for i in range(3):
        ts.append(
            f"""((CAST(_n_doc AS DOUBLE) - CAST(_df_{i} AS DOUBLE) + 0.5)
      / (CAST(_df_{i} AS DOUBLE) + 0.5))
    * (CAST(tf_{i} AS DOUBLE) * 2.2)
    / (CAST(tf_{i} AS DOUBLE)
       + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE)
                                     * CAST(_n_doc AS DOUBLE)
                                     / CAST(_n_tok AS DOUBLE))))"""
        )
    tf_cases = ",\n".join(
        f"           CAST(SUM(CASE WHEN word = '{terms[i]}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS tf_{i}"
        for i in range(3)
    )
    return f"""
    SELECT id, dl, tf_0, tf_1, tf_2,
           {ts[0]}
         + {ts[1]}
         + {ts[2]} AS score
    FROM (
        SELECT id, COUNT(*) AS dl,
{tf_cases}
        FROM toks GROUP BY id
    ) per_doc CROSS JOIN (
        SELECT COUNT(*) AS _n_doc,
               CAST(SUM(dl) AS BIGINT) AS _n_tok,
               CAST(SUM(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS _df_0,
               CAST(SUM(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS _df_1,
               CAST(SUM(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS _df_2
        FROM (
            SELECT id, COUNT(*) AS dl,
{tf_cases}
            FROM toks GROUP BY id
        )
    ) scal
    WHERE greatest(tf_0, tf_1, tf_2) > 0
"""


def _map_branch_sql(qid: str, terms: tuple[str, str, str]) -> str:
    return f"""
SELECT '{qid}' AS query_id,
       CAST(SUM(rel) AS BIGINT) AS n_rel,
       CAST(SUM(CASE WHEN rel = 1 THEN ({_AP_LCM} // pos) * hits
                     ELSE 0 END) AS BIGINT) AS ap_mass,
       CASE WHEN SUM(rel) > 0 THEN
           CAST(SUM(CASE WHEN rel = 1 THEN ({_AP_LCM} // pos) * hits
                         ELSE 0 END) AS DOUBLE)
           / ({_AP_LCM}.0 * CAST(SUM(rel) AS DOUBLE))
       END AS ap
FROM (
    SELECT pos, rel, SUM(rel) OVER (ORDER BY pos) AS hits
    FROM (
        SELECT pos,
               CASE WHEN CAST('0x' || substr(md5('rel:' ||
                        CAST(id AS VARCHAR)), 1, 15) AS BIGINT) % 4 >= 2
                    THEN 1 ELSE 0 END AS rel
        FROM (
            SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS pos
            FROM ({_bm25_cte(terms)})
        ) WHERE pos <= 10
    )
)
"""


MAP_ORACLE = (
    """
WITH toks AS (
    SELECT id, word FROM (
        SELECT doc_id AS id,
               unnest(regexp_split_to_array(
                   regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                   ' ')) AS word
        FROM documents
    ) WHERE length(word) > 0
)
"""
    + " UNION ALL ".join(_map_branch_sql(q, t) for q, t in MAP_PANEL)
)


@register("map_at_10", MAP_ORACLE)
def q_map_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision at 10 for each query of a 3-query BM25 panel
    against hash-derived binary relevance (rel = md5 grade >= 2) — the
    per-query rows behind MAP, the classic ranked-retrieval summary
    (complements ndcg_retrieval and recsys_backtest_mrr).

    Exactness: precision@k masses are integers via the lcm(1..10)=2520
    trick (2520 // pos is exact, rbo_rankings precedent); the denominator
    counts relevant in the retrieved set, NULL-guarded at zero. One
    double division per query row.

    Scale: each panel query is the bm25_scores plan (one tokenise +
    map-side-combined agg) ending in a distributed TakeOrdered top-10;
    the AP windows run over <= 10 rows. Reference tie-in: word-count
    substrate (src/word_count.rs:90-128) feeding a ranked-eval reduce."""
    from amorphous_mapreduce_spark.operators.text_analysis import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    branches = []
    for qid, terms in MAP_PANEL:
        top = (
            bm25_scores(docs, terms)
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(10)
        )
        rel = F.when(
            F.pmod(
                hex_hash64(F.concat(F.lit("rel:"), F.col("id").cast("string"))),
                F.lit(4),
            )
            >= 2,
            1,
        ).otherwise(0)
        ranked = top.select(
            "id",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), F.asc("id")))
            .alias("pos"),
            rel.alias("rel"),
        )
        cum = ranked.select(
            "pos",
            "rel",
            F.sum("rel")
            .over(Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0))
            .alias("hits"),
        )
        mass = F.sum(
            F.when(
                F.col("rel") == 1,
                F.expr(f"({_AP_LCM} div pos)") * F.col("hits"),
            ).otherwise(0)
        )
        branches.append(
            cum.agg(
                F.sum("rel").cast("long").alias("n_rel"),
                mass.cast("long").alias("ap_mass"),
                F.when(
                    F.sum("rel") > 0,
                    mass.cast("double")
                    / (F.lit(float(_AP_LCM)) * F.sum("rel").cast("double")),
                ).alias("ap"),
            ).select(F.lit(qid).alias("query_id"), "n_rel", "ap_mass", "ap")
        )
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out


# --- ERR@10 (expected reciprocal rank) --------------------------------------

# ERR = sum_r (1/r) * R_r * prod_{i<r} (1 - R_i), with graded stop
# probabilities R = (2^rel - 1)/8 from the SAME hash labels as nDCG.
# Every R and (1-R) is a dyadic rational (denominator 8), so the cascade
# products and the per-term values are EXACT doubles (all numerators fit
# 53 bits); 1/r is cleared by the lcm(1..10)=2520 integer-weights trick
# (rbo_rankings precedent). The final sum has denominator 2^30 — the
# BIGINT anchor err_scaled_2e30 proves exactness.
_ERR_RV = "CASE rel WHEN 0 THEN 0.0 WHEN 1 THEN 0.125 WHEN 2 THEN 0.375 ELSE 0.875 END"

ERR_ORACLE = (
    "WITH base AS ("
    + _bm25_oracle()
    + f"""
),
ranked AS (
    SELECT id,
           ROW_NUMBER() OVER (ORDER BY score DESC, id) AS pos,
           {_NDCG_REL_SQL} AS rel
    FROM base
),
rr AS (
    SELECT pos, {_ERR_RV} AS rv
    FROM ranked WHERE pos <= 10
),
casc AS (
    SELECT a.pos, a.rv,
           COALESCE(product(1.0 - b.rv), 1.0) AS stopprod
    FROM rr a LEFT JOIN rr b ON b.pos < a.pos
    GROUP BY a.pos, a.rv
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       SUM((2520 // pos) * rv * stopprod) AS err_2520,
       CAST(floor(SUM((2520 // pos) * rv * stopprod) * 1073741824)
            AS BIGINT) AS err_scaled_2e30,
       SUM((2520 // pos) * rv * stopprod) / 2520.0 AS err
FROM casc
"""
)


@register("err_at_10", ERR_ORACLE)
def q_err_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERR@10 (expected reciprocal rank, Chapelle's cascade metric) of
    the BM25 ranking under the shared hash-graded relevance labels —
    the user-model companion to nDCG@10: positions after a
    highly-relevant result are discounted by the probability the user
    already stopped.

    Engine-exact with NO quantization: stop probabilities are dyadic
    (den 8), cascade products stay within 53 mantissa bits, 1/r is
    cleared by 2520 — the doubles themselves are exact, and the
    err_scaled_2e30 BIGINT anchor proves it. The cascade product is a
    triangular self-join + product() aggregate over the CONSTANT 10-row
    frame."""
    from amorphous_mapreduce_spark.operators.text_analysis import bm25_scores
    from amorphous_mapreduce_spark.queries.text_queries import BM25_TERMS

    docs = load_table(spark, sf_dir, "documents")
    top = (
        bm25_scores(docs, BM25_TERMS)
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(10)
    )
    rel = F.pmod(
        hex_hash64(F.concat(F.lit("rel:"), F.col("id").cast("string"))),
        F.lit(4),
    )
    rvals = F.array(F.lit(0.0), F.lit(0.125), F.lit(0.375), F.lit(0.875))
    rr = top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("id")))
        .alias("pos"),
        F.element_at(rvals, (rel + 1).cast("int")).alias("rv"),
    )
    b = rr.select(F.col("pos").alias("bpos"), F.col("rv").alias("brv"))
    casc = (
        rr.join(b, F.col("bpos") < F.col("pos"), "left")
        .groupBy("pos", "rv")
        .agg(F.coalesce(F.product(1.0 - F.col("brv")), F.lit(1.0)).alias("stopprod"))
    )
    term = F.expr("(2520 div pos)") * F.col("rv") * F.col("stopprod")
    return casc.agg(
        F.count("*").alias("n_docs"),
        F.sum(term).alias("err_2520"),
        F.floor(F.sum(term) * 1073741824).cast("bigint").alias("err_scaled_2e30"),
        (F.sum(term) / 2520.0).alias("err"),
    )


# --- Markov entropy rate of the event stream --------------------------------

from amorphous_mapreduce_spark.functions.intlog import (  # noqa: E402
    LOG2_SCALE as _LS,
    log2_scaled,
    log2_scaled_sql,
)

ENTROPY_RATE_ORACLE = f"""
WITH ev AS (
    SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
), seq AS (
    SELECT event_type AS from_type,
           LEAD(event_type) OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS to_type
    FROM ev
), trans AS (
    SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS c
    FROM seq WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
), rows_ AS (
    SELECT from_type,
           CAST(SUM(c) AS BIGINT) AS from_total,
           CAST(SUM(c * {log2_scaled_sql('c')}) AS BIGINT) AS clogc
    FROM trans GROUP BY from_type
), nn AS (SELECT CAST(SUM(from_total) AS BIGINT) AS n FROM rows_)
SELECT from_type, from_total,
       CAST(from_total * {log2_scaled_sql('from_total')} - clogc AS BIGINT)
           AS ent_num,
       CAST(from_total * {log2_scaled_sql('from_total')} - clogc AS DOUBLE)
           / CAST(from_total * {_LS} AS BIGINT) AS h_cond_bits,
       CAST(from_total AS DOUBLE) / CAST(n AS DOUBLE) AS pi_weight,
       CAST(from_total * {log2_scaled_sql('from_total')} - clogc AS DOUBLE)
           / CAST(n * {_LS} AS BIGINT) AS rate_contrib_bits
FROM rows_ CROSS JOIN nn
"""


@register("markov_entropy_rate", ENTROPY_RATE_ORACLE)
def q_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the user event stream under its first-order
    Markov model: per from-state, the conditional next-event entropy
    H(next|s) (LUT log2, integer numerator), its empirical stationary
    weight, and the rate contribution pi_s*H_s — summing the last
    column gives bits-per-event, the sequence-predictability dial
    behind session-model and compression-budget decisions (the
    sequential companion to the cross-sectional mi_lang_source).

    Scale: same keyed lead + two hash aggregates as event_transitions;
    everything after is on the |types|^2 frame."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("c"))
    )
    rows_ = trans.groupBy("from_type").agg(
        F.sum("c").alias("from_total"),
        F.sum(F.col("c") * log2_scaled("c")).alias("clogc"),
    )
    nn = rows_.agg(F.sum("from_total").alias("n"))
    ent = (
        F.col("from_total") * log2_scaled("from_total") - F.col("clogc")
    ).cast("long")
    return rows_.crossJoin(F.broadcast(nn)).select(
        "from_type",
        "from_total",
        ent.alias("ent_num"),
        (
            ent.cast("double") / (F.col("from_total") * _LS).cast("long").cast("double")
        ).alias("h_cond_bits"),
        (F.col("from_total").cast("double") / F.col("n").cast("double")).alias(
            "pi_weight"
        ),
        (
            ent.cast("double") / (F.col("n") * _LS).cast("long").cast("double")
        ).alias("rate_contrib_bits"),
    )


# --- variance explained by the top principal component ----------------------

PCA_VAR_ORACLE = POWER_ITER_ORACLE.replace(
    f"\nSELECT dim, v AS v_q FROM v{PI_ITERS}",
    f"""
, vfin AS MATERIALIZED (SELECT dim, v FROM v{PI_ITERS}),
num AS (
    SELECT SUM(CAST(a.v AS HUGEINT) * g.g * b.v) AS nraw
    FROM g JOIN vfin a ON g.i = a.dim JOIN vfin b ON g.j = b.dim
),
den AS (SELECT CAST(SUM(v * v) AS BIGINT) AS vv FROM vfin),
tr AS (SELECT CAST(SUM(g) AS BIGINT) AS trace_q FROM g WHERE i = j)
SELECT CAST((SELECT COUNT(*) FROM vfin) AS BIGINT) AS n_dims,
       den.vv, tr.trace_q,
       CAST((num.nraw // 1073741824) AS BIGINT) AS rq_hi,
       CAST((num.nraw % 1073741824) AS BIGINT) AS rq_lo,
       (CAST((num.nraw // 1073741824) AS BIGINT) * 1073741824.0
        + CAST((num.nraw % 1073741824) AS BIGINT))
           / CAST(den.vv AS DOUBLE) AS lambda1_q,
       (CAST((num.nraw // 1073741824) AS BIGINT) * 1073741824.0
        + CAST((num.nraw % 1073741824) AS BIGINT))
           / CAST(den.vv AS DOUBLE) / CAST(tr.trace_q AS DOUBLE)
           AS var_explained_top1
FROM num CROSS JOIN den CROSS JOIN tr
""",
)


@register("pca_variance_explained", PCA_VAR_ORACLE)
def q_pca_variance_explained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of embedding variance captured by the top principal
    component: the Rayleigh quotient v'Gv / v'v of the power-iteration
    eigenvector over the Gram trace — the 'is this embedding space
    one-dimensional' collapse dial behind whitening and dimension-
    reduction decisions.

    v'Gv exceeds int64, so it accumulates in DECIMAL(38,0)/HUGEINT and
    reconstructs in double via a hi/lo 2^30 split (the
    rolling_correlation gotcha: DuckDB's int128->double cast mis-rounds
    past 2^63); vv and the trace are exact int64; the two final
    divisions are the identical IEEE sequence on both engines.

    Scale: one corpus-sized Gram aggregate (shuffle bounded by d², same
    as embedding_gram); the quotient runs on d² rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * GRAM_QUANT).cast("long"),
            )
        ).alias("dim", "qx"),
    )
    a0 = q.select("vec_id", F.col("dim").alias("i"), F.col("qx").alias("ax"))
    b0 = q.select("vec_id", F.col("dim").alias("j"), F.col("qx").alias("bx"))
    gram = (
        a0.join(b0, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("ax") * F.col("bx")).alias("g"))
        .persist()
    )
    v = (
        gram.select(F.col("i").alias("dim"))
        .distinct()
        .select("dim", F.lit(PI_SCALE).cast("long").alias("v"))
        .coalesce(1)
        .localCheckpoint()
    )
    for _ in range(PI_ITERS):
        gv = (
            gram.join(v, gram["j"] == v["dim"])
            .groupBy("i")
            .agg(F.sum(F.col("g") * F.col("v")).alias("gv"))
            .coalesce(1)
            .localCheckpoint()
        )
        m = gv.agg(F.max(F.abs(F.col("gv"))).alias("mx"))
        v = gv.crossJoin(F.broadcast(m)).select(
            F.col("i").alias("dim"),
            F.expr(
                f"gv div greatest(CAST(1 AS BIGINT), mx div {PI_SCALE})"
            ).alias("v"),
        )
    v = v.localCheckpoint()
    va = v.select(F.col("dim").alias("i"), F.col("v").alias("av"))
    vb = v.select(F.col("dim").alias("j"), F.col("v").alias("bv"))
    num = (
        gram.join(F.broadcast(va), "i")
        .join(F.broadcast(vb), "j")
        .agg(
            F.sum(
                (F.col("av") * F.col("g") * F.col("bv")).cast("decimal(38,0)")
            ).alias("nraw")
        )
    )
    den = v.agg(F.sum(F.col("v") * F.col("v")).alias("vv"))
    tr = gram.filter(F.col("i") == F.col("j")).agg(
        F.sum("g").alias("trace_q")
    )
    nd = v.agg(F.count("*").alias("n_dims"))
    out = (
        num.crossJoin(F.broadcast(den))
        .crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(nd))
    )
    hi = F.expr("CAST(nraw div 1073741824 AS BIGINT)")
    lo = F.expr("CAST(nraw % 1073741824 AS BIGINT)")
    lam = (hi.cast("double") * F.lit(1073741824.0) + lo.cast("double")) / F.col(
        "vv"
    ).cast("double")
    return out.select(
        "n_dims",
        "vv",
        "trace_q",
        hi.alias("rq_hi"),
        lo.alias("rq_lo"),
        lam.alias("lambda1_q"),
        (lam / F.col("trace_q").cast("double")).alias("var_explained_top1"),
    )


# --- Brier score + reliability (calibration) bins ---------------------------

_BRIER_PIVOT = "1995-06-01"
_BRIER_SCALE = 1048576  # 2^20 probability fixed point


BRIER_ORACLE = f"""
WITH tagged AS (
    SELECT p.p_brand AS brand, o.o_orderdate < DATE '{_BRIER_PIVOT}' AS is_train,
           CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
),
rates AS (
    SELECT brand,
           CAST(({_BRIER_SCALE} * CAST(SUM(y) AS BIGINT))
                // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS p_q
    FROM tagged WHERE is_train GROUP BY brand
),
g AS (
    SELECT CAST(({_BRIER_SCALE} * CAST(SUM(y) AS BIGINT))
                // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS g_q
    FROM tagged WHERE is_train
),
scored AS (
    SELECT COALESCE(r.p_q, g.g_q) AS p_q, t.y
    FROM tagged t LEFT JOIN rates r USING (brand) CROSS JOIN g
    WHERE NOT t.is_train
),
binned AS (
    SELECT LEAST((p_q * 100) // {_BRIER_SCALE}, 99) AS bin, p_q, y,
           (p_q - y * {_BRIER_SCALE}) AS e
    FROM scored
),
agg AS (
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(y) AS BIGINT) AS n_returned,
           CAST(SUM(p_q) AS BIGINT) AS sum_pq,
           SUM(CAST(e AS HUGEINT) * e) AS sq
    FROM binned GROUP BY bin
)
SELECT CAST(bin AS BIGINT) AS bin, n_rows, n_returned, sum_pq,
       CAST(sq // 1073741824 AS BIGINT) AS sq_hi,
       CAST(sq % 1073741824 AS BIGINT) AS sq_lo,
       CAST(sum_pq AS DOUBLE)
           / (CAST(n_rows AS DOUBLE) * {_BRIER_SCALE}.0) AS mean_pred,
       CAST(n_returned AS DOUBLE) / CAST(n_rows AS DOUBLE) AS obs_rate,
       (CAST(sq // 1073741824 AS BIGINT) * 1073741824.0
        + CAST(sq % 1073741824 AS BIGINT))
           / (CAST(n_rows AS DOUBLE) * 1099511627776.0) AS brier_bin
FROM agg ORDER BY bin
"""


@register("brier_calibration_bins", BRIER_ORACLE)
def q_brier_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit of a trained probabilistic predictor: per-brand
    return rates fit on pre-{_BRIER_PIVOT} orders predict each later
    lineitem's return; outputs the reliability diagram (predicted-
    probability centile bins vs observed rate) plus the per-bin Brier score —
    the standard 'is the model's confidence honest' diagnostic next to
    the rank-based AUC/KS queries (a model can rank perfectly and still
    be badly calibrated).

    Exactness: predictions are integer fixed-point (2^20 * ret) div n;
    squared errors accumulate in DECIMAL/HUGEINT and reconstruct via the
    hi/lo 2^30 split (the int128->double rounding gotcha); mean_pred /
    obs_rate / brier_bin are fixed double expressions per bin row.

    Scale: two big keyed joins (lineitem-orders-part: the q3/q5 shape);
    rate state is #brands rows broadcast back; bins are a 10-row hash
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    pt = load_table(spark, sf_dir, "part")
    tagged = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(
            F.col("p_brand").alias("brand"),
            (F.col("o_orderdate") < F.lit(_BRIER_PIVOT).cast("date")).alias(
                "is_train"
            ),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
        )
        .persist()
    )
    train = tagged.filter("is_train")
    rates = train.groupBy("brand").agg(
        F.expr(f"CAST(({_BRIER_SCALE} * SUM(y)) div COUNT(*) AS BIGINT)").alias(
            "p_q"
        )
    )
    g = train.agg(
        F.expr(f"CAST(({_BRIER_SCALE} * SUM(y)) div COUNT(*) AS BIGINT)").alias(
            "g_q"
        )
    )
    scored = (
        tagged.filter(~F.col("is_train"))
        .join(F.broadcast(rates), "brand", "left")
        .crossJoin(F.broadcast(g))
        .select(F.coalesce(F.col("p_q"), F.col("g_q")).alias("p_q"), "y")
    )
    binned = scored.select(
        F.least((F.col("p_q") * 100 / _BRIER_SCALE).cast("long"), F.lit(99)).alias(
            "bin"
        ),
        "p_q",
        (F.col("p_q") - F.col("y") * _BRIER_SCALE).alias("e"),
        "y",
    )
    agg = binned.groupBy("bin").agg(
        F.count("*").alias("n_rows"),
        F.sum("y").alias("n_returned"),
        F.sum("p_q").alias("sum_pq"),
        F.sum((F.col("e") * F.col("e")).cast("decimal(38,0)")).alias("sq"),
    )
    hi = F.expr("CAST(sq div 1073741824 AS BIGINT)")
    lo = F.expr("CAST(sq % 1073741824 AS BIGINT)")
    return agg.select(
        "bin",
        "n_rows",
        "n_returned",
        "sum_pq",
        hi.alias("sq_hi"),
        lo.alias("sq_lo"),
        (
            F.col("sum_pq").cast("double")
            / (F.col("n_rows").cast("double") * F.lit(float(_BRIER_SCALE)))
        ).alias("mean_pred"),
        (F.col("n_returned").cast("double") / F.col("n_rows").cast("double")).alias(
            "obs_rate"
        ),
        (
            (hi.cast("double") * F.lit(1073741824.0) + lo.cast("double"))
            / (F.col("n_rows").cast("double") * F.lit(1099511627776.0))
        ).alias("brier_bin"),
    ).orderBy("bin")


# --- linear CKA: how much geometry survives quantization ---------------------

_CKA_P53 = 9007199254740992


def _cka_recon_sql(v: str) -> str:
    # 3-piece non-negative HUGEINT -> double (values reach ~2^110)
    q1 = f"CAST(({v}) // {_CKA_P53} AS BIGINT)"
    r0 = f"CAST(({v}) % {_CKA_P53} AS BIGINT)"
    return (
        f"((CAST({q1} // {_CKA_P53} AS DOUBLE) * CAST({_CKA_P53} AS DOUBLE)"
        f" + CAST({q1} % {_CKA_P53} AS DOUBLE)) * CAST({_CKA_P53} AS DOUBLE)"
        f" + CAST({r0} AS DOUBLE))"
    )


CKA_ORACLE = f"""
WITH q AS (
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS dim,
           CAST(round(CAST(unnest(embedding) AS DOUBLE) * {1000})
                AS BIGINT) AS x,
           CAST(TRUNC(CAST(unnest(embedding) AS DOUBLE)
                      / list_max(list_transform(embedding,
                                 v -> abs(CAST(v AS DOUBLE)))) * 127)
                AS BIGINT) AS y8,
           CAST(CASE WHEN CAST(unnest(embedding) AS DOUBLE) > 0 THEN 1
                     WHEN CAST(unnest(embedding) AS DOUBLE) < 0 THEN -1
                     ELSE 0 END AS BIGINT) AS y1
    FROM embeddings
    WHERE list_max(list_transform(embedding,
                                  v -> abs(CAST(v AS DOUBLE)))) > 0
),
dims AS (
    SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx,
           CAST(SUM(y8) AS BIGINT) AS s8,
           CAST(SUM(y1) AS BIGINT) AS s1
    FROM q GROUP BY dim
),
gram AS (
    SELECT a.dim AS i, b.dim AS j,
           CAST(SUM(a.x * b.x) AS BIGINT) AS sxx,
           CAST(SUM(a.x * b.y8) AS BIGINT) AS sxy8,
           CAST(SUM(a.y8 * b.y8) AS BIGINT) AS s88,
           CAST(SUM(a.x * b.y1) AS BIGINT) AS sxy1,
           CAST(SUM(a.y1 * b.y1) AS BIGINT) AS s11
    FROM q a JOIN q b ON a.vec_id = b.vec_id
    GROUP BY a.dim, b.dim
),
terms AS (
    SELECT g.i, g.j,
           di.n AS n,
           di.n * g.sxx  - di.sx * dj.sx AS txx,
           di.n * g.sxy8 - di.sx * dj.s8 AS txy8,
           di.n * g.s88  - di.s8 * dj.s8 AS t88,
           di.n * g.sxy1 - di.sx * dj.s1 AS txy1,
           di.n * g.s11  - di.s1 * dj.s1 AS t11
    FROM gram g JOIN dims di ON g.i = di.dim JOIN dims dj ON g.j = dj.dim
),
fro AS (
    SELECT MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS d2,
           SUM(CAST(txx AS HUGEINT) * txx) AS fxx,
           SUM(CAST(txy8 AS HUGEINT) * txy8) AS fxy8,
           SUM(CAST(t88 AS HUGEINT) * t88) AS f88,
           SUM(CAST(txy1 AS HUGEINT) * txy1) AS fxy1,
           SUM(CAST(t11 AS HUGEINT) * t11) AS f11
    FROM terms
)
SELECT 'int8' AS variant, n, d2,
       {_cka_recon_sql('fxy8')} AS f_cross,
       {_cka_recon_sql('fxx')} AS f_x,
       {_cka_recon_sql('f88')} AS f_y,
       {_cka_recon_sql('fxy8')}
           / sqrt({_cka_recon_sql('fxx')} * {_cka_recon_sql('f88')}) AS cka
FROM fro
UNION ALL
SELECT 'sign' AS variant, n, d2,
       {_cka_recon_sql('fxy1')},
       {_cka_recon_sql('fxx')},
       {_cka_recon_sql('f11')},
       {_cka_recon_sql('fxy1')}
           / sqrt({_cka_recon_sql('fxx')} * {_cka_recon_sql('f11')})
FROM fro
ORDER BY variant
"""


@register("cka_quantization", CKA_ORACLE)
def q_cka_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered kernel alignment) between the exact
    embedding space and its int8 / 1-bit quantizations — THE
    representation-similarity metric (Kornblith et al.): CKA =
    ||C_xy||²_F / (||C_xx||_F ||C_yy||_F) over n-scaled centered
    cross-covariances, answering 'how much of the embedding geometry
    survives 8-bit storage vs sign-only hashing' with one number per
    variant (1.0 = isometric, jl_projection_distortion's global
    cousin).

    Exactness: all three representations are integers (round(x*1000);
    trunc(x/scale*127) — one identical IEEE division per element; sign),
    every moment is an exact BIGINT, Frobenius sums accumulate in
    DECIMAL/HUGEINT (~2^110) and convert via a 3-piece 2^53 split; the
    final sqrt/divide is a fixed double expression.

    Scale: the d² fan-out feeds a map-side-combined hash aggregate
    keyed on (i, j) — shuffle is #partitions x d² x 5 sums, independent
    of row count (embedding_gram's bound); dim sums are d rows
    broadcast back; Frobenius is one scalar aggregate over d² rows."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(32)
    scale = F.array_max(
        F.transform("embedding", lambda v: F.abs(v.cast("double")))
    )
    q = (
        emb.select("vec_id", "embedding", scale.alias("scale"))
        .filter(F.col("scale") > 0)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda v: F.round(v.cast("double") * 1000).cast("long"),
            ).alias("ax"),
            F.transform(
                "embedding",
                lambda v: (v.cast("double") / F.col("scale") * 127.0).cast(
                    "long"
                ),
            ).alias("a8"),
            F.transform(
                "embedding",
                lambda v: F.signum(v.cast("double")).cast("long"),
            ).alias("a1"),
        )
    )
    z = q.select(
        "vec_id", F.arrays_zip("ax", "a8", "a1").alias("z")
    )
    a = z.select("vec_id", "z", F.posexplode("z").alias("i", "u"))
    b = a.select(
        "i",
        F.col("u.ax").alias("xi"),
        F.col("u.a8").alias("e8i"),
        F.col("u.a1").alias("e1i"),
        F.posexplode("z").alias("j", "w"),
    )
    gram = b.groupBy("i", "j").agg(
        F.sum(F.col("xi") * F.col("w.ax")).alias("sxx"),
        F.sum(F.col("xi") * F.col("w.a8")).alias("sxy8"),
        F.sum(F.col("e8i") * F.col("w.a8")).alias("s88"),
        F.sum(F.col("xi") * F.col("w.a1")).alias("sxy1"),
        F.sum(F.col("e1i") * F.col("w.a1")).alias("s11"),
    )
    dims = (
        q.select(F.posexplode(F.arrays_zip("ax", "a8", "a1")).alias("dim", "u"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("u.ax").alias("sx"),
            F.sum("u.a8").alias("s8"),
            F.sum("u.a1").alias("s1"),
        )
    )
    di = dims.select(
        F.col("dim").alias("i"),
        F.col("n"),
        F.col("sx").alias("sx_i"),
        F.col("s8").alias("s8_i"),
        F.col("s1").alias("s1_i"),
    )
    dj = dims.select(
        F.col("dim").alias("j"),
        F.col("sx").alias("sx_j"),
        F.col("s8").alias("s8_j"),
        F.col("s1").alias("s1_j"),
    )
    terms = (
        gram.join(F.broadcast(di), "i")
        .join(F.broadcast(dj), "j")
        .select(
            "n",
            (F.col("n") * F.col("sxx") - F.col("sx_i") * F.col("sx_j")).alias(
                "txx"
            ),
            (F.col("n") * F.col("sxy8") - F.col("sx_i") * F.col("s8_j")).alias(
                "txy8"
            ),
            (F.col("n") * F.col("s88") - F.col("s8_i") * F.col("s8_j")).alias(
                "t88"
            ),
            (F.col("n") * F.col("sxy1") - F.col("sx_i") * F.col("s1_j")).alias(
                "txy1"
            ),
            (F.col("n") * F.col("s11") - F.col("s1_i") * F.col("s1_j")).alias(
                "t11"
            ),
        )
    )
    sq = lambda c: F.sum((F.col(c).cast("decimal(38,0)") * F.col(c)))
    fro = terms.agg(
        F.max("n").alias("n"),
        F.count("*").alias("d2"),
        sq("txx").alias("fxx"),
        sq("txy8").alias("fxy8"),
        sq("t88").alias("f88"),
        sq("txy1").alias("fxy1"),
        sq("t11").alias("f11"),
    )

    def recon(v: str):
        q1 = F.expr(f"CAST({v} div {_CKA_P53} AS BIGINT)")
        r0 = F.expr(f"CAST({v} % {_CKA_P53} AS BIGINT)")
        p = F.lit(float(_CKA_P53))
        return (
            (
                F.expr(f"CAST(CAST({v} div {_CKA_P53} AS BIGINT) div {_CKA_P53} AS BIGINT)").cast("double") * p
                + F.expr(f"CAST(CAST({v} div {_CKA_P53} AS BIGINT) % {_CKA_P53} AS BIGINT)").cast("double")
            )
            * p
            + r0.cast("double")
        )

    def row(variant: str, fxy: str, fy: str):
        return fro.select(
            F.lit(variant).alias("variant"),
            "n",
            "d2",
            recon(fxy).alias("f_cross"),
            recon("fxx").alias("f_x"),
            recon(fy).alias("f_y"),
            (recon(fxy) / F.sqrt(recon("fxx") * recon(fy))).alias("cka"),
        )

    return row("int8", "fxy8", "f88").unionByName(
        row("sign", "fxy1", "f11")
    ).orderBy("variant")


# --- isotonic calibration (PAVA as a bounded max-min lattice) ----------------

ISOTONIC_ORACLE = """
WITH bins AS (
    SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS pos
    FROM lineitem GROUP BY 1
),
ivals AS (
    SELECT i.bin AS lo, j.bin AS hi,
           CAST((1048576 * CAST(SUM(b.pos) AS BIGINT))
                // CAST(SUM(b.n) AS BIGINT) AS BIGINT) AS m_q
    FROM bins i JOIN bins j ON i.bin <= j.bin
    JOIN bins b ON b.bin BETWEEN i.bin AND j.bin
    GROUP BY 1, 2
),
inner_min AS (
    SELECT k.bin AS k, iv.lo, MIN(iv.m_q) AS mn
    FROM bins k JOIN ivals iv ON iv.lo <= k.bin AND iv.hi >= k.bin
    GROUP BY 1, 2
),
fit AS (
    SELECT k, MAX(mn) AS iso_q FROM inner_min GROUP BY k
)
SELECT b.bin, b.n, b.pos,
       CAST((1048576 * b.pos) // b.n AS BIGINT) AS raw_q,
       f.iso_q,
       CAST(f.iso_q AS DOUBLE) / 1048576.0 AS iso_rate,
       COALESCE(f.iso_q >= prev.iso_q, TRUE) AS monotone_ok
FROM bins b JOIN fit f ON f.k = b.bin
LEFT JOIN fit prev ON prev.k = b.bin - 1
ORDER BY b.bin
"""


@register("isotonic_return_rate", ISOTONIC_ORACLE)
def q_isotonic_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression (PAVA) of return rate on discount level — the
    calibration map a scoring stack fits when it needs monotone
    probabilities (the non-parametric sibling of Platt scaling; pairs
    with brier_calibration_bins' reliability diagram).

    Uses the max-min characterization g(k) = max_{i<=k} min_{j>=k}
    mean(y[i..j]) instead of the sequential pool-adjacent-violators
    sweep: with B score bins the whole lattice is B^2 interval means
    over bin prefix aggregates — pure dataflow, no iteration. Interval
    means are 2^20-quantized integer divisions (the quantized lattice IS
    the spec, the intlog stance), so the fit replays exactly in SQL;
    monotonicity comes out as an in-row proof column.

    Scale: the only data-sized pass is the groupBy(bin) on lineitem;
    everything after runs on the constant 11-bin frame (B^3 <= 1331
    lattice rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    bins = (
        li.select(
            (F.col("l_discount").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("bin"),
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("is_pos"),
        )
        .groupBy("bin")
        .agg(F.count("*").alias("n"), F.sum("is_pos").alias("pos"))
        .persist()
    )
    i, j, b = bins.alias("i"), bins.alias("j"), bins.alias("b")
    ivals = (
        i.join(F.broadcast(j), F.col("i.bin") <= F.col("j.bin"))
        .join(
            F.broadcast(b),
            (F.col("b.bin") >= F.col("i.bin")) & (F.col("b.bin") <= F.col("j.bin")),
        )
        .groupBy(F.col("i.bin").alias("lo"), F.col("j.bin").alias("hi"))
        .agg(
            F.expr("CAST((1048576 * SUM(b.pos)) div SUM(b.n) AS BIGINT)").alias(
                "m_q"
            )
        )
    )
    k = bins.select(F.col("bin").alias("k"))
    fit = (
        k.join(
            F.broadcast(ivals),
            (F.col("lo") <= F.col("k")) & (F.col("hi") >= F.col("k")),
        )
        .groupBy("k", "lo")
        .agg(F.min("m_q").alias("mn"))
        .groupBy("k")
        .agg(F.max("mn").alias("iso_q"))
        .persist()
    )
    prev = fit.select(F.col("k").alias("_pk"), F.col("iso_q").alias("_prev"))
    return (
        bins.join(F.broadcast(fit), bins.bin == fit.k)
        .join(F.broadcast(prev), bins.bin - 1 == F.col("_pk"), "left")
        .select(
            "bin",
            "n",
            "pos",
            F.expr("CAST((1048576 * pos) div n AS BIGINT)").alias("raw_q"),
            "iso_q",
            (F.col("iso_q").cast("double") / F.lit(1048576.0)).alias("iso_rate"),
            F.coalesce(F.col("iso_q") >= F.col("_prev"), F.lit(True)).alias(
                "monotone_ok"
            ),
        )
        .orderBy("bin")
    )


# --- Markov next-event predictor, temporal holdout ----------------------------

MARKOV_SPLIT_DAY = 19738  # train strictly before, evaluate at/after

MARKOV_NEXT_ORACLE = f"""
WITH seq AS (
    SELECT user_id, event_type,
           epoch_us(ts) // 86400000000 AS day,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id) AS prev
    FROM events
),
trans AS (SELECT prev, event_type AS nxt, day FROM seq WHERE prev IS NOT NULL),
train AS (
    SELECT prev, nxt, CAST(COUNT(*) AS BIGINT) AS c
    FROM trans WHERE day < {MARKOV_SPLIT_DAY} GROUP BY prev, nxt
),
pred AS (
    SELECT prev, nxt AS predicted FROM (
        SELECT prev, nxt,
               row_number() OVER (PARTITION BY prev ORDER BY c DESC, nxt)
                   AS rn
        FROM train
    ) WHERE rn = 1
),
test AS (SELECT prev, nxt FROM trans WHERE day >= {MARKOV_SPLIT_DAY})
SELECT t.prev, p.predicted,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN t.nxt = p.predicted THEN 1 ELSE 0 END) AS BIGINT)
           AS n_correct,
       CAST(SUM(CASE WHEN t.nxt = p.predicted THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM test t JOIN pred p USING (prev)
GROUP BY t.prev, p.predicted
ORDER BY t.prev
"""


@register("markov_next_event_accuracy", MARKOV_NEXT_ORACLE)
def q_markov_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-event-type predictor with a temporal
    holdout: transition counts trained on the first half of the event
    window, the per-state argmax evaluated on the second half — the
    baseline every sequence model must beat, scored leakage-free (the
    feature_store_pit / recsys_backtest_mrr split discipline applied to
    the Markov chain the attribution queries already walk).

    Transitions come from a per-user lag window (partitioned — no
    global sort); the transition matrix is |types|² rows, the argmax a
    bounded per-state window with (count DESC, type) total-order
    tie-break. Accuracy is one integer ratio per state."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")), F.col("event_id")
    )
    seq = ev.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
        F.lag("event_type").over(w).alias("prev"),
    )
    trans = seq.filter(F.col("prev").isNotNull()).select(
        "prev", F.col("event_type").alias("nxt"), "day"
    ).persist()
    train = (
        trans.filter(F.col("day") < MARKOV_SPLIT_DAY)
        .groupBy("prev", "nxt")
        .agg(F.count("*").alias("c"))
    )
    wp = Window.partitionBy("prev").orderBy(F.desc("c"), F.asc("nxt"))
    pred = (
        train.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    test = trans.filter(F.col("day") >= MARKOV_SPLIT_DAY)
    return (
        test.join(F.broadcast(pred), "prev")
        .groupBy("prev", "predicted")
        .agg(
            F.count("*").alias("n_test"),
            F.sum(
                F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "prev",
            "predicted",
            "n_test",
            "n_correct",
            (
                F.col("n_correct").cast("double")
                / F.col("n_test").cast("double")
            ).alias("accuracy"),
        )
        .orderBy("prev")
    )


# --- exact Shapley data valuation over language slices ------------------------

# Characteristic function f(S) = R^2 of the pooled "n_tokens predicts
# n_chars" linear probe over the union of language slices S (computed
# purely from per-slice OLS moments — additive, so every subset is a
# 6-integer sum, never a re-scan). 5 slices -> all 32 subsets exactly;
# Shapley weights s!(4-s)! over the common denominator 5! = 120. Each
# marginal term is floor-quantized to 2^-20 BEFORE summation (the
# prf_expanded_retrieval discipline) so the cross-subset float sum is an
# exact BIGINT on both engines.
_SHAP_LANGS = ("de", "en", "es", "fr", "zh")
_SHAP_IDX_SQL = (
    "CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1 WHEN 'es' THEN 2"
    " WHEN 'fr' THEN 3 ELSE 4 END"
)
_SHAP_R2 = """
CASE WHEN bn * sxx - sx * sx <= 0 OR bn * syy - sy * sy <= 0 THEN 0.0
     ELSE (CAST(bn * sxy - sx * sy AS DOUBLE)
           * CAST(bn * sxy - sx * sy AS DOUBLE))
          / (CAST(bn * sxx - sx * sx AS DOUBLE)
             * CAST(bn * syy - sy * sy AS DOUBLE))
END
"""


def _shap_oracle() -> str:
    from amorphous_mapreduce_spark.queries.dedup_queries import toks_cte

    return (
        "WITH "
        + toks_cte()
        + f"""
, xt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS x FROM toks GROUP BY id),
dd AS (
    SELECT d.lang, x, CAST(d.n_chars AS BIGINT) AS y
    FROM documents d JOIN xt ON xt.id = d.doc_id
),
mom AS (
    SELECT lang, {_SHAP_IDX_SQL} AS idx, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS msx, CAST(SUM(y) AS BIGINT) AS msy,
           CAST(SUM(x * y) AS BIGINT) AS msxy,
           CAST(SUM(x * x) AS BIGINT) AS msxx,
           CAST(SUM(y * y) AS BIGINT) AS msyy
    FROM dd GROUP BY lang
),
masks AS (SELECT unnest(range(0, 32)) AS mask),
fm AS (
    SELECT mask,
           CAST(COALESCE(SUM(n), 0) AS BIGINT) AS bn,
           CAST(COALESCE(SUM(msx), 0) AS BIGINT) AS sx,
           CAST(COALESCE(SUM(msy), 0) AS BIGINT) AS sy,
           CAST(COALESCE(SUM(msxy), 0) AS BIGINT) AS sxy,
           CAST(COALESCE(SUM(msxx), 0) AS BIGINT) AS sxx,
           CAST(COALESCE(SUM(msyy), 0) AS BIGINT) AS syy
    FROM masks LEFT JOIN mom
      ON (mask // CAST(pow(2, idx) AS BIGINT)) % 2 = 1
    GROUP BY mask
),
fv AS (SELECT mask, {_SHAP_R2} AS r2 FROM fm),
terms AS (
    SELECT m.lang, m.n AS n_docs,
           CAST(FLOOR(((b.r2 - a.r2)
               * CAST(([24, 6, 4, 6, 24])[bit_count(a.mask) + 1] AS DOUBLE))
               * 1048576.0) AS BIGINT) AS t
    FROM mom m
    JOIN fv a ON (a.mask // CAST(pow(2, m.idx) AS BIGINT)) % 2 = 0
    JOIN fv b ON b.mask = a.mask + CAST(pow(2, m.idx) AS BIGINT)
)
SELECT lang, n_docs, CAST(SUM(t) AS BIGINT) AS phi_scaled,
       CAST(CAST(SUM(t) AS BIGINT) AS DOUBLE) / 125829120.0 AS phi,
       (SELECT r2 FROM fv WHERE mask = 31) AS r2_full
FROM terms GROUP BY lang, n_docs
ORDER BY lang
"""
    )


@register("shapley_lang_valuation", _shap_oracle())
def q_shapley_lang_valuation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley data valuation of the five language slices: how
    much does each slice contribute to the pooled linear probe's R^2
    (n_tokens -> n_chars)? The data-market question ("which slice do I
    pay for / drop first") answered with the canonical fair-attribution
    semantics, and — because the characteristic function is built from
    ADDITIVE per-slice OLS moments — computed from ONE corpus scan: all
    2^5 subsets are 6-integer sums over a constant 32-row mask frame,
    the kfold_cv_price_model moment-subtraction algebra generalised to
    subset enumeration.

    Determinism: per-slice moments are exact BIGINT (int64-safe while
    n * sum(x*y) < 2^63, i.e. to ~1e5x this corpus; split hi/lo past
    that); every subset R^2 is the same guarded double expression on
    both engines; each weighted marginal is floor-quantized to 2^-20
    before the cross-subset sum, so phi_scaled is an exact integer and
    the final phi is one double division by 120 * 2^20. Shapley
    efficiency (sum phi = R^2(full)) holds up to 31 quantization ulps
    — r2_full is emitted per row as the self-audit anchor.

    Scale: tokenize + two keyed aggregates over documents; everything
    past `mom` is a 5-to-32-row constant lattice (broadcast joins).
    Reference tie-in: W7 per-key count -> VecOp reduce
    (src/word_count.rs:96-118, src/op.rs:66-106) driving a
    game-theoretic valuation head."""
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    xt = tokenized(docs).groupBy("id").agg(F.count("*").alias("x"))
    dd = docs.select(
        F.col("doc_id").alias("id"), "lang", F.col("n_chars").alias("y")
    ).join(xt, "id")
    mom = (
        dd.groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("msx"),
            F.sum("y").alias("msy"),
            F.sum(F.expr("x * y")).alias("msxy"),
            F.sum(F.expr("x * x")).alias("msxx"),
            F.sum(F.expr("y * y")).alias("msyy"),
        )
        .withColumn("idx", F.expr(_SHAP_IDX_SQL))
        .persist()
    )
    masks = spark.range(0, 32).select(F.col("id").alias("mask"))
    fm = (
        masks.join(
            F.broadcast(mom),
            F.expr("(mask div CAST(pow(2, idx) AS BIGINT)) % 2 = 1"),
            "left",
        )
        .groupBy("mask")
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("bn"),
            F.coalesce(F.sum("msx"), F.lit(0)).cast("long").alias("sx"),
            F.coalesce(F.sum("msy"), F.lit(0)).cast("long").alias("sy"),
            F.coalesce(F.sum("msxy"), F.lit(0)).cast("long").alias("sxy"),
            F.coalesce(F.sum("msxx"), F.lit(0)).cast("long").alias("sxx"),
            F.coalesce(F.sum("msyy"), F.lit(0)).cast("long").alias("syy"),
        )
    )
    fv = fm.select("mask", F.expr(_SHAP_R2).alias("r2")).persist()
    a = fv.select(F.col("mask").alias("amask"), F.col("r2").alias("r2a"))
    b = fv.select(F.col("mask").alias("bmask"), F.col("r2").alias("r2b"))
    terms = (
        mom.select("lang", F.col("n").alias("n_docs"), "idx")
        .join(
            F.broadcast(a),
            F.expr("(amask div CAST(pow(2, idx) AS BIGINT)) % 2 = 0"),
        )
        .join(
            F.broadcast(b),
            F.expr("bmask = amask + CAST(pow(2, idx) AS BIGINT)"),
        )
        .select(
            "lang",
            "n_docs",
            F.expr(
                "CAST(FLOOR(((r2b - r2a)"
                " * CAST(element_at(array(24, 6, 4, 6, 24),"
                "        CAST(bit_count(amask) + 1 AS INT)) AS DOUBLE))"
                " * 1048576.0) AS BIGINT)"
            ).alias("t"),
        )
    )
    full = fv.filter("mask = 31").select(F.col("r2").alias("r2_full"))
    return (
        terms.groupBy("lang", "n_docs")
        .agg(F.sum("t").cast("long").alias("phi_scaled"))
        .crossJoin(F.broadcast(full))
        .select(
            "lang",
            "n_docs",
            "phi_scaled",
            (F.col("phi_scaled").cast("double") / F.lit(125829120.0)).alias(
                "phi"
            ),
            "r2_full",
        )
        .orderBy("lang")
    )


# --- rank-1 ALS matrix factorization (fixed-point, exact) --------------------

# Alternating least squares on the (customer x part) implicit-count
# matrix, rank 1, in Q20 fixed point: each half-sweep is the exact
# closed form u = Sum(r*v)/Sum(v^2) floor-quantized to 2^-20 — so the
# iterative factorization is pure integer dataflow, replayable in SQL.
# Sweep order: u from v0=1, v from u, u again from v; then the fit is
# scored against the observed cells and compared to the global-mean
# baseline (n*Srr - Sr^2 exact-integer SSE identity).

_ALS_Q = 1048576  # 2^20
_ALS_Q2 = 1099511627776  # 2^40


def _als_oracle() -> str:
    return f"""
WITH r AS (
    SELECT o.o_custkey AS u, l.l_partkey AS it,
           CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS r
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
),
uu AS (
    SELECT u, (CAST(SUM(r) AS BIGINT) * {_ALS_Q2})
               // (COUNT(*) * {_ALS_Q}) AS uf
    FROM r GROUP BY u
),
vv AS (
    SELECT it, ({_ALS_Q} * CAST(SUM(r * uf) AS BIGINT))
                // (CAST(SUM(uf * uf) AS BIGINT) // {_ALS_Q}) AS vf
    FROM r JOIN uu USING (u) GROUP BY it
),
u2 AS (
    SELECT u, ({_ALS_Q} * CAST(SUM(r * vf) AS BIGINT))
               // (CAST(SUM(vf * vf) AS BIGINT) // {_ALS_Q}) AS uf2
    FROM r JOIN vv USING (it) GROUP BY u
),
err AS (
    SELECT r.r, (r.r * {_ALS_Q2} - u2.uf2 * vv.vf) // {_ALS_Q} AS e
    FROM r JOIN u2 USING (u) JOIN vv USING (it)
),
se AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(r) AS BIGINT) AS sr,
           CAST(SUM(r * r) AS BIGINT) AS srr,
           CAST((SUM(CAST(e * e AS HUGEINT)) // {_ALS_Q}) AS BIGINT) AS s_hi,
           CAST((SUM(CAST(e * e AS HUGEINT)) % {_ALS_Q}) AS BIGINT) AS s_lo
    FROM err
),
cnts AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM uu) AS n_users,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM vv) AS n_items
)
SELECT n_users, n_items, n AS n_ratings,
       sqrt((CAST(s_hi AS DOUBLE) * {_ALS_Q}.0 + CAST(s_lo AS DOUBLE))
            / CAST(n AS DOUBLE)) / {_ALS_Q}.0 AS rmse_als,
       1.0 - ((CAST(s_hi AS DOUBLE) * {_ALS_Q}.0 + CAST(s_lo AS DOUBLE))
              / {_ALS_Q2}.0)
             / (CAST(n * srr - sr * sr AS DOUBLE) / CAST(n AS DOUBLE))
           AS r2_vs_mean
FROM se CROSS JOIN cnts
"""


@register("als_rank1_backtest", _als_oracle())
def q_als_rank1_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-1 ALS on the customer x part purchase-count matrix with an
    exact fixed-point fit report.

    Each half-sweep is ONE keyed join (ratings x current factors) +
    ONE grouped aggregation — the canonical distributed ALS step; no
    factor ever leaves the cluster.  Q20 floor quantization after every
    closed-form update makes the iteration deterministic and
    SQL-replayable (same discipline as HITS/power-iteration); the
    squared-error sum rides DECIMAL(38,0)/HUGEINT with the hi/lo int64
    split, and the global-mean baseline uses the n*Srr - Sr^2 identity
    so r2_vs_mean is one fixed double expression.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    r = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("it")
        )
        .agg(F.countDistinct("l_orderkey").alias("r"))
        .persist()
    )
    uu = r.groupBy("u").agg(
        F.expr(
            f"(CAST(SUM(r) AS BIGINT) * {_ALS_Q2}) div (COUNT(*) * {_ALS_Q})"
        ).alias("uf")
    )
    vv = (
        r.join(uu, "u")
        .groupBy("it")
        .agg(
            F.expr(
                f"({_ALS_Q} * CAST(SUM(r * uf) AS BIGINT))"
                f" div (CAST(SUM(uf * uf) AS BIGINT) div {_ALS_Q})"
            ).alias("vf")
        )
        .persist()
    )
    u2 = (
        r.join(vv, "it")
        .groupBy("u")
        .agg(
            F.expr(
                f"({_ALS_Q} * CAST(SUM(r * vf) AS BIGINT))"
                f" div (CAST(SUM(vf * vf) AS BIGINT) div {_ALS_Q})"
            ).alias("uf2")
        )
    )
    err = (
        r.join(u2, "u")
        .join(vv, "it")
        .select(
            "r",
            F.expr(f"(r * {_ALS_Q2} - uf2 * vf) div {_ALS_Q}").alias("e"),
        )
    )
    se = err.agg(
        F.count("*").alias("n"),
        F.sum("r").alias("sr"),
        F.sum(F.col("r") * F.col("r")).alias("srr"),
        F.sum((F.col("e") * F.col("e")).cast("decimal(38,0)")).alias("_s"),
    ).select(
        "n",
        "sr",
        "srr",
        (
            (F.col("_s") - F.pmod(F.col("_s"), F.lit(_ALS_Q))) / F.lit(_ALS_Q)
        )
        .cast("long")
        .alias("s_hi"),
        F.pmod(F.col("_s"), F.lit(_ALS_Q)).cast("long").alias("s_lo"),
    )
    cnts = (
        uu.agg(F.count("*").alias("n_users"))
        .crossJoin(vv.agg(F.count("*").alias("n_items")))
    )
    sdoub = F.col("s_hi").cast("double") * F.lit(float(_ALS_Q)) + F.col(
        "s_lo"
    ).cast("double")
    return se.crossJoin(F.broadcast(cnts)).select(
        "n_users",
        "n_items",
        F.col("n").alias("n_ratings"),
        (
            F.sqrt(sdoub / F.col("n").cast("double")) / F.lit(float(_ALS_Q))
        ).alias("rmse_als"),
        (
            F.lit(1.0)
            - (sdoub / F.lit(float(_ALS_Q2)))
            / (
                (F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")).cast(
                    "double"
                )
                / F.col("n").cast("double")
            )
        ).alias("r2_vs_mean"),
    )


# --- exact ROC-AUC of a dedup-predicting score ------------------------------

# The missing classifier-eval primitive (next to Brier bins, confusion,
# nDCG, MRR): EXACT tie-aware Mann-Whitney AUC. AUC = P(score_pos >
# score_neg) + P(=)/2, computed from midranks over the score-grouped
# frame: everything stays INTEGER by carrying 2x ranks —
# sum over score groups of pos_g * (2*cum_before_g + cnt_g + 1) is
# twice the positive rank sum, so
# auc = (rank2_pos - n1*(n1+1)) / (2*n1*n0) with one double division.
# The prefix over score groups rides distributed_prefix_sum (value
# domains are unbounded in general — no single-partition window).

AUC_ORACLE = """
WITH lab AS (
    SELECT n.doc_id, n.n_chars,
           CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END AS pos
    FROM (
        SELECT doc_id, n_chars,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
        FROM documents
    ) n
    JOIN (
        SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h,
               COUNT(*) AS cnt
        FROM documents GROUP BY 1
    ) c ON c.h = n.h
),
grp AS (
    SELECT n_chars AS s, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(pos) AS BIGINT) AS pos_cnt
    FROM lab GROUP BY 1
),
cum AS (
    SELECT s, cnt, pos_cnt,
           CAST(COALESCE(SUM(cnt) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS before_cnt
    FROM grp
),
agg AS (
    SELECT CAST(SUM(pos_cnt) AS BIGINT) AS n1,
           CAST(SUM(cnt - pos_cnt) AS BIGINT) AS n0,
           CAST(SUM(pos_cnt * (2 * before_cnt + cnt + 1)) AS BIGINT)
               AS rank2_pos
    FROM cum
)
SELECT n1 AS n_pos, n0 AS n_neg, rank2_pos,
       CAST(rank2_pos - n1 * (n1 + 1) AS DOUBLE)
           / CAST(NULLIF(2 * n1 * n0, 0) AS DOUBLE) AS auc,
       CAST(rank2_pos - n1 * (n1 + 1) AS DOUBLE)
           / CAST(NULLIF(n1 * n0, 0) AS DOUBLE) - 1.0 AS gini
FROM agg
"""


@register("auc_dup_quality", AUC_ORACLE)
def q_auc_dup_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-aware ROC-AUC of document length as a duplicate
    predictor (labels from normalized-text collision counts): the
    Mann-Whitney construction over score-grouped midranks, twice-scaled
    so every intermediate is BIGINT — AUC and Gini emerge from one
    double division.

    Scale: the label join is the exact-dedup digest aggregate; the
    score frame collapses to one row per distinct score (map-side
    combine), and its running count rides the two-phase distributed
    prefix scan instead of a single-partition window. Determinism:
    integer rank algebra end to end."""
    from amorphous_mapreduce_spark.operators.corpus_stats import (
        distributed_prefix_sum,
    )
    from amorphous_mapreduce_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id", "n_chars", F.md5(normalize_text("text")).alias("h")
    )
    cnt = norm.groupBy("h").agg(F.count("*").alias("cnt"))
    lab = norm.join(cnt, "h").select(
        "n_chars", (F.col("cnt") > 1).cast("int").alias("pos")
    )
    grp = lab.groupBy(F.col("n_chars").alias("s")).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("pos_cnt"),
    )
    cum = distributed_prefix_sum(
        grp, "cnt", ["s"], cum_col="cum_incl", rank_col="_r"
    ).select(
        "s",
        "cnt",
        "pos_cnt",
        (F.col("cum_incl") - F.col("cnt")).alias("before_cnt"),
    )
    agg = cum.agg(
        F.sum("pos_cnt").cast("long").alias("n1"),
        F.sum(F.col("cnt") - F.col("pos_cnt")).cast("long").alias("n0"),
        F.sum(
            F.col("pos_cnt")
            * (2 * F.col("before_cnt") + F.col("cnt") + 1)
        )
        .cast("long")
        .alias("rank2_pos"),
    )
    num = F.col("rank2_pos") - F.col("n1") * (F.col("n1") + 1)
    # NULL-guard the degenerate one-class case (no duplicates at tiny
    # SFs): Spark ANSI raises on /0 where DuckDB would return inf
    den2 = F.nullif(2 * F.col("n1") * F.col("n0"), F.lit(0))
    den1 = F.nullif(F.col("n1") * F.col("n0"), F.lit(0))
    return agg.select(
        F.col("n1").alias("n_pos"),
        F.col("n0").alias("n_neg"),
        "rank2_pos",
        (num.cast("double") / den2.cast("double")).alias("auc"),
        (num.cast("double") / den1.cast("double") - 1.0).alias("gini"),
    )


# --- Matthews correlation of the threshold classifier ------------------------

# The hard-decision companion of auc_dup_quality: dichotomize document
# length at its EXACT median (smallest value with 2*cum >= n over the
# score-group prefix — no float quantile) as an English-vs-rest
# language classifier and report the confusion matrix with
# MCC = (TP*TN - FP*FN)/sqrt((TP+FP)(TP+FN)(TN+FP)(TN+FN)). The
# lang label keeps both classes populated at every SF (full-text
# duplicate labels are EMPTY below sf0.1 in the current fixtures).
# Counts are integers; MCC is sqrt-only — engine-safe like the Wilson
# intervals. The products inside the sqrt are composed in DOUBLE
# (they pass int64 at corpus scale).

MCC_ORACLE = """
WITH lab AS (
    SELECT n_chars, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
    FROM documents
),
grp AS (
    SELECT n_chars AS s, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(pos) AS BIGINT) AS pos_cnt
    FROM lab GROUP BY 1
),
cum AS (
    SELECT s, cnt, pos_cnt,
           CAST(SUM(cnt) OVER (ORDER BY s) AS BIGINT) AS c_incl
    FROM grp
),
tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM grp),
med AS (
    SELECT MIN(s) AS thresh FROM cum CROSS JOIN tot
    WHERE 2 * c_incl >= n
),
conf AS (
    SELECT
        CAST(SUM(CASE WHEN s <= m.thresh THEN pos_cnt ELSE 0 END)
             AS BIGINT) AS tp,
        CAST(SUM(CASE WHEN s <= m.thresh THEN cnt - pos_cnt ELSE 0 END)
             AS BIGINT) AS fp,
        CAST(SUM(CASE WHEN s > m.thresh THEN pos_cnt ELSE 0 END)
             AS BIGINT) AS fn,
        CAST(SUM(CASE WHEN s > m.thresh THEN cnt - pos_cnt ELSE 0 END)
             AS BIGINT) AS tn,
        MAX(m.thresh) AS thresh
    FROM grp CROSS JOIN med m
)
SELECT tp, fp, fn, tn, thresh,
       (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
       / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
              * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)) AS mcc
FROM conf
WHERE tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0
"""


@register("mcc_length_langid", MCC_ORACLE)
def q_mcc_length_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation of "short docs are English" at the exact
    median length threshold — the hard-decision scorecard next to
    auc_dup_quality's ranking view (MCC is the one confusion summary
    that survives class imbalance); near-zero MCC is itself the
    finding (length carries no language signal in this corpus).

    Determinism: the median is the smallest score group with
    2*cum >= n (cross-multiplied, no float quantile); confusion counts
    are integers; MCC is one sqrt-only double expression. Degenerate
    single-class margins filter out identically on both engines.
    Scale: the label join is the exact-dedup digest aggregate; the
    score-group frame is value-domain sized with one bounded window."""
    from amorphous_mapreduce_spark.operators.corpus_stats import (
        distributed_prefix_sum,
    )
    docs = load_table(spark, sf_dir, "documents")
    lab = docs.select(
        "n_chars", (F.col("lang") == "en").cast("int").alias("pos")
    )
    grp = lab.groupBy(F.col("n_chars").alias("s")).agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("pos_cnt"),
    ).persist()  # the prefix scan AND the confusion aggregate read it
    cum = distributed_prefix_sum(
        grp, "cnt", ["s"], cum_col="c_incl", rank_col="_r"
    )
    tot = grp.agg(F.sum("cnt").cast("long").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .filter(2 * F.col("c_incl") >= F.col("n"))
        .agg(F.min("s").alias("thresh"))
    )
    conf = grp.crossJoin(F.broadcast(med)).agg(
        F.sum(F.when(F.col("s") <= F.col("thresh"), F.col("pos_cnt")).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(
            F.when(
                F.col("s") <= F.col("thresh"), F.col("cnt") - F.col("pos_cnt")
            ).otherwise(0)
        )
        .cast("long")
        .alias("fp"),
        F.sum(F.when(F.col("s") > F.col("thresh"), F.col("pos_cnt")).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(
            F.when(
                F.col("s") > F.col("thresh"), F.col("cnt") - F.col("pos_cnt")
            ).otherwise(0)
        )
        .cast("long")
        .alias("tn"),
        F.max("thresh").alias("thresh"),
    )
    tp, fp, fn_, tn = (
        F.col("tp").cast("double"),
        F.col("fp").cast("double"),
        F.col("fn").cast("double"),
        F.col("tn").cast("double"),
    )
    # Per-margin guards, NOT a product: each margin is ~n_docs/2, so the
    # BIGINT product overflows past ~110k docs (ANSI raise / DuckDB
    # out-of-range) — ADVICE_r04 item 1.
    return conf.filter(
        ((F.col("tp") + F.col("fp")) > 0)
        & ((F.col("tp") + F.col("fn")) > 0)
        & ((F.col("tn") + F.col("fp")) > 0)
        & ((F.col("tn") + F.col("fn")) > 0)
    ).select(
        "tp",
        "fp",
        "fn",
        "tn",
        "thresh",
        (
            (tp * tn - fp * fn_)
            / F.sqrt((tp + fp) * (tp + fn_) * (tn + fp) * (tn + fn_))
        ).alias("mcc"),
    )


# --- exact average precision (PR view) of the dup predictor ------------------

# The PR-curve companion of auc_dup_quality's ROC view — the right
# metric under class imbalance. Threshold-sweep form over SCORE GROUPS
# (the sklearn step-function definition, tie-exact):
#   AP = sum_g (pos_g / n_pos) * (cumpos_g / cumcnt_g)
# Each group term is a rational -> floor-quantize pos_g * cumpos_g *
# 2^20 div cumcnt_g (truncating div both engines) before the sum; ONE
# double division by n_pos * 2^20 at the end. Both running totals ride
# distributed_prefix_sum (no single-partition window over the data).

AP_ORACLE = """
WITH lab AS (
    SELECT n.doc_id, n.n_chars,
           CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END AS pos
    FROM (
        SELECT doc_id, n_chars,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h
        FROM documents
    ) n
    JOIN (
        SELECT md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS h,
               COUNT(*) AS cnt
        FROM documents GROUP BY 1
    ) c ON c.h = n.h
),
grp AS (
    SELECT n_chars AS s, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(pos) AS BIGINT) AS pos_cnt
    FROM lab GROUP BY 1
),
cum AS (
    SELECT s, cnt, pos_cnt,
           CAST(SUM(cnt) OVER (ORDER BY s) AS BIGINT) AS cumcnt,
           CAST(SUM(pos_cnt) OVER (ORDER BY s) AS BIGINT) AS cumpos
    FROM grp
),
terms AS (
    SELECT (pos_cnt * cumpos * 1048576) // cumcnt AS tq FROM cum
),
agg AS (
    SELECT CAST(SUM(tq) AS BIGINT) AS ap_num_q FROM terms
),
tot AS (
    SELECT CAST(SUM(pos_cnt) AS BIGINT) AS n_pos,
           CAST(SUM(cnt) AS BIGINT) AS n
    FROM grp
)
SELECT t.n_pos, t.n, a.ap_num_q,
       CAST(a.ap_num_q AS DOUBLE)
           / (CAST(NULLIF(t.n_pos, 0) AS DOUBLE) * 1048576.0)
           AS average_precision,
       CAST(t.n_pos AS DOUBLE) / t.n AS prevalence
FROM agg a CROSS JOIN tot t
"""


@register("average_precision_dup", AP_ORACLE)
def q_average_precision_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision of document length as a duplicate
    predictor (threshold order: shorter first, the same score axis as
    auc_dup_quality) — the PR summary that stays honest under the heavy
    negative majority, with prevalence as the random baseline.

    Determinism: per-threshold precision terms floor-quantize to 2^20
    before the sum; one double division at the end. Scale: the score
    frame is one row per distinct length; both running totals ride the
    two-phase distributed prefix scan."""
    from amorphous_mapreduce_spark.operators.corpus_stats import (
        distributed_prefix_sum,
    )
    from amorphous_mapreduce_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id", "n_chars", F.md5(normalize_text("text")).alias("h")
    )
    cnt = norm.groupBy("h").agg(F.count("*").alias("cnt"))
    lab = norm.join(cnt, "h").select(
        "n_chars", (F.col("cnt") > 1).cast("int").alias("pos")
    )
    grp = (
        lab.groupBy(F.col("n_chars").alias("s"))
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("pos").cast("long").alias("pos_cnt"),
        )
        .persist()  # two prefix scans + the totals all read it
    )
    c1 = distributed_prefix_sum(
        grp, "cnt", ["s"], cum_col="cumcnt", rank_col="_r1"
    ).select("s", "cumcnt")
    c2 = distributed_prefix_sum(
        grp, "pos_cnt", ["s"], cum_col="cumpos", rank_col="_r2"
    ).select("s", "cumpos")
    cum = grp.join(c1, "s").join(c2, "s")
    agg = cum.select(
        F.expr(
            "CAST((pos_cnt * cumpos * 1048576) div cumcnt AS BIGINT)"
        ).alias("tq")
    ).agg(F.sum("tq").cast("long").alias("ap_num_q"))
    tot = grp.agg(
        F.sum("pos_cnt").cast("long").alias("n_pos"),
        F.sum("cnt").cast("long").alias("n"),
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "n_pos",
        "n",
        "ap_num_q",
        (
            F.col("ap_num_q").cast("double")
            / (
                F.nullif(F.col("n_pos"), F.lit(0)).cast("double")
                * F.lit(1048576.0)
            )
        ).alias("average_precision"),
        (F.col("n_pos").cast("double") / F.col("n")).alias("prevalence"),
    )


# --- Fleiss' kappa: multi-rater annotation agreement --------------------------

_FK_H = (
    "CAST('0x' || substr(md5('fk:' || CAST(doc_id AS VARCHAR) || ':' "
    "|| CAST(r.range AS VARCHAR)), 1, 15) AS BIGINT)"
)

FLEISS_ORACLE = f"""
WITH base AS (
    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
    FROM documents
),
tb AS (
    SELECT doc_id, LEAST(4, (n - 10) // 19) AS t FROM base
),
votes AS (
    SELECT doc_id,
           CASE WHEN h % 10 < 6 THEN t ELSE (h // 10) % 5 END AS vote
    FROM (SELECT doc_id, t, {_FK_H} AS h FROM tb, range(5) r)
),
cells AS (
    SELECT doc_id, vote, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM votes GROUP BY doc_id, vote
),
aa AS (
    SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS a,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nitems
    FROM cells
),
cc AS (
    SELECT CAST(SUM(cj * cj) AS BIGINT) AS c
    FROM (SELECT CAST(COUNT(*) AS BIGINT) AS cj FROM votes GROUP BY vote)
),
scal AS (
    SELECT a, c, nitems,
           nitems * 5 AS nn,
           nitems * 20 AS d1,
           CAST(nitems * 5 AS HUGEINT) * CAST(nitems * 5 AS HUGEINT) AS d2
    FROM aa, cc
),
frac AS (
    SELECT *,
           CAST(a - nn AS HUGEINT) * d2
               - CAST(c AS HUGEINT) * CAST(d1 AS HUGEINT) AS num,
           CAST(d1 AS HUGEINT) * (d2 - CAST(c AS HUGEINT)) AS den
    FROM scal
)
SELECT nitems AS n_items,
       CAST(5 AS BIGINT) AS n_raters,
       a AS a_sum,
       c AS c_sum,
       CAST((1000000 * (a - nn)) // d1 AS BIGINT) AS po_ppm,
       CAST((1000000 * CAST(c AS HUGEINT)) // d2 AS BIGINT) AS pe_ppm,
       CAST(CASE WHEN num >= 0 THEN (1000000 * num) // den
                 ELSE -((1000000 * (-num)) // den) END AS BIGINT) AS kappa_ppm
FROM frac
"""


@register("fleiss_kappa", FLEISS_ORACLE)
def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa over a simulated 5-rater annotation pass — the
    multi-rater agreement gate an RLHF/annotation pipeline runs before
    trusting labels (cohens_kappa covers the 2-rater case). Each rater's
    vote is deterministic: with probability 6/10 (portable MD5 bits) the
    doc's length-derived truth bucket, else a pseudo-random category —
    so expected agreement is well above chance but far from 1.

    Exactness: kappa = (Po - Pe)/(1 - Pe) where Po and Pe are rationals
    with denominators Nn(n-1) and (Nn)^2; the query cross-multiplies to
    ONE integer fraction (num/den) and emits floor(1e6 * num / den) via
    integer division only. Products reach ~1e23 at sf10, so Spark
    accumulates in tightly-cast DECIMALs (12+25 digit factors, products
    <= 38) and DuckDB in HUGEINT — CAST BEFORE multiplying, and negative
    numerators route through abs so Spark's decimal floor-division
    (a - pmod(a, b))/b and DuckDB's truncating // agree (CLAUDE.md sign
    rule). den = 0 would need every vote in one category — impossible
    under the 40% noise mix by construction.

    Scale: one scan of documents, a 5-way explode, two keyed aggregates
    (per-item cells, per-category totals) -> 1-row scalar cross. Votes
    persist()ed: both aggregate branches re-read the exploded lineage.
    """
    docs = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n"),
        )
        .repartition(32, "doc_id")
    )
    votes = (
        docs.select(
            "doc_id", F.expr("LEAST(CAST(4 AS BIGINT), (n - 10) div 19)").alias("t")
        )
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(4))))
        .withColumn(
            "h",
            hex_hash64(
                F.concat(
                    F.lit("fk:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("r").cast("string"),
                )
            ),
        )
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN h % 10 < 6 THEN t ELSE (h div 10) % 5 END"
            ).alias("vote"),
        )
        .persist()
    )
    cells = votes.groupBy("doc_id", "vote").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    aa = cells.agg(
        F.sum(F.expr("cnt * cnt")).alias("a"),
        F.countDistinct("doc_id").alias("nitems"),
    )
    cc = (
        votes.groupBy("vote")
        .agg(F.count(F.lit(1)).alias("cj"))
        .agg(F.sum(F.expr("cj * cj")).alias("c"))
    )
    return (
        aa.crossJoin(F.broadcast(cc))
        .withColumn("nn", F.expr("nitems * CAST(5 AS BIGINT)"))
        .withColumn("d1", F.expr("nitems * CAST(20 AS BIGINT)"))
        .withColumn(
            "d2",
            F.expr("CAST(nn AS DECIMAL(12,0)) * CAST(nn AS DECIMAL(12,0))"),
        )
        .withColumn(
            "num",
            F.expr(
                "CAST(a - nn AS DECIMAL(12,0)) * d2"
                " - CAST(c AS DECIMAL(18,0)) * CAST(d1 AS DECIMAL(12,0))"
            ),
        )
        .withColumn(
            "den",
            F.expr(
                "CAST(d1 AS DECIMAL(12,0))"
                " * (d2 - CAST(c AS DECIMAL(25,0)))"
            ),
        )
        .select(
            F.col("nitems").alias("n_items"),
            F.lit(5).cast("long").alias("n_raters"),
            F.col("a").alias("a_sum"),
            F.col("c").alias("c_sum"),
            F.expr("(1000000 * (a - nn)) div d1").alias("po_ppm"),
            F.expr(
                "CAST((CAST(c AS DECIMAL(18,0)) * 1000000"
                " - pmod(CAST(c AS DECIMAL(18,0)) * 1000000, d2)) / d2"
                " AS BIGINT)"
            ).alias("pe_ppm"),
            F.expr(
                "CAST(CASE WHEN num >= 0 THEN"
                " (num * 1000000 - pmod(num * 1000000, den)) / den"
                " ELSE -((-num * 1000000 - pmod(-num * 1000000, den)) / den)"
                " END AS BIGINT)"
            ).alias("kappa_ppm"),
        )
    )


# --- unbiased pass@k estimator ------------------------------------------------

# C(10-c, k) for c = 0..10, k in {1, 5}; C(10,1) = 10, C(10,5) = 252.
_PAK_LUT = {1: [10, 9, 8, 7, 6, 5, 4, 3, 2, 1, 0],
            5: [252, 126, 56, 21, 6, 1, 0, 0, 0, 0, 0]}
_PAK_DENOM = {1: 10, 5: 252}

_PAK_H = (
    "CAST('0x' || substr(md5('pak:' || CAST(doc_id AS VARCHAR) || ':' ||"
    " CAST(s.range AS VARCHAR)), 1, 15) AS BIGINT)"
)

PASS_AT_K_ORACLE = f"""
WITH samples AS (
    SELECT doc_id,
           CASE WHEN {_PAK_H} % 10
                     < 1 + CAST('0x' || substr(md5('pakd:' ||
                           CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 5
                THEN 1 ELSE 0 END AS pass
    FROM documents, range(10) s
),
tasks AS (
    SELECT doc_id, CAST(SUM(pass) AS BIGINT) AS c
    FROM samples GROUP BY doc_id
),
per_k AS (
    SELECT k.k,
           CAST(COUNT(*) AS BIGINT) AS n_tasks,
           CAST(SUM(CASE k.k
                    WHEN 1 THEN ([{", ".join(str(v) for v in _PAK_LUT[1])}])[c + 1]
                    ELSE ([{", ".join(str(v) for v in _PAK_LUT[5])}])[c + 1]
                    END) AS BIGINT) AS miss_num
    FROM tasks CROSS JOIN (SELECT unnest([1, 5]) AS k) k
    GROUP BY k.k
)
SELECT k, n_tasks,
       CASE k WHEN 1 THEN 10 ELSE 252 END AS denom_per_task,
       CAST(1000000 - (1000000 * miss_num)
            // (n_tasks * CASE k WHEN 1 THEN 10 ELSE 252 END) AS BIGINT)
           AS pass_at_k_ppm_floor
FROM per_k
ORDER BY k
"""


@register("pass_at_k_estimate", PASS_AT_K_ORACLE)
def q_pass_at_k_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbiased pass@k (the HumanEval estimator): per task, n = 10
    deterministic samples with heterogeneous per-task pass rates
    (10%..50%, two portable MD5 draws); pass@k = 1 - C(n-c, k)/C(n, k)
    averaged over tasks for k in {1, 5} — the eval-summary statistic
    every code/reasoning benchmark pipeline computes from sampled
    generations.

    Exactness: each task's miss probability has the CONSTANT denominator
    C(10, k), so the mean collapses to ONE integer fraction
    Σ C(10-c_i, k) / (N·C(10,k)) — the binomials come from an 11-entry
    literal LUT shared by both engines (element_at / list indexing),
    and the final ppm is a single integer floor-division. No float
    accumulation anywhere.

    Scale: one 10-way sample explode (map-side combinable count), one
    per-task aggregate, then a constant 2-row k-sweep — linear in tasks.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    hd = hex_hash64(F.concat(F.lit("pakd:"), F.col("doc_id").cast("string")))
    samples = (
        docs.repartition(32, "doc_id")
        .withColumn("thr", 1 + hd % 5)
        .withColumn("s", F.explode(F.sequence(F.lit(0), F.lit(9))))
        .withColumn(
            "h",
            hex_hash64(
                F.concat(
                    F.lit("pak:"),
                    F.col("doc_id").cast("string"),
                    F.lit(":"),
                    F.col("s").cast("string"),
                )
            ),
        )
        .select(
            "doc_id",
            F.when(F.col("h") % 10 < F.col("thr"), 1).otherwise(0).alias("pass"),
        )
    )
    tasks = samples.groupBy("doc_id").agg(F.sum("pass").alias("c"))
    lut1 = ", ".join(str(v) for v in _PAK_LUT[1])
    lut5 = ", ".join(str(v) for v in _PAK_LUT[5])
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(5))).alias("k")
    )
    per_k = (
        tasks.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_tasks"),
            F.sum(
                F.expr(
                    f"CASE k WHEN 1 THEN element_at(array({lut1}),"
                    f" CAST(c + 1 AS INT))"
                    f" ELSE element_at(array({lut5}), CAST(c + 1 AS INT)) END"
                )
            ).alias("miss_num"),
        )
    )
    return per_k.select(
        "k",
        "n_tasks",
        F.expr("CASE k WHEN 1 THEN CAST(10 AS BIGINT)"
               " ELSE CAST(252 AS BIGINT) END").alias("denom_per_task"),
        F.expr(
            "CAST(1000000 - (1000000 * miss_num)"
            " div (n_tasks * CASE k WHEN 1 THEN 10 ELSE 252 END) AS BIGINT)"
        ).alias("pass_at_k_ppm_floor"),
    ).orderBy("k")


# --- WOE / Information-Value scorecard -----------------------------------------

WOE_IV_ORACLE = f"""
WITH bins AS (
    SELECT CAST(CAST(l_discount AS DECIMAL(3,2)) * 100 AS BIGINT)
               AS discount_pct,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END)
                AS BIGINT) AS n_good,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_bad
    FROM lineitem GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n_good) AS BIGINT) AS g,
           CAST(SUM(n_bad) AS BIGINT) AS b
    FROM bins
),
scored AS (
    SELECT bins.discount_pct, bins.n_good, bins.n_bad,
           ({log2_scaled_sql('bins.n_good')} - {log2_scaled_sql('tot.g')})
           - ({log2_scaled_sql('bins.n_bad')} - {log2_scaled_sql('tot.b')})
               AS woe_q,
           (1000000 * bins.n_good) // tot.g
           - (1000000 * bins.n_bad) // tot.b AS share_diff_ppm
    FROM bins CROSS JOIN tot
)
SELECT discount_pct, n_good, n_bad, woe_q, share_diff_ppm,
       share_diff_ppm * woe_q AS iv_contrib_q,
       CAST(SUM(share_diff_ppm * woe_q) OVER () AS BIGINT) AS iv_total_q
FROM scored
ORDER BY discount_pct
"""


@register("woe_iv_scorecard", WOE_IV_ORACLE)
def q_woe_iv_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value scorecard — the classic
    credit-risk binning diagnostic — for the discount feature against
    the return outcome: per discount bin, WOE = log2(good share) -
    log2(bad share) in integer 2^-20 units (the libm-free intlog LUT,
    so both engines emit the identical integer), the share difference
    quantized to ppm BEFORE multiplying (quantize-then-sum convention),
    and each bin's IV contribution plus the windowed total.

    Precondition (documented, not guarded): every bin holds both
    classes — true by construction for the 11-value discount domain at
    every fixture SF (the smallest bin/class cell is >100 rows at
    sf0.001); log2_scaled requires counts >= 1.

    Scale: one map-side-combined groupBy over lineitem -> an 11-row
    frame crossed with a 1-row total; everything after the first
    aggregate is constant-size.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_discount").cast("decimal(3,2)") * 100)
        .cast("long")
        .alias("discount_pct"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("bad"),
    )
    bins = li.groupBy("discount_pct").agg(
        F.sum(1 - F.col("bad")).cast("long").alias("n_good"),
        F.sum("bad").cast("long").alias("n_bad"),
    )
    tot = bins.agg(
        F.sum("n_good").cast("long").alias("g"),
        F.sum("n_bad").cast("long").alias("b"),
    )
    scored = bins.crossJoin(F.broadcast(tot)).select(
        "discount_pct",
        "n_good",
        "n_bad",
        (
            (log2_scaled("n_good") - log2_scaled("g"))
            - (log2_scaled("n_bad") - log2_scaled("b"))
        ).alias("woe_q"),
        (
            F.expr("(1000000 * n_good) div g")
            - F.expr("(1000000 * n_bad) div b")
        ).alias("share_diff_ppm"),
    )
    w = Window.partitionBy()
    return scored.select(
        "discount_pct",
        "n_good",
        "n_bad",
        "woe_q",
        "share_diff_ppm",
        (F.col("share_diff_ppm") * F.col("woe_q")).alias("iv_contrib_q"),
        F.sum(F.col("share_diff_ppm") * F.col("woe_q"))
        .over(w)
        .cast("long")
        .alias("iv_total_q"),
    ).orderBy("discount_pct")
