"""Insight battery: association rules, information-theoretic audits,
containment dedup, seasonal decomposition, and survival hazard.

Families this module completes:

- privacy: ``l_diversity_audit`` joins k_anonymity / t_closeness /
  dp_randomized_response (distinct + entropy l-diversity of the sensitive
  attribute per equivalence class, entropy via the integer log2 LUT);
- dedup: ``shingle_containment_pairs`` adds Broder's ASYMMETRIC
  containment (quote / partial-dup detection) beside the symmetric
  Jaccard / MinHash / SimHash family;
- association: ``brand_association_rules`` (support/confidence/lift
  market-basket rules) beside cross_sell_matrix / frequent_part_triples;
  ``mi_lang_source`` (mutual information scorecard) beside
  cramers_v_association / lang_source_contingency;
- time series: ``seasonal_dow_decomposition`` (additive trend/seasonal
  split) beside daily_revenue_ma7 / seasonal_spike_flags;
- survival: ``nelson_aalen_hazard`` (cumulative-hazard estimator) beside
  the Kaplan-Meier session_survival_curve.

Reference tie-in: every query is scan -> keyed partial aggregate ->
merge, the reference's W1/W6/W7 pipeline (src/word_count.rs:90-128)
over relational keys; the containment query is its hashed-token
inverted index (W6) driving an equi-join.

Cross-engine determinism: counts stay BIGINT (every DuckDB SUM is cast
back — the HUGEINT trap); logarithms go through functions.intlog (the
256-entry LUT shared verbatim by both engines); every double is ONE
division of two exact int64s (IEEE-identical on both engines); hazards
are 2^20-scaled integer divisions (Spark ``div`` == DuckDB ``//``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.intlog import (
    LOG2_SCALE,
    log2_scaled,
    log2_scaled_sql,
)
from amorphous_mapreduce_spark.operators.dedup import containment_pairs
from amorphous_mapreduce_spark.queries.dedup_queries import shingles_cte
from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

# --- l-diversity audit ------------------------------------------------------

# Same quasi-identifier as k_anonymity (nation, mktsegment-free band) —
# here the QI is (nation, $200 balance band) and the SENSITIVE attribute
# is the market segment: distinct l-diversity is the number of distinct
# segments per equivalence class, entropy l-diversity its Shannon
# refinement. Entropy per class, 2^20-scaled and truncated:
#   ent = (n*log2s(n) - sum_c c*log2s(c)) div n        (>= 0, integer)
_LD_ENT = (
    f"(n_rows_g * {log2_scaled_sql('n_rows_g')}"
    f" - ent_sum) // n_rows_g"
)

LDIV_ORACLE = f"""
WITH cls AS (
    SELECT c_nationkey,
           CAST(floor(CAST(c_acctbal AS DECIMAL(12,2)) / 200) AS BIGINT)
               AS band,
           c_mktsegment,
           COUNT(*) AS c
    FROM customer GROUP BY 1, 2, 3
),
grp AS (
    SELECT c_nationkey, band,
           CAST(COUNT(*) AS BIGINT) AS l,
           CAST(SUM(c) AS BIGINT) AS n_rows_g,
           CAST(SUM(c * {log2_scaled_sql('c')}) AS BIGINT) AS ent_sum
    FROM cls GROUP BY 1, 2
)
SELECT l AS l_value,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(n_rows_g) AS BIGINT) AS n_rows,
       CAST(MIN({_LD_ENT}) AS BIGINT) AS min_ent_scaled,
       CAST(MAX({_LD_ENT}) AS BIGINT) AS max_ent_scaled
FROM grp GROUP BY l
"""


@register("l_diversity_audit", LDIV_ORACLE)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit of the customer table: for the quasi-identifier
    (nation, $200 balance band), the distribution of DISTINCT
    l-diversity (how many distinct market segments each equivalence
    class contains) plus the min/max ENTROPY l-diversity per l bucket —
    the release gate that catches classes k-anonymity passes but where
    everyone shares one sensitive value (l=1 rows are the leak).

    Entropy is the integer-LUT log2 (functions.intlog) so the score is
    bit-identical on both engines: per class,
    (n*log2s(n) - sum c*log2s(c)) div n.

    Scale: two nested keyed aggregates (QI+segment, then QI), both
    map-side combined; the l histogram is tiny. No doubles anywhere."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(
        F.col("c_acctbal").cast("decimal(12,2)") / F.lit(200)
    ).cast("long")
    cls = (
        cust.select("c_nationkey", band.alias("band"), "c_mktsegment")
        .groupBy("c_nationkey", "band", "c_mktsegment")
        .agg(F.count("*").alias("c"))
    )
    grp = cls.groupBy("c_nationkey", "band").agg(
        F.count("*").alias("l"),
        F.sum("c").alias("n_rows_g"),
        F.sum(F.col("c") * log2_scaled("c")).alias("ent_sum"),
    )
    grp = grp.withColumn("__ls_n", log2_scaled("n_rows_g"))
    ent = F.expr("(n_rows_g * __ls_n - ent_sum) div n_rows_g")
    return (
        grp.withColumn("ent_scaled", ent)
        .groupBy(F.col("l").alias("l_value"))
        .agg(
            F.count("*").alias("n_groups"),
            F.sum("n_rows_g").alias("n_rows"),
            F.min("ent_scaled").alias("min_ent_scaled"),
            F.max("ent_scaled").alias("max_ent_scaled"),
        )
    )


# --- market-basket association rules ----------------------------------------

# Support threshold is RELATIVE (0.5% of baskets, cross-multiplied
# integers) so the rule set scales with SF instead of emptying out or
# exploding.
RULES_ORACLE = """
WITH bk AS (
    SELECT DISTINCT l_orderkey AS o, p_brand AS b
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
nb AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_baskets FROM bk),
cb AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cnt FROM bk GROUP BY b),
pr AS (
    SELECT a.b AS antecedent, c.b AS consequent,
           CAST(COUNT(*) AS BIGINT) AS cnt_ab
    FROM bk a JOIN bk c ON a.o = c.o AND a.b <> c.b
    GROUP BY 1, 2
)
SELECT antecedent, consequent, cnt_ab,
       ca.cnt AS cnt_ante, cc.cnt AS cnt_cons, n_baskets,
       CAST(cnt_ab AS DOUBLE) / CAST(ca.cnt AS DOUBLE) AS confidence,
       CAST(cnt_ab * n_baskets AS DOUBLE) / CAST(ca.cnt * cc.cnt AS DOUBLE)
           AS lift
FROM pr
JOIN cb ca ON ca.b = antecedent
JOIN cb cc ON cc.b = consequent
CROSS JOIN nb
WHERE cnt_ab * 1000 >= n_baskets * 5
"""


@register("brand_association_rules", RULES_ORACLE)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules at brand grain: for every ordered
    brand pair bought together in >= 0.5% of orders, the support count,
    confidence P(cons|ante) and lift — the classic recommender/planogram
    signal, with the threshold cross-multiplied in integers so it is
    SF-relative and division-free.

    Scale: baskets are one keyed join (lineitem x part) + distinct; the
    pair join fans out per order by (brands-per-order)^2 — bounded by the
    brand cardinality (25), not by order size. Brand marginals and the
    basket total are tiny broadcast frames. The only doubles are two
    single divisions of exact int64 products (< 2^53)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bk = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("p_brand").alias("b"))
        .distinct()
        .persist()  # read by marginals, total, and BOTH pair-join sides
    )
    nb = bk.agg(F.countDistinct("o").alias("n_baskets"))
    cb = bk.groupBy("b").agg(F.count("*").alias("cnt"))
    pr = (
        bk.select(F.col("o"), F.col("b").alias("antecedent"))
        .join(bk.select("o", F.col("b").alias("consequent")), "o")
        .filter(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("cnt_ab"))
    )
    return (
        pr.join(
            F.broadcast(cb.select(F.col("b").alias("antecedent"), F.col("cnt").alias("cnt_ante"))),
            "antecedent",
        )
        .join(
            F.broadcast(cb.select(F.col("b").alias("consequent"), F.col("cnt").alias("cnt_cons"))),
            "consequent",
        )
        .crossJoin(F.broadcast(nb))
        .filter(F.col("cnt_ab") * 1000 >= F.col("n_baskets") * 5)
        .select(
            "antecedent",
            "consequent",
            "cnt_ab",
            "cnt_ante",
            "cnt_cons",
            "n_baskets",
            (F.col("cnt_ab").cast("double") / F.col("cnt_ante").cast("double")).alias(
                "confidence"
            ),
            (
                (F.col("cnt_ab") * F.col("n_baskets")).cast("double")
                / (F.col("cnt_ante") * F.col("cnt_cons")).cast("double")
            ).alias("lift"),
        )
    )


# --- shingle containment (asymmetric near-dup) ------------------------------

CONTAIN_THRESHOLD = 0.6
CONTAIN_MAX_DF = 1000

CONTAIN_ORACLE = (
    "WITH "
    + shingles_cte()
    + f"""
, capped AS (
    SELECT s.id, s.sh FROM shingles s
    JOIN (SELECT sh FROM shingles GROUP BY sh
          HAVING COUNT(*) <= {CONTAIN_MAX_DF}) rare USING (sh)
),
sizes AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS sz FROM capped GROUP BY id),
inters AS (
    SELECT a.id AS qid, b.id AS nid, CAST(COUNT(*) AS BIGINT) AS inter
    FROM capped a JOIN capped b USING (sh)
    WHERE a.id <> b.id
    GROUP BY 1, 2
)
SELECT qid, nid, inter, qs.sz AS qsz, ns.sz AS nsz,
       CAST(inter AS DOUBLE) / CAST(qs.sz AS DOUBLE) AS containment
FROM inters
JOIN sizes qs ON qs.id = qid
JOIN sizes ns ON ns.id = nid
WHERE CAST(inter AS DOUBLE) / CAST(qs.sz AS DOUBLE) >= {CONTAIN_THRESHOLD}
"""
)


@register("shingle_containment_pairs", CONTAIN_ORACLE)
def q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment |A∩B|/|A| >= 0.6 — the quote /
    partial-duplication detector: a passage embedded in a longer document
    scores ~1 from the short side even when Jaccard (union-normalised)
    is low. Pairs are ordered (qid contained in nid) and the hot-shingle
    df cap is mirrored in the oracle, so both engines score the identical
    capped vocabulary."""
    return containment_pairs(
        load_table(spark, sf_dir, "documents"),
        threshold=CONTAIN_THRESHOLD,
        max_df=CONTAIN_MAX_DF,
    )


# --- mutual information scorecard -------------------------------------------

MI_ORACLE = f"""
WITH cells AS (
    SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS c
    FROM documents GROUP BY 1, 2
),
rl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cl FROM documents GROUP BY 1),
rs AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS cs FROM documents GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
mi AS (
    SELECT CAST(SUM(c * ({log2_scaled_sql('c * n')}
                         - {log2_scaled_sql('cl * cs')})) AS BIGINT) AS mi_num
    FROM cells JOIN rl USING (lang) JOIN rs USING (source) CROSS JOIN nn
),
hl AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_langs,
           CAST(SUM(cl * {log2_scaled_sql('cl')}) AS BIGINT) AS lsum
    FROM rl
),
hs AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           CAST(SUM(cs * {log2_scaled_sql('cs')}) AS BIGINT) AS ssum
    FROM rs
)
SELECT n AS n_docs, n_langs, n_sources, mi_num,
       CAST(mi_num AS DOUBLE) / CAST(n * {LOG2_SCALE} AS DOUBLE) AS mi_bits,
       CAST(n * {log2_scaled_sql('n')} - lsum AS DOUBLE)
           / CAST(n * {LOG2_SCALE} AS DOUBLE) AS ent_lang_bits,
       CAST(n * {log2_scaled_sql('n')} - ssum AS DOUBLE)
           / CAST(n * {LOG2_SCALE} AS DOUBLE) AS ent_source_bits
FROM mi CROSS JOIN hl CROSS JOIN hs CROSS JOIN nn
"""


@register("mi_lang_source", MI_ORACLE)
def q_mi_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between document language and source (plus the
    two marginal entropies) — the scalar 'how much does source determine
    language' beside the per-cell lang_source_contingency lift view.
    I(L;S) = sum_cells c/n * log2(c*n / (cl*cs)), computed as INTEGER
    contributions via the shared log2 LUT (c * (log2s(c*n) -
    log2s(cl*cs))), one double division at the end — bit-identical on
    both engines, no libm.

    Scale: one cell aggregate (|langs|x|sources| rows) + two marginal
    aggregates, marginals broadcast back; everything after the scan is
    sub-kilobyte."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("c"))
    rl = docs.groupBy("lang").agg(F.count("*").alias("cl"))
    rs = docs.groupBy("source").agg(F.count("*").alias("cs"))
    nn = docs.agg(F.count("*").alias("n"))
    mi = (
        cells.join(F.broadcast(rl), "lang")
        .join(F.broadcast(rs), "source")
        .crossJoin(F.broadcast(nn))
        .withColumn("term", F.col("c") * (log2_scaled("c * n") - log2_scaled("cl * cs")))
        .agg(F.sum("term").alias("mi_num"))
    )
    hl = rl.withColumn("t", F.col("cl") * log2_scaled("cl")).agg(
        F.count("*").alias("n_langs"), F.sum("t").alias("lsum")
    )
    hs = rs.withColumn("t", F.col("cs") * log2_scaled("cs")).agg(
        F.count("*").alias("n_sources"), F.sum("t").alias("ssum")
    )
    denom = (F.col("n") * LOG2_SCALE).cast("double")
    return (
        mi.crossJoin(hl)
        .crossJoin(hs)
        .crossJoin(nn)
        .withColumn("__ls_n", log2_scaled("n"))
        .select(
            F.col("n").alias("n_docs"),
            "n_langs",
            "n_sources",
            "mi_num",
            (F.col("mi_num").cast("double") / denom).alias("mi_bits"),
            (
                (F.col("n") * F.col("__ls_n") - F.col("lsum")).cast("double") / denom
            ).alias("ent_lang_bits"),
            (
                (F.col("n") * F.col("__ls_n") - F.col("ssum")).cast("double") / denom
            ).alias("ent_source_bits"),
        )
    )


# --- additive day-of-week seasonal decomposition ----------------------------

SEASONAL_ORACLE = """
WITH daily AS (
    SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS d,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
                         AS BIGINT)) AS BIGINT) AS rev_c
    FROM orders GROUP BY 1
),
ma AS (
    SELECT daily.d + off.range AS center,
           CAST(SUM(rev_c) AS BIGINT) AS sum7,
           CAST(COUNT(*) AS BIGINT) AS cnt7
    FROM daily CROSS JOIN range(-3, 4) off
    GROUP BY 1
),
detr AS (
    SELECT v.d, (v.d + 4) % 7 AS dow,
           v.rev_c, 7 * v.rev_c - m.sum7 AS detr_num
    FROM daily v JOIN ma m ON m.center = v.d
    WHERE m.cnt7 = 7
)
SELECT dow,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM(detr_num) AS BIGINT) AS detr_sum,
       CAST(SUM(detr_num) AS DOUBLE) / CAST(7 * COUNT(*) AS DOUBLE)
           AS seasonal_cents,
       CAST(SUM(rev_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
           AS mean_daily_cents
FROM detr GROUP BY dow
"""


@register("seasonal_dow_decomposition", SEASONAL_ORACLE)
def q_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily order revenue at
    day-of-week grain: trend = centered 7-day moving average, seasonal =
    per-dow mean of the detrended series. The detrended value is kept
    as the INTEGER 7*v - sum7 (cents scaled by 7) so the cross-day sum
    is exact — the only doubles are final single divisions. Day-of-week
    is the engine-independent (epoch_day + 4) % 7 (day 0 = Thursday).

    Scale: the centered MA is the explode-shift contribution pattern
    (each day posts itself to its 7 neighbor centers — one keyed
    aggregate, NO global window); day cardinality is bounded by the
    calendar, not the data."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.expr(
            "unix_micros(cast(o_orderdate as timestamp)) div 86400000000"
        ).alias("d")
    ).agg(
        F.sum(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("bigint")
        ).alias("rev_c")
    )
    daily = daily.persist()  # read by the MA contributions AND the join-back
    ma = (
        daily.select(
            F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("off"), "d", "rev_c"
        )
        .groupBy((F.col("d") + F.col("off")).alias("center"))
        .agg(F.sum("rev_c").alias("sum7"), F.count("*").alias("cnt7"))
    )
    detr = (
        daily.join(ma, daily.d == ma.center)
        .filter(F.col("cnt7") == 7)
        .select(
            F.pmod(F.col("d") + 4, F.lit(7)).cast("long").alias("dow"),
            "rev_c",
            (F.lit(7) * F.col("rev_c") - F.col("sum7")).alias("detr_num"),
        )
    )
    return detr.groupBy("dow").agg(
        F.count("*").alias("n_days"),
        F.sum("detr_num").alias("detr_sum"),
        (
            F.sum("detr_num").cast("double")
            / (F.lit(7) * F.count("*")).cast("double")
        ).alias("seasonal_cents"),
        (F.sum("rev_c").cast("double") / F.count("*").cast("double")).alias(
            "mean_daily_cents"
        ),
    )


# --- Nelson-Aalen cumulative hazard -----------------------------------------

HAZARD_ORACLE = """
WITH lastw AS (
    SELECT o_custkey,
           CAST(MAX(year(o_orderdate) * 12 + month(o_orderdate) - 1)
                AS BIGINT) AS w
    FROM orders GROUP BY 1
),
d AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS deaths FROM lastw GROUP BY 1),
risk AS (
    SELECT a.w, a.deaths, CAST(SUM(b.deaths) AS BIGINT) AS n_risk
    FROM d a JOIN d b ON b.w >= a.w
    GROUP BY 1, 2
),
haz AS (
    SELECT w, deaths, n_risk,
           (deaths * 1048576) // n_risk AS haz_scaled
    FROM risk
)
SELECT a.w AS month_idx, a.deaths, a.n_risk, a.haz_scaled,
       CAST(SUM(b.haz_scaled) AS BIGINT) AS cumhaz_scaled
FROM haz a JOIN haz b ON b.w <= a.w
GROUP BY 1, 2, 3, 4
"""


@register("nelson_aalen_hazard", HAZARD_ORACLE)
def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator for customer churn: a
    customer 'dies' in the month of their last order; per month, the
    deaths d_m, the risk set n_m (customers still alive entering the
    month), the hazard increment d_m/n_m and the cumulative hazard H(m)
    — the actuarial view beside the Kaplan-Meier session_survival_curve
    (right-censoring at the dataset edge is part of the spec: the last
    months read as mass churn, as any fixed-horizon estimate does).

    Hazards are 2^20-scaled integer divisions (Spark div == DuckDB //)
    summed as integers, so the running H(m) is exact and bit-identical —
    the quantization IS the spec (error < 2^-20 per month).

    Scale: one keyed aggregate over customers; everything after is on
    the month-indexed frame whose cardinality is bounded by the calendar
    (~tens of rows), where the triangular suffix/prefix joins are
    constant-size — no global window over customer-scale data."""
    orders = load_table(spark, sf_dir, "orders")
    lastw = orders.groupBy(F.col("o_custkey")).agg(
        F.max(
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        ).cast("long").alias("w")
    )
    d = lastw.groupBy("w").agg(F.count("*").alias("deaths"))
    d = d.persist()  # tiny; read by both sides of two triangular joins
    b = d.select(F.col("w").alias("bw"), F.col("deaths").alias("bd"))
    risk = (
        d.join(b, F.col("bw") >= F.col("w"))
        .groupBy("w", "deaths")
        .agg(F.sum("bd").alias("n_risk"))
    )
    haz = risk.withColumn(
        "haz_scaled", F.expr("(deaths * 1048576) div n_risk")
    )
    hb = haz.select(F.col("w").alias("hw"), F.col("haz_scaled").alias("hs"))
    return (
        haz.join(hb, F.col("hw") <= F.col("w"))
        .groupBy(
            F.col("w").alias("month_idx"), "deaths", "n_risk", "haz_scaled"
        )
        .agg(F.sum("hs").alias("cumhaz_scaled"))
    )
