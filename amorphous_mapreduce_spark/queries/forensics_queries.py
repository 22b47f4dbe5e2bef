"""Data-forensics battery: Benford first-digit audit + value-proximity
band join.

Two anomaly-hunting shapes a warehouse runs over financial-ish columns:
- benford_audit — the first-significant-digit distribution of order
  values against Benford's law, the classic fabricated-data screen.
- value_band_pairs — a banded theta-join (|value_a - value_b| <= 1
  cent) turned into a hash join by integer-cent bucketing, the
  suspicious-coincidence detector (split transactions, duplicate
  postings) whose naive form is a quadratic nested loop.

Reference tie-in: both are scan + keyed-aggregate / keyed-join
compositions of the reference's W1/W7 primitives (src/word_count.rs);
the band join is the same bucketize-to-equi-join rewrite the engine
uses for time-range joins (operators/temporal.range_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table

# --- Benford first-digit audit ----------------------------------------------

# log10(1 + 1/d) for d = 1..9, as exact double literals shared verbatim
# with the SQL oracle (no engine evaluates a log at query time).
_BENFORD_P = [
    "0.3010299956639812",
    "0.17609125905568124",
    "0.12493873660829992",
    "0.09691001300805642",
    "0.07918124604762482",
    "0.06694678963061322",
    "0.05799194697768673",
    "0.05115252244738129",
    "0.04575749056067514",
]

_P_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD_P, start=1)
) + " END"

BENFORD_ORACLE = f"""
WITH cents AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
    FROM orders WHERE o_totalprice > 0
),
digits AS (
    SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
    FROM cents
),
obs AS (
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM digits
    GROUP BY digit
),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
SELECT digit, n_obs,
       CAST(n AS DOUBLE) * ({_P_CASE}) AS expected,
       (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_P_CASE}))
           * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_P_CASE}))
           / (CAST(n AS DOUBLE) * ({_P_CASE})) AS chi_term
FROM obs CROSS JOIN tot
"""


@register("benford_audit", BENFORD_ORACLE)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order values: observed counts
    per leading digit next to the Benford-expected count and the
    per-digit chi-square contribution — the screen auditors run for
    fabricated or constrained financial data.

    Digits come from the exact integer-cent representation (decimal
    cast, then string head — no float log, no engine-specific rounding);
    expectations use shared literal probabilities, so the only float
    math is one identical fixed expression per row. Scale: a scan, a
    9-row aggregate, and a broadcast scalar total."""
    cents = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("c")
        )
    )
    obs = (
        cents.select(F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n_obs"))
    )
    tot = obs.agg(F.sum("n_obs").alias("n"))
    p = F.expr(_P_CASE)
    nd = F.col("n").cast("double")
    expected = nd * p
    diff = F.col("n_obs").cast("double") - expected
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        expected.alias("expected"),
        (diff * diff / expected).alias("chi_term"),
    )


# --- value-proximity band join ----------------------------------------------

# The oracle mirrors the engine's bucketize-to-equi-join rewrite (each
# qualifying pair is found by exactly ONE of the three probe buckets, so
# the counts are identical to the naive BETWEEN form). Round 6: the
# original IEJoin-form oracle was semantically the same but ground for
# ~1h at the sf1 rung (~1e9 intermediate pairs through DuckDB's
# inequality join); the equi-join form verifies the same counts in
# seconds at every rung.
BAND_ORACLE = """
WITH ev AS (
    SELECT event_id,
           event_type,
           CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
    FROM events
),
probes AS (
    SELECT event_id, event_type,
           unnest([cents - 1, cents, cents + 1]) AS b
    FROM ev
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_pairs,
       CAST(MIN(a.event_id) AS BIGINT) AS min_event_a
FROM probes a JOIN ev b
  ON b.cents = a.b
 AND a.event_id < b.event_id
GROUP BY a.event_type, b.event_type
"""


@register("value_band_pairs", BAND_ORACLE)
def q_value_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded theta-join: pairs of events whose values agree within one
    cent (suspicious-coincidence / duplicate-posting detection), counted
    per event-type pair.

    The inequality predicate |c_a - c_b| <= 1 becomes a HASH join by
    bucketing on integer cents and probing the three neighbor buckets
    (explode of offsets {-1, 0, +1}) — the same rewrite the engine uses
    for time-range joins. Fanout is bounded by per-cent-bucket
    occupancy, never |events|²; the oracle states the naive BETWEEN
    form, which DuckDB runs as an IEJoin at test SF."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(12,2)") * 100).cast("long").alias("cents"),
    )
    probe = ev.select(
        F.col("event_id").alias("id_a"),
        F.col("event_type").alias("type_a"),
        F.col("cents").alias("cents_a"),
        F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("off"),
    ).withColumn("bucket", F.col("cents_a") + F.col("off"))
    build = ev.select(
        F.col("event_id").alias("id_b"),
        F.col("event_type").alias("type_b"),
        F.col("cents").alias("bucket"),
    )
    pairs = probe.join(build, "bucket").filter(F.col("id_a") < F.col("id_b"))
    return pairs.groupBy("type_a", "type_b").agg(
        F.count("*").alias("n_pairs"),
        F.min("id_a").alias("min_event_a"),
    )


# --- returns root-cause banding ----------------------------------------------

RETURNS_RCA_ORACLE = """
WITH li AS (
    SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS disc_pt,
           CAST(FLOOR(CAST(l_quantity AS DOUBLE) / 10.0) AS BIGINT)
               AS qty_band,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret
    FROM lineitem
),
cells AS (
    SELECT disc_pt, qty_band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(ret) AS BIGINT) AS n_returned
    FROM li GROUP BY disc_pt, qty_band
),
tot AS (
    SELECT CAST(SUM(n_lines) AS BIGINT) AS n,
           CAST(SUM(n_returned) AS BIGINT) AS r
    FROM cells
)
SELECT c.disc_pt, c.qty_band, c.n_lines, c.n_returned,
       CAST(c.n_returned AS DOUBLE) / CAST(c.n_lines AS DOUBLE) AS return_rate,
       CAST(t.r AS DOUBLE) / CAST(t.n AS DOUBLE) AS base_rate,
       (c.n_returned * t.n * 10 > c.n_lines * t.r * 12) AS elevated
FROM cells c CROSS JOIN tot t
"""


@register("returns_root_cause", RETURNS_RCA_ORACLE)
def q_returns_root_cause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-rate root-cause grid: return incidence per (discount
    point x quantity band) cell against the corpus base rate, with an
    'elevated' flag at 1.2x base decided by cross-multiplied integers
    (cell_r·N·10 > cell_n·R·12) — the 2-D slice a quality analyst scans
    to localize which pricing/volume segment drives returns.

    Scale: one scan, one bounded-cardinality cell aggregate (11
    discount points x ~5 quantity bands), the corpus total a 1-row
    scalar crossed back."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_discount").cast("decimal(12,2)") * 100)
        .cast("long")
        .alias("disc_pt"),
        F.floor(F.col("l_quantity").cast("double") / 10.0)
        .cast("long")
        .alias("qty_band"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("ret"),
    )
    cells = li.groupBy("disc_pt", "qty_band").agg(
        F.count("*").alias("n_lines"),
        F.sum("ret").cast("long").alias("n_returned"),
    )
    tot = cells.agg(
        F.sum("n_lines").alias("n"), F.sum("n_returned").alias("r")
    )
    return cells.crossJoin(F.broadcast(tot)).select(
        "disc_pt",
        "qty_band",
        "n_lines",
        "n_returned",
        (
            F.col("n_returned").cast("double") / F.col("n_lines").cast("double")
        ).alias("return_rate"),
        (F.col("r").cast("double") / F.col("n").cast("double")).alias(
            "base_rate"
        ),
        (
            F.col("n_returned") * F.col("n") * 10
            > F.col("n_lines") * F.col("r") * 12
        ).alias("elevated"),
    )


# --- cents last-digit uniformity (fraud forensics) ---------------------------

DIGIT_ORACLE = """
WITH digits AS (
    SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) % 10
               AS digit
    FROM orders
),
counts AS (
    SELECT digit, CAST(COUNT(*) AS BIGINT) AS o FROM digits GROUP BY digit
),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM counts)
SELECT digit, o AS observed,
       CAST(10 * o - n AS BIGINT) AS dev_cross,
       CAST(FLOOR((CAST(10 * o - n AS DOUBLE)
                   * CAST(10 * o - n AS DOUBLE))
                  / (10.0 * CAST(n AS DOUBLE)) * 1048576) AS BIGINT)
           AS chi2_term_scaled
FROM counts CROSS JOIN tot
"""


@register("cents_digit_uniformity", DIGIT_ORACLE)
def q_cents_digit_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-digit uniformity audit of order amounts (in cents): genuine
    transactional amounts have uniform last digits; invented numbers
    don't — the forensic complement of benford_audit (first-digit law
    vs last-digit uniformity). Deviations are cross-multiplied
    integers (10*observed - n); per-digit chi-square terms
    floor-quantize to 2^-20 (the order-free summation discipline).

    Scale: one hash aggregate on the 10-value digit key; the 1-row
    total crosses back."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.pmod(
            (F.col("o_totalprice").cast("decimal(12,2)") * 100).cast("long"),
            F.lit(10),
        ).alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count("*").alias("o"))
    tot = counts.agg(F.sum("o").alias("n"))
    dev = 10 * F.col("o") - F.col("n")
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("o").alias("observed"),
        dev.alias("dev_cross"),
        F.floor(
            dev.cast("double")
            * dev.cast("double")
            / (F.lit(10.0) * F.col("n").cast("double"))
            * F.lit(1048576)
        )
        .cast("long")
        .alias("chi2_term_scaled"),
    )
