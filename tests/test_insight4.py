"""Batch-4 invariants: Wasserstein-1, rolling HLL actives,
Hodges-Lehmann — plus regression tests for the distributed_prefix_sum
bugs they exposed (signed values, dense large inputs)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

# Registry first (circular-import gotcha).
from amorphous_mapreduce_spark.queries_registry import QUERIES  # isort: skip
from amorphous_mapreduce_spark.operators.corpus_stats import (
    distributed_prefix_sum,
)
from amorphous_mapreduce_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_prefix_sum_signed_values(spark):
    # Regression: partition totals were max(local cum), which is wrong
    # the moment values go negative.
    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"),
        (F.when(F.col("id") % 2 == 0, 1).otherwise(-1) * (F.col("id") % 97)).alias(
            "v"
        ),
    ).repartition(16)
    out = distributed_prefix_sum(df, "v", ["k"]).orderBy("k").toPandas()
    expect = out.v.cumsum()
    assert (out.cum == expect).all()
    assert (out["rank"] == range(1, len(out) + 1)).all()


def test_prefix_sum_dense_grid_rank_alignment(spark):
    # Regression: the part frame was evaluated twice (offsets + probe),
    # and the two range partitionings could disagree on large inputs.
    df = spark.range(0, 400_000).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    ).repartition(32)
    out = distributed_prefix_sum(df, "v", ["k"])
    last = out.orderBy(F.desc("k")).limit(1).collect()[0]
    assert last["rank"] == 400_000
    assert last["cum"] == 400_000


def test_wasserstein_bruteforce(spark):
    out = QUERIES["wasserstein_price_segments"](spark, SF).toPandas().iloc[0]
    orders = load_table(spark, SF, "orders").toPandas()
    cust = load_table(spark, SF, "customer").toPandas()
    seg = dict(zip(cust.c_custkey, cust.c_mktsegment))
    a: Counter = Counter()
    b: Counter = Counter()
    import math

    for r in orders.itertuples():
        s = seg[r.o_custkey]
        d = math.floor(round(r.o_totalprice, 2))
        if s == "BUILDING":
            a[d] += 1
        elif s == "MACHINERY":
            b[d] += 1
    na, nb = sum(a.values()), sum(b.values())
    lo = min(min(a), min(b))
    hi = max(max(a), max(b))
    cum = w1 = ks = 0
    for d in range(lo, hi + 1):
        cum += a.get(d, 0) * nb - b.get(d, 0) * na
        w1 += abs(cum)
        ks = max(ks, abs(cum))
    assert (out.n_a, out.n_b) == (na, nb)
    assert out.w1_num == w1 and out.ks_num == ks
    assert out.w1_dollars == w1 / (na * nb)
    assert out.ks_stat == ks / (na * nb)


def test_hll_rolling_matches_exact_window(spark):
    out = QUERIES["hll_rolling_actives"](spark, SF).toPandas()
    exact = QUERIES["rolling_wau_7d"](spark, SF).toPandas()
    m = out.merge(exact, on="day_idx")
    assert len(m) == len(out) == len(exact)
    # the query's in-plan exact count equals the standalone exact query
    assert (m.wau7_exact == m.wau7).all()
    # m=64 HLL: generous 3-sigma-ish band (sigma ~ 1.04/sqrt(64) ~ 13%)
    assert ((m.wau7_est / m.wau7_exact - 1).abs() < 0.45).all()


def test_hodges_lehmann_bruteforce(spark):
    import duckdb

    out = QUERIES["hodges_lehmann_value"](spark, SF).toPandas()
    # daily integer cents from the oracle's own arithmetic (the cents
    # cast is already cross-engine-proven by the oracle gate; this test
    # verifies the Walsh-median logic)
    daily_df = duckdb.connect().execute(
        f"""SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                   CAST(SUM(CAST(CAST(value AS DECIMAL(18,6)) * 100
                            AS BIGINT)) AS BIGINT) AS cents
            FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchdf()
    for et, grp in daily_df.groupby("event_type"):
        daily = grp.set_index("day").cents.sort_index()
        vals = list(daily.values)
        days = list(daily.index)
        walsh = sorted(
            (vals[i] + vals[j], days[i], days[j])
            for i in range(len(vals))
            for j in range(i, len(vals))
        )
        n = len(walsh)
        med = walsh[(n + 1) // 2 - 1][0]
        r = out[out.event_type == et].iloc[0]
        assert r.n_pairs == n
        assert r.hl_2x_cents == med
        assert r.hl_cents == med / 2.0
