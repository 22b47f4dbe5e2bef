"""Invariants for the forecast-backtest, KMV set-sketch and hybrid-RRF
retrieval queries (timeseries/sketch/text query batteries)."""

from __future__ import annotations

import collections
import hashlib

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.queries_registry import QUERIES
from amorphous_mapreduce_spark.sources import load_table

q_backtest = QUERIES["seasonal_naive_backtest"]
q_kmv = QUERIES["kmv_set_similarity"]
q_rrf = QUERIES["hybrid_rrf_retrieval"]


def test_seasonal_naive_backtest_matches_python_reference(spark, sf_dir):
    rows = q_backtest(spark, sf_dir).collect()
    assert rows, "backtest produced no months"
    # python reference: daily cents -> lag-7 pairing -> monthly WAPE
    raw = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.date_trunc("day", "o_orderdate").alias("day"),
            (F.col("o_totalprice").cast("decimal(12,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .collect()
    )
    daily = collections.Counter()
    for r in raw:
        daily[r.day] += r.cents
    import datetime

    months = collections.defaultdict(lambda: [0, 0, 0, 0])  # n, act, fc, abs
    for day, cents in daily.items():
        prev = day - datetime.timedelta(days=7)
        if prev in daily:
            m = day.replace(day=1)
            agg = months[m]
            agg[0] += 1
            agg[1] += cents
            agg[2] += daily[prev]
            agg[3] += abs(cents - daily[prev])
    got = {r.month.date().replace(day=1): r for r in rows}
    assert set(got) == {m.date() for m in months}
    for m, (n, act, fc, ab) in months.items():
        r = got[m.date()]
        assert (r.n_days, r.actual_cents, r.forecast_cents, r.abs_err_cents) == (
            n,
            act,
            fc,
            ab,
        )
        assert r.wape == ab / act
    # WAPE is nonnegative and zero only with a perfect forecast
    for r in rows:
        assert r.wape >= 0.0


def test_kmv_estimates_bounded_and_consistent(spark, sf_dir):
    rows = q_kmv(spark, sf_dir).collect()
    assert rows, "no source pairs"
    for r in rows:
        # exact set algebra invariants
        assert r.exact_inter <= min(r.n_a, r.n_b)
        assert r.exact_union >= max(r.n_a, r.n_b)
        assert r.exact_union == r.n_a + r.n_b - r.exact_inter
        # sketch invariants
        assert 0 <= r.n_both <= 64
        assert 0.0 <= r.est_jaccard <= 1.0
        if r.kth_h is not None:
            assert r.est_union > 0
            # KMV with k=64 has ~12.5% stddev; 60% is a generous CI that
            # a correct estimator essentially never breaches
            assert abs(r.est_union - r.exact_union) <= 0.6 * r.exact_union
            assert r.est_inter <= r.est_union + 1e-9


def test_kmv_pairs_cover_all_source_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_src = docs.select("source").distinct().count()
    rows = q_kmv(spark, sf_dir).collect()
    assert len(rows) == n_src * (n_src - 1) // 2
    assert len({(r.sa, r.sb) for r in rows}) == len(rows)


def test_hybrid_rrf_fusion_formula_and_ranks(spark, sf_dir):
    rows = q_rrf(spark, sf_dir).collect()
    assert 20 <= len(rows) <= 40
    for r in rows:
        assert r.r_bm25 is not None or r.r_cos is not None
        expect = 0
        if r.r_bm25 is not None:
            assert 1 <= r.r_bm25 <= 20
            expect += 1000000 // (60 + r.r_bm25)
        if r.r_cos is not None:
            assert 1 <= r.r_cos <= 20
            expect += 1000000 // (60 + r.r_cos)
        assert r.rrf_score == expect
    # each rank list is a permutation of 1..k without duplicates
    for col in ("r_bm25", "r_cos"):
        ranks = sorted(getattr(r, col) for r in rows if getattr(r, col) is not None)
        assert ranks == list(range(1, len(ranks) + 1))


def test_hybrid_rrf_query_vector_is_hash_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id").collect()
    qid = min(
        (int(hashlib.md5(f"rrfq_{r.vec_id}".encode()).hexdigest()[:15], 16), r.vec_id)
        for r in emb
    )[1]
    rows = q_rrf(spark, sf_dir).collect()
    # the query doc is excluded from the dense gallery, so if it appears
    # it must come from the lexical branch only
    for r in rows:
        if r.id == qid:
            assert r.r_cos is None


def test_minhash_recall_bands(spark, sf_dir):
    rows = QUERIES["minhash_recall_vs_jaccard"](spark, sf_dir).collect()
    assert rows, "no truth pairs at this SF"
    for r in rows:
        assert 0 <= r.jband <= 4
        assert 0 <= r.n_hits <= r.n_truth
        assert r.recall == r.n_hits / r.n_truth
    by_band = {r.jband: r for r in rows}
    # strong near-dups (J >= 0.8) must be fully recalled by 16/4 banding
    if 4 in by_band:
        assert by_band[4].recall == 1.0


def test_kmv_sketch_is_mergeable_across_shards(spark, sf_dir):
    """Bottom-k of the union of per-shard bottom-k sketches == global
    bottom-k — the property that lets KMV sketches merge across
    epochs/shards without revisiting data."""
    from pyspark.sql import Window

    from amorphous_mapreduce_spark.functions.hashing import hex_hash64
    from amorphous_mapreduce_spark.operators.dedup import tokenized

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select(F.col("doc_id").alias("id"), "source")
    sw = (
        tokenized(docs)
        .select("id", "word")
        .join(src, "id")
        .select("source", hex_hash64("word").alias("h"), F.col("id") % 3)
        .withColumnRenamed("(id % 3)", "shard")
    )
    k = 64
    w = Window.partitionBy("source").orderBy("h")
    global_sk = (
        sw.select("source", "h")
        .distinct()
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("source", "h")
    )
    ws = Window.partitionBy("source", "shard").orderBy("h")
    shard_sk = (
        sw.select("source", "shard", "h")
        .distinct()
        .withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= k)
        .select("source", "h")
    )
    merged = (
        shard_sk.distinct()
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select("source", "h")
    )
    a = {(r.source, r.h) for r in global_sk.collect()}
    b = {(r.source, r.h) for r in merged.collect()}
    assert a == b


def test_rolling_origin_three_folds(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = sorted(
        QUERIES["rolling_origin_backtest"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.fold,
    )
    # a fold can be empty at tiny SF if its week lacks lag-7 partners
    assert rows and set(r.fold for r in rows) <= {1, 2, 3}
    for r in rows:
        assert 1 <= r.n_days <= 7
        assert r.wape >= 0
        assert abs(
            r.wape - r.sum_abs_err_cents / r.sum_actual_cents
        ) < 1e-12
