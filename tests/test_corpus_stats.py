"""Closed-form property tests for operators.corpus_stats."""

from __future__ import annotations

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.corpus_stats import (
    doc_rarity,
    epoch_shards,
    incremental_exact_dedup,
    vocab_growth,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_epoch_shards_partition_and_order(spark):
    docs = _docs(spark, [(i, f"doc {i}") for i in range(100)])
    m = epoch_shards(docs, n_shards=4, epoch=0).toPandas()
    # every doc exactly once, shards within range
    assert sorted(m["id"]) == list(range(100))
    assert set(m["shard_id"]).issubset(set(range(4)))
    # positions are contiguous 1..n within each shard
    for sid, grp in m.groupby("shard_id"):
        assert sorted(grp["pos"]) == list(range(1, len(grp) + 1))
    # epoch changes the layout, same epoch reproduces it
    m0 = epoch_shards(docs, n_shards=4, epoch=0).toPandas()
    m1 = epoch_shards(docs, n_shards=4, epoch=1).toPandas()
    key = lambda d: sorted(map(tuple, d[["id", "shard_id", "pos"]].values))
    assert key(m0) == key(m)
    assert key(m1) != key(m)


def test_vocab_growth_monotone_and_totals(spark):
    docs = _docs(
        spark,
        [(0, "a b c"), (1, "a b"), (2, "c d"), (3, "d e f"), (4, "a f")],
    )
    g = vocab_growth(docs, n_buckets=5).toPandas().sort_values("bucket")
    # each doc_id lands in its own bucket (n = 5, width 1)
    assert list(g["bucket"]) == [0, 1, 2, 3, 4]
    assert list(g["new_words"]) == [3, 0, 1, 2, 0]
    # cumulative curve is the running sum of new words and ends at |vocab|
    assert list(g["vocab_size"]) == [3, 3, 4, 6, 6]


def test_doc_rarity_bounds(spark):
    docs = _docs(spark, [(0, "x x y"), (1, "y z"), (2, "z z z")])
    r = {row["id"]: row for row in doc_rarity(docs).collect()}
    # doc 0: tokens x,x,y -> df(x)=1, df(y)=2 -> sum 1+1+2=4, n=3
    assert r[0]["sum_df"] == 4 and r[0]["n_tokens"] == 3
    assert abs(r[0]["rarity"] - 4 / 3) < 1e-15
    # all-unique-token doc has rarity exactly df of its words
    assert r[2]["sum_df"] == 3 * 2  # z appears in docs 1 and 2 -> df 2
    for row in r.values():
        assert 1.0 <= row["rarity"] <= 3.0


def test_incremental_dedup_flags_planted_duplicate(spark):
    old = _docs(spark, [(0, "the same text"), (2, "unique old")])
    new = _docs(spark, [(1, "The  same TEXT "), (3, "brand new")])
    out = {r["id"]: r for r in incremental_exact_dedup(new, old).collect()}
    # normalisation (case/whitespace) makes doc 1 an exact dup of doc 0
    assert out[1]["is_dup"] == 1 and out[1]["dup_of"] == 0
    assert out[3]["is_dup"] == 0 and out[3]["dup_of"] is None


def test_epoch_shards_plan_has_no_global_sort(spark):
    docs = _docs(spark, [(i, "t") for i in range(10)])
    plan = (
        epoch_shards(docs, n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_stats_queries_properties(spark):
    """Bootstrap CI brackets the point estimate; leak share is a valid
    fraction bounded by the pair count."""
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    ci = QUERIES["bootstrap_revenue_ci"](spark, "/root/testdata/sf0.001").collect()[0]
    assert ci["ci_lo"] <= ci["mean_price"] <= ci["ci_hi"]
    assert ci["n_resamples"] == 100
    leak = QUERIES["split_leakage_audit"](spark, "/root/testdata/sf0.001").collect()[0]
    assert 0 <= leak["n_cross_split"] <= leak["n_pairs"]
    assert 0.0 <= leak["leak_share"] <= 1.0


def test_vocab_coverage_matches_bruteforce(spark):
    from collections import Counter

    from amorphous_mapreduce_spark.operators.corpus_stats import vocab_coverage
    from amorphous_mapreduce_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    out = {
        r.threshold_pct: (r.vocab_k, r.tokens_covered)
        for r in vocab_coverage(docs).collect()
    }
    pdf = docs.toPandas()
    cnt = Counter()
    for t in pdf.text:
        cnt.update(w for w in " ".join(t.lower().split()).split(" ") if w)
    n = sum(cnt.values())
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    for t in (50, 90, 99):
        cum = 0
        for k, (_, c) in enumerate(ordered, start=1):
            cum += c
            if cum * 100 >= t * n:
                assert out[t] == (k, cum)
                break


def test_prefix_sum_partition_invariant(spark):
    from amorphous_mapreduce_spark.operators.corpus_stats import (
        distributed_prefix_sum,
    )
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("v")
    )
    expect = None
    for nparts in (1, 3, 32):
        got = (
            distributed_prefix_sum(df.repartition(nparts), "v", [F.asc("id")])
            .orderBy("id")
            .collect()
        )
        rows = [(r.id, r.rank, r.cum) for r in got]
        if expect is None:
            expect = rows
            # closed form: cum at id i = sum_{j<=i} (j%7+1)
            run = 0
            for i, (rid, rank, cum) in enumerate(rows):
                run += i % 7 + 1
                assert (rid, rank, cum) == (i, i + 1, run)
        else:
            assert rows == expect


def test_rendezvous_moves_fraction_of_keys(spark):
    from amorphous_mapreduce_spark.queries.corpus_queries import (
        q_rendezvous_sharding_audit,
    )

    r = q_rendezvous_sharding_audit(spark, "/root/testdata/sf0.001").collect()[0]
    # HRW moves only keys whose new node wins: ~1/9 in expectation;
    # hash-mod reshuffles almost everything: ~8/9
    assert r.moved_rendezvous < r.moved_modulo
    assert r.rendezvous_moved_share < 0.3
    assert r.modulo_moved_share > 0.6
    assert 0 <= r.moved_rendezvous <= r.n_keys
