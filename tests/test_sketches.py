"""Tests for sketch operators (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import Row

from amorphous_mapreduce_spark.operators.sketches import cms_cells, cms_heavy_hitters


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_cms_estimate_bounds_and_ranking(spark):
    docs = _docs(
        spark,
        ["apple apple apple banana", "apple banana cherry", "cherry date"],
    )
    rows = cms_heavy_hitters(docs, k=10).collect()
    exact = {"apple": 4, "banana": 2, "cherry": 2, "date": 1}
    got = {r.word: (r.exact_count, r.cms_est) for r in rows}
    assert {w: e for w, (e, _) in got.items()} == exact
    # CMS never underestimates
    for w, (e, est) in got.items():
        assert est >= e
    # top-k ordering: exact desc, word asc tie-break
    assert [r.word for r in rows] == ["apple", "banana", "cherry", "date"]


def test_cms_cells_are_mergeable(spark):
    # grid(shard A) + grid(shard B) == grid(A union B), elementwise
    a = _docs(spark, ["x y z x", "y y"])
    b = spark.createDataFrame(
        [Row(doc_id=10, text="x q q"), Row(doc_id=11, text="z")]
    )
    both = a.unionByName(b)
    grid = lambda df: {
        (r.depth, r.bucket): r.cell for r in cms_cells(df, width=16).collect()
    }
    ga, gb, gu = grid(a), grid(b), grid(both)
    merged = dict(ga)
    for k, v in gb.items():
        merged[k] = merged.get(k, 0) + v
    assert merged == gu
    # total mass per depth == token count
    n_tokens = 6 + 4
    for d in range(4):
        assert sum(v for (dd, _), v in gu.items() if dd == d) == n_tokens


def test_fm_state_tracks_distinct_words(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c d e", lang="en"),
            Row(doc_id=1, text="a b f", lang="en"),
            Row(doc_id=2, text="x y", lang="fr"),
        ]
    )
    from amorphous_mapreduce_spark.operators.sketches import fm_cardinality

    out = {r.lang: r for r in fm_cardinality(docs).collect()}
    assert out["en"].n_distinct_exact == 6
    assert out["fr"].n_distinct_exact == 2
    for r in out.values():
        # sketch invariants: each used bucket contributes 2^max_rho >= 2
        assert r.buckets_used <= min(32, r.n_distinct_exact)
        assert r.fm_sum_pow2 >= 2 * r.buckets_used
        assert r.max_rho >= 1


def test_bloom_semi_join_no_false_negatives(spark):
    from pyspark.sql import functions as F
    from amorphous_mapreduce_spark.operators.sketches import bloom_semi_join

    fact = spark.createDataFrame(
        [Row(k=i, g="even" if i % 2 == 0 else "odd") for i in range(200)]
    )
    dim = spark.createDataFrame([Row(k=i) for i in range(0, 200, 10)])
    out = {r.g: r for r in bloom_semi_join(fact, dim, "k", "g").collect()}
    # every true member passes the filter (no false negatives); the
    # filter never passes more than everything
    for g in ("even", "odd"):
        assert out[g].n_bloom_pass >= out[g].n_exact
        assert out[g].n_probe == 100
    assert out["even"].n_exact == 20 and out["odd"].n_exact == 0
    # with 4096 bits and 20 keys, false positives should be rare
    assert out["odd"].n_bloom_pass <= 5


def test_new_operators_handle_empty_inputs(spark):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from amorphous_mapreduce_spark.operators.fuzzy import fuzzy_pairs
    from amorphous_mapreduce_spark.operators.graph import pagerank
    from amorphous_mapreduce_spark.operators.pipeline import (
        importance_sample,
        quality_rules,
    )
    from amorphous_mapreduce_spark.operators.sketches import (
        bloom_semi_join,
        cms_heavy_hitters,
        fm_cardinality,
    )
    from amorphous_mapreduce_spark.operators.temporal import gap_fill_daily

    docs = spark.createDataFrame(
        [],
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
                StructField("lang", StringType()),
            ]
        ),
    )
    assert cms_heavy_hitters(docs).count() == 0
    assert fm_cardinality(docs).count() == 0
    assert quality_rules(docs).count() == 0
    assert importance_sample(docs).count() == 0
    assert fuzzy_pairs(docs, "text").count() == 0

    edges = spark.createDataFrame(
        [], StructType([StructField("qid", LongType()), StructField("nid", LongType())])
    )
    assert pagerank(edges).count() == 0

    ev = spark.createDataFrame(
        [], "event_type string, ts timestamp, value double"
    )
    assert gap_fill_daily(ev).count() == 0

    fact = spark.createDataFrame([(1, "g")], ["k", "g"])
    empty_dim = spark.createDataFrame([], StructType([StructField("k", LongType())]))
    out = bloom_semi_join(fact, empty_dim, "k", "g").collect()
    assert len(out) == 1 and out[0].n_bloom_pass == 0 and out[0].n_exact == 0


def test_ams_f2_counters_unbiased_shape(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    r = QUERIES["ams_f2_estimate"](spark, sf_dir).collect()[0]
    assert r.n_counters == 16
    assert r.ams_sq_sum > 0 and r.f2_exact > 0
    assert r.bias_scaled == r.ams_sq_sum - 16 * r.f2_exact
    # the mean estimator should land within ~3/sqrt(8) of F2
    est = r.ams_sq_sum / 16
    assert abs(est - r.f2_exact) < 1.5 * r.f2_exact


def test_hll_state_and_estimate(spark):
    from amorphous_mapreduce_spark.operators.sketches import hll_cardinality

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b c d e f g h i j", lang="en"),
            Row(doc_id=1, text="a b k l m n o p q r", lang="en"),
            Row(doc_id=2, text="x y z", lang="fr"),
        ]
    )
    out = {r.lang: r for r in hll_cardinality(docs).collect()}
    assert out["en"].n_distinct_exact == 18
    assert out["fr"].n_distinct_exact == 3
    for r in out.values():
        assert r.registers_used <= min(64, r.n_distinct_exact)
        assert r.zero_registers == 64 - r.registers_used
        # each register holds rho >= 1, so every present bucket
        # contributes <= 2^54; absent buckets contribute exactly 2^55
        upper = r.registers_used * (1 << 54) + r.zero_registers * (1 << 55)
        assert 0 < r.hll_sum_scaled <= upper
        assert r.hll_raw_est > 0


def test_hll_registers_merge_as_max(spark):
    # HLL registers from shard A+B == elementwise max of shard registers,
    # demonstrated through the scaled harmonic sum being recomputable
    from amorphous_mapreduce_spark.operators.sketches import hll_cardinality

    a = spark.createDataFrame(
        [Row(doc_id=0, text="alpha beta gamma delta", lang="en")]
    )
    b = spark.createDataFrame(
        [Row(doc_id=1, text="gamma delta epsilon zeta", lang="en")]
    )
    both = a.unionByName(b)
    ra = hll_cardinality(a).collect()[0]
    rb = hll_cardinality(b).collect()[0]
    ru = hll_cardinality(both).collect()[0]
    # union never has MORE zero registers than either shard
    assert ru.zero_registers <= min(ra.zero_registers, rb.zero_registers)
    # harmonic sum shrinks (or holds) under union: registers only grow
    assert ru.hll_sum_scaled <= min(ra.hll_sum_scaled, rb.hll_sum_scaled)
    assert ru.n_distinct_exact == 6


def test_hll_merge_rollup_proof_holds(spark):
    from amorphous_mapreduce_spark.queries.sketch_queries import (
        q_hll_merge_rollup,
    )

    rows = q_hll_merge_rollup(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.merge_exact == 1
        assert r.merged_sum_scaled == r.direct_sum_scaled


def test_bloom_fpr_sweep_monotone(spark):
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    rows = sorted(
        QUERIES["bloom_fpr_sweep"](spark, "/root/testdata/sf0.001").collect(),
        key=lambda r: r.n_bits,
    )
    assert [r.n_bits for r in rows] == [1024, 4096, 16384]
    for r in rows:
        assert r.n_pass >= r.n_exact  # no false negatives
        assert 0 < r.fill <= 1.0
        if r.measured_fpr is not None:
            assert 0.0 <= r.measured_fpr <= 1.0
    # bigger filters fill less and pass fewer false positives
    fills = [r.fill for r in rows]
    assert fills == sorted(fills, reverse=True)
    passes = [r.n_pass for r in rows]
    assert passes == sorted(passes, reverse=True)


def test_approx_quantile_audit_bound_and_exact_median(spark):
    # import via the registry (circular-import convention)
    from amorphous_mapreduce_spark.queries_registry import QUERIES

    out = QUERIES["approx_quantile_audit"](
        spark, "/root/testdata/sf0.001"
    ).toPandas()
    assert (out["approx_within_bound"]).all()
    # exact median parity with a pandas replay
    import pandas as pd

    from amorphous_mapreduce_spark.sources import load_table

    part = load_table(spark, "/root/testdata/sf0.001", "part").toPandas()
    cents = (
        (part["p_retailprice"].astype("float64") * 100).round().astype("int64")
    )
    expect = (
        pd.DataFrame({"brand": part["p_brand"], "cents": cents})
        .groupby("brand")["cents"]
        .median()
    )
    got = dict(zip(out["brand"], out["median_cents"]))
    assert got == expect.to_dict()
