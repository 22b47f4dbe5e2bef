from __future__ import annotations

from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.curation import curate_corpus

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs to the "
    "old barn where a cat sleeps near the door of the house"
)


def test_curation_stages(spark):
    docs = spark.createDataFrame(
        [
            (1, BASE, "en", "s"),  # keeper
            (2, BASE, "en", "s"),  # exact dup of 1 -> dropped
            (3, BASE + " tonight", "en", "s"),  # near-dup of 1 -> clustered out
            (4, "too short", "en", "s"),  # quality 0 -> dropped
            (5, "a completely different long document about spark engines "
                "and the many ways to shuffle data across a cluster of "
                "machines with the hope of finding the truth", "en", "s"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    out = curate_corpus(docs, min_quality=0.1)
    survivors = {r["doc_id"] for r in out.collect()}
    assert survivors == {1, 5}
    # output carries metadata + the quality score
    assert set(out.columns) == {"doc_id", "lang", "quality"}


def test_curation_idempotent_on_clean_corpus(spark):
    # fully distinct token streams: no shared shingles between docs
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"tok{i}w{j}" for j in range(12)), "en", "s")
            for i in range(8)
        ],
        ["doc_id", "text", "lang", "source"],
    )
    out = curate_corpus(docs, min_quality=0.0)
    assert out.count() == 8  # nothing to remove


def test_approx_sketches_accuracy(spark, sf_dir):
    # HLL distinct-count sketch: bounded relative error vs exact
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_partkey").alias("d")).first()["d"]
    approx = li.select(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("d")
    ).first()["d"]
    assert abs(approx - exact) / exact < 0.1
    # approximate quantile within tolerance of the exact percentile
    exact_med = li.select(F.percentile("l_extendedprice", 0.5).alias("m")).first()["m"]
    approx_med = li.approxQuantile("l_extendedprice", [0.5], 0.01)[0]
    assert abs(approx_med - exact_med) / exact_med < 0.05
