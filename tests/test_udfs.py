from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.udfs import geometric_mean, sentence_splitter


def test_geometric_mean_grouped_agg(spark):
    gm = geometric_mean()
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("b", 3.0), ("b", 0.0), ("b", 27.0)],
        ["k", "v"],
    )
    got = {
        r["k"]: r["gm"]
        for r in df.groupBy("k").agg(gm("v").alias("gm")).collect()
    }
    assert got["a"] == pytest.approx(4.0)  # sqrt(2*8)
    assert got["b"] == pytest.approx(9.0)  # zeros excluded: sqrt(3*27)


def test_geometric_mean_global_agg(spark, sf_dir):
    gm = geometric_mean()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(gm("l_quantity").alias("gm")).first()
    assert 1.0 < row["gm"] < 50.0  # quantity range per FIXTURES.md


def test_sentence_splitter_udtf(spark):
    spark.udtf.register("split_sentences", sentence_splitter())
    rows = spark.sql(
        "SELECT * FROM split_sentences('Hello world. How are you? Fine!')"
    ).collect()
    got = [(r["sent_idx"], r["sentence"], r["n_words"]) for r in rows]
    assert got == [
        (0, "Hello world", 2),
        (1, "How are you", 3),
        (2, "Fine", 1),
    ]


def test_sentence_splitter_lateral_join(spark):
    spark.udtf.register("split_sentences", sentence_splitter())
    docs = spark.createDataFrame(
        [(1, "One. Two."), (2, "Only one sentence")], ["doc_id", "text"]
    )
    docs.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, sentence FROM udtf_docs, LATERAL split_sentences(text)"
    ).collect()
    assert {(r["doc_id"], r["sentence"]) for r in rows} == {
        (1, "One"),
        (1, "Two"),
        (2, "Only one sentence"),
    }
