from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.spans import (
    duplicate_passages,
    positioned_shingles,
)

PASSAGE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens


def words(n, prefix):
    return " ".join(f"{prefix}{i}" for i in range(n))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # Shared 10-token passage at offset 3 in doc 1, offset 5 in doc 2.
        (1, words(3, "x") + " " + PASSAGE + " " + words(4, "y")),
        (2, words(5, "p") + " " + PASSAGE + " " + words(2, "q")),
        # Doc 3 contains the passage with one word changed in the middle:
        # splits into two sub-runs, both below min_tokens=8 -> no span.
        (3, "alpha beta gamma delta CHANGED zeta eta theta iota kappa"),
        (4, words(12, "z")),  # unrelated
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_positioned_shingles_positions(spark):
    one = spark.createDataFrame([(7, "a b c d e")], ["doc_id", "text"])
    got = positioned_shingles(one, shingle_size=3).orderBy("pos").collect()
    assert [r["pos"] for r in got] == [0, 1, 2]  # 5 tokens -> 3 trigrams


def test_exact_span_extent(docs):
    spans = duplicate_passages(docs, shingle_size=4, min_tokens=8).collect()
    hits = {(r["id1"], r["id2"]): r for r in spans}
    assert (1, 2) in hits
    r = hits[(1, 2)]
    assert r["span_tokens"] == 10
    assert r["start1"] == 3 and r["start2"] == 5
    # The mid-passage edit in doc 3 breaks the run below threshold.
    assert not any(3 in k for k in hits)


def test_gap_splits_spans(spark):
    # Two disjoint shared passages -> two rows for the same pair.
    p2 = "one two three four five six seven eight"
    d1 = PASSAGE + " " + words(5, "a") + " " + p2
    d2 = PASSAGE + " " + words(9, "b") + " " + p2
    df = spark.createDataFrame([(1, d1), (2, d2)], ["doc_id", "text"])
    spans = duplicate_passages(df, shingle_size=4, min_tokens=8).collect()
    assert len(spans) == 2
    assert sorted(r["span_tokens"] for r in spans) == [8, 10]


def test_hot_shingle_cap(spark):
    # The same passage in many docs exceeds max_df -> excluded entirely,
    # and candidate fanout stays bounded.
    rows = [(i, words(2, f"u{i}_") + " " + PASSAGE) for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = duplicate_passages(df, shingle_size=4, min_tokens=8, max_df=5)
    assert capped.count() == 0
    uncapped = duplicate_passages(df, shingle_size=4, min_tokens=8, max_df=64)
    assert uncapped.count() == 45  # all C(10,2) pairs report the span


def test_no_self_pairs(docs):
    spans = duplicate_passages(docs, shingle_size=4, min_tokens=8)
    assert spans.filter(F.col("id1") >= F.col("id2")).count() == 0
