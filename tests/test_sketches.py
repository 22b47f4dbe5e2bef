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
