from __future__ import annotations

import numpy as np
import pytest

from amorphous_mapreduce_spark.operators.kmeans import cluster_sizes, kmeans_assign
from tests.test_similarity import SCHEMA, _emb_df


def test_kmeans_separates_planted_clusters(spark):
    rng = np.random.default_rng(21)
    centers = np.array([[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4])
    vecs = np.vstack(
        [c + rng.normal(scale=0.1, size=(10, 8)) for c in centers]
    ).astype(np.float32)
    df = _emb_df(spark, vecs)
    got = {r["id"]: r["cell"] for r in kmeans_assign(df, k=3, iters=3).collect()}
    # every planted group lands in one cell, groups in different cells
    groups = [set(got[i] for i in range(g * 10, g * 10 + 10)) for g in range(3)]
    assert all(len(g) == 1 for g in groups)
    assert len(set().union(*groups)) == 3


def test_kmeans_deterministic(spark):
    rng = np.random.default_rng(22)
    df = _emb_df(spark, rng.normal(size=(30, 8)).astype(np.float32))
    a = sorted(map(tuple, kmeans_assign(df, k=4, iters=2).collect()))
    b = sorted(map(tuple, kmeans_assign(df, k=4, iters=2).collect()))
    assert a == b


def test_cluster_sizes_sum(spark):
    rng = np.random.default_rng(23)
    df = _emb_df(spark, rng.normal(size=(40, 8)).astype(np.float32))
    sizes = cluster_sizes(kmeans_assign(df, k=4, iters=2))
    assert sum(r["n_members"] for r in sizes.collect()) == 40
