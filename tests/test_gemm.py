from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.operators.gemm import gemm_block, gemm_coordinate


def _coord_df(spark, mat: np.ndarray, rname: str, cname: str, vname: str):
    rows = [
        (int(r), int(c), float(mat[r, c]))
        for r in range(mat.shape[0])
        for c in range(mat.shape[1])
    ]
    return spark.createDataFrame(rows, [rname, cname, vname])


def _to_dense(rows, m, n) -> np.ndarray:
    out = np.zeros((m, n))
    for r in rows:
        out[r["i"], r["j"]] = r["val"]
    return out


@pytest.mark.parametrize("op", [gemm_coordinate, gemm_block])
def test_gemm_ones_closed_form(spark, op):
    # ones(m,k)·ones(k,n) = k everywhere (FIXTURES.md closed form).
    m, k, n = 8, 16, 8
    A = _coord_df(spark, np.ones((m, k)), "i", "k", "a")
    B = _coord_df(spark, np.ones((k, n)), "k", "j", "b")
    got = _to_dense(op(A, B).collect(), m, n)
    assert np.allclose(got, np.full((m, n), float(k)))


@pytest.mark.parametrize("op", [gemm_coordinate, gemm_block])
def test_gemm_identity(spark, op):
    rng = np.random.default_rng(42)
    M = rng.normal(size=(12, 12))
    A = _coord_df(spark, M, "i", "k", "a")
    B = _coord_df(spark, np.eye(12), "k", "j", "b")
    got = _to_dense(op(A, B).collect(), 12, 12)
    # A·I = A up to dropped explicit zeros (random M has none).
    assert np.allclose(got, M)


@pytest.mark.parametrize("bs", [4, 7, 32])
def test_gemm_block_random_vs_numpy(spark, bs):
    # The reference's shipped problem shape scaled down: m×k · k×n with
    # k-blocking (src/main.rs:14). Block size need not divide dimensions.
    rng = np.random.default_rng(7)
    m, k, n = 20, 33, 15
    MA, MB = rng.normal(size=(m, k)), rng.normal(size=(k, n))
    A = _coord_df(spark, MA, "i", "k", "a")
    B = _coord_df(spark, MB, "k", "j", "b")
    got = _to_dense(gemm_block(A, B, block_size=bs).collect(), m, n)
    assert np.allclose(got, MA @ MB, atol=1e-9)


def test_gemm_coordinate_random_vs_numpy(spark):
    rng = np.random.default_rng(3)
    m, k, n = 10, 24, 9
    MA, MB = rng.normal(size=(m, k)), rng.normal(size=(k, n))
    A = _coord_df(spark, MA, "i", "k", "a")
    B = _coord_df(spark, MB, "k", "j", "b")
    got = _to_dense(gemm_coordinate(A, B).collect(), m, n)
    assert np.allclose(got, MA @ MB, atol=1e-9)


def test_gemm_coordinate_sparse_inputs(spark):
    # Missing coordinates are implicit zeros; result omits all-zero cells.
    A = spark.createDataFrame([(0, 0, 2.0), (1, 1, 3.0)], ["i", "k", "a"])
    B = spark.createDataFrame([(0, 0, 5.0), (1, 1, 7.0)], ["k", "j", "b"])
    got = {(r["i"], r["j"]): r["val"] for r in gemm_coordinate(A, B).collect()}
    assert got == {(0, 0): 10.0, (1, 1): 21.0}


def test_gram_matrix_via_block_gemm(spark, sf_dir):
    # similarity scores ARE the reference's outer product: G = E-transpose
    # dot E over the embeddings fixture, block path vs numpy.
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(40)
    rows = emb.select("vec_id", "embedding").collect()
    E = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = {r["vec_id"]: i for i, r in enumerate(rows)}
    A = spark.createDataFrame(
        [(int(r["vec_id"]), d, float(v)) for r in rows for d, v in enumerate(r["embedding"])],
        ["i", "k", "a"],
    )
    B = spark.createDataFrame(
        [(d, int(r["vec_id"]), float(v)) for r in rows for d, v in enumerate(r["embedding"])],
        ["k", "j", "b"],
    )
    got = np.zeros((len(rows), len(rows)))
    for r in gemm_block(A, B, block_size=16).collect():
        got[ids[r["i"]], ids[r["j"]]] = r["val"]
    assert np.allclose(got, E @ E.T, atol=1e-6)
