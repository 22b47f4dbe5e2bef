"""Blocked outer-product GEMM — the reference's flagship pipeline, Spark-first.

Reference semantics (src/outer_product.rs, SURVEY.md §2.3): C = A·B is
decomposed into k-sliced rank-k outer products computed per mapper (G6,
CrossPOp k·m·n, src/op.rs:108-163), shuffled to a 2-D grid of reducer tiles
(G7-G9), and accumulated per tile (G10-G12, VecOp). Spark mapping:

- **coordinate form** (`gemm_coordinate`): A(i,k,a) ⋈ B(k,j,b) on k, then
  groupBy(i,j).sum(a*b). Catalyst's partial+final HashAggregate IS the
  reference's mapper-combine (k-slice partial products) + reducer-tile
  accumulate; the exchange on (i,j) is the G7-G9 shuffle; spill is the
  block manager's. One shuffle for the join (on k), one for the agg.
- **block form** (`gemm_block`): the reference's actual tiling (G3) reborn:
  cells are grouped into (block_i, block_k)/(block_k, block_j) dense
  blocks, block pairs join on block_k, and each (block_i, block_j) output
  tile is accumulated across its k-blocks inside one applyInPandas call
  with np.dot (Arrow-batched, BLAS-backed) — the per-tile VecOp chain
  G10-G12 as vectorised Python. Emits coordinates again.

Scale (100 TB): coordinate form shuffles |A|·(avg k-fanout) rows — fine for
sparse/tall-skinny; block form moves each block once per peer block
(SUMMA-style) and keeps the inner loop in BLAS — right for dense. Block
sizes must keep a block pair ≪ executor memory: the G3 tiling decision,
now a parameter instead of hard-coded SRAM math (src/outer_product.rs:146-169).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gemm_coordinate(A: DataFrame, B: DataFrame) -> DataFrame:
    """C(i,j,val) = Σ_k A(i,k,a)·B(k,j,b); schema [i, j, val].

    Sum type follows the input column types (exact for integers; for
    floats, use gemm_block or accept order-dependent double rounding).
    """
    return (
        A.join(B, "k")
        .groupBy("i", "j")
        .agg(F.sum(F.col("a") * F.col("b")).alias("val"))
    )


def gemm_block(
    A: DataFrame,
    B: DataFrame,
    block_size: int = 64,
) -> DataFrame:
    """Blocked GEMM via applyInPandas(np.dot) per output tile.

    A: [i, k, a], B: [k, j, b] coordinate DataFrames (double-valued).
    Returns [i, j, val] with val double. ``block_size`` is the square block
    edge (the reference's tile shape, src/outer_product.rs:162-166); a
    block pair holds 2·block_size² doubles — keep ≪ executor memory.
    """
    bs = block_size
    # Cells are carried as three parallel flat arrays (indices + values),
    # unzipped JVM-side with transform() — so the Python side densifies
    # blocks with vectorised fancy indexing, never a per-cell loop (a
    # bs²-cell Python loop would dominate at real block sizes).
    Ab = (
        A.withColumn("bi", (F.col("i") / bs).cast("long"))
        .withColumn("bk", (F.col("k") / bs).cast("long"))
        .groupBy("bi", "bk")
        .agg(F.collect_list(F.struct("i", "k", "a")).alias("c"))
        .select(
            "bi",
            "bk",
            F.transform("c", lambda s: s["i"]).alias("a_ii"),
            F.transform("c", lambda s: s["k"]).alias("a_kk"),
            F.transform("c", lambda s: s["a"]).alias("a_vv"),
        )
    )
    Bb = (
        B.withColumn("bk", (F.col("k") / bs).cast("long"))
        .withColumn("bj", (F.col("j") / bs).cast("long"))
        .groupBy("bk", "bj")
        .agg(F.collect_list(F.struct("k", "j", "b")).alias("c"))
        .select(
            "bk",
            "bj",
            F.transform("c", lambda s: s["k"]).alias("b_kk"),
            F.transform("c", lambda s: s["j"]).alias("b_jj"),
            F.transform("c", lambda s: s["b"]).alias("b_vv"),
        )
    )
    # One row per (bi, bk, bj) block pair; grouped by output tile (bi, bj)
    # so each tile accumulates its k-blocks locally (reference G10).
    pairs = Ab.join(Bb, "bk")

    def multiply_tile(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        bi = int(pdf["bi"].iloc[0])
        bj = int(pdf["bj"].iloc[0])
        i0, j0 = bi * bs, bj * bs
        tile = np.zeros((bs, bs))
        seen_i = np.zeros(bs, dtype=bool)
        seen_j = np.zeros(bs, dtype=bool)
        for row in pdf.itertuples():
            k0 = int(row.bk) * bs
            a_mat = np.zeros((bs, bs))
            ai = np.asarray(row.a_ii, dtype=np.int64) - i0
            ak = np.asarray(row.a_kk, dtype=np.int64) - k0
            a_mat[ai, ak] = np.asarray(row.a_vv, dtype=np.float64)
            seen_i[ai] = True
            b_mat = np.zeros((bs, bs))
            bk_ = np.asarray(row.b_kk, dtype=np.int64) - k0
            bj_ = np.asarray(row.b_jj, dtype=np.int64) - j0
            b_mat[bk_, bj_] = np.asarray(row.b_vv, dtype=np.float64)
            seen_j[bj_] = True
            tile += a_mat @ b_mat
        ii, jj = np.nonzero(np.outer(seen_i, seen_j))
        return pd.DataFrame({"i": ii + i0, "j": jj + j0, "val": tile[ii, jj]})

    return pairs.groupBy("bi", "bj").applyInPandas(
        multiply_tile, schema="i long, j long, val double"
    )
