"""Deterministic k-means over embeddings (diversity clustering).

Training-data pipelines cluster embeddings to sample diverse subsets and
to cap near-duplicate regions. This implementation is engineered for
exact cross-engine reproducibility (the repo's oracle discipline):

- vectors are quantised to integers (round(x*1000)) so centroid updates
  are exact integer sums divided once in double — no float-accumulation
  order sensitivity;
- seeds are the ``k`` vectors with smallest md5(vec_id) (deterministic,
  no RNG), mirroring operators.similarity.ivf_assign; selected via
  orderBy(hash, id).limit(k) — TakeOrderedAndProject, a distributed
  per-partition top-k merge, NOT a single-partition global window — and
  labeled by the seed's own id (cell = seed vec_id);
- assignment is argmin squared distance via argmax(q·c − |c|²/2)
  (ordered double folds), ties broken by cell id;
- a fixed iteration count (no convergence check) keeps the computation
  identical to an unrolled SQL oracle.

Scale: per iteration, one broadcast join against k centroids + one
groupBy(cell, dim) aggregation over n·d rows — linear in corpus size;
k and d stay driver-side tiny (k centroids collected per iteration is
k·d doubles, not data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from amorphous_mapreduce_spark.functions.hashing import hex_hash64

QUANT = 1000

# Default training-sample size for sampled Lloyd iterations (round 7,
# VERDICT_r06 items 3/5): at or below this corpus size sampled training
# IS full training (the bottom-n-by-hash sample is the whole corpus), so
# driver-SF results are unchanged; above it, training cost is CONSTANT
# in corpus size (the only full-corpus pass left is the final assign).
KM_TRAIN_N = 4096


def _quantize(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x * QUANT).cast("long")
    )
    return emb.select(F.col(id_col).alias("id"), qv.alias("qv"))


def _score(qv_col: str, cv_col: str):
    """argmax objective: q·c − |c|²/2 (equivalent to argmin distance)."""
    dot = F.aggregate(
        F.zip_with(qv_col, cv_col, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    c2 = F.aggregate(
        F.zip_with(cv_col, cv_col, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot - c2 / 2


def _assign(q: DataFrame, centroids: DataFrame) -> DataFrame:
    w = Window.partitionBy("id").orderBy(F.desc("_s"), F.asc("cell"))
    return (
        q.crossJoin(F.broadcast(centroids))
        .select("id", "qv", "cell", _score("qv", "cv").alias("_s"))
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("id", "qv", "cell")
    )


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Run ``iters`` Lloyd iterations; return (quantized, assigned,
    centroids) where assigned = [id, qv, cell] against the FINAL
    centroids [cell, cv] — callers needing the model (silhouette,
    scoring new points) use the centroid frame, callers needing only
    labels use ``kmeans_assign``.

    ``train_sample=n``: Lloyd iterations run over only the ``n`` vectors
    with smallest (md5('kmtrain_'||id), id) — a deterministic fixed-size
    sample selected by TakeOrderedAndProject, so training cost is
    CONSTANT in corpus size and the single full-corpus pass is the final
    assignment (previously every iteration scanned the full corpus —
    slope3 7.9 / 46.6 s at sf10, VERDICT_r06 item 5). When n >= corpus
    size the sample is the whole corpus and results are identical to
    unsampled training. The oracle replays the same ORDER BY hash LIMIT
    n sample, so sampled training stays hash-checkable."""
    q = _quantize(emb, id_col, vec_col).persist()
    if train_sample is None:
        train = q
    else:
        train = (
            q.orderBy(
                hex_hash64(
                    F.concat(F.lit("kmtrain_"), F.col("id").cast("string"))
                ),
                F.col("id"),
            )
            .limit(train_sample)
            .persist()
        )
    centroids = (
        train.orderBy(hex_hash64(F.col("id").cast("string")), F.col("id"))
        .limit(k)
        .select(
            F.col("id").alias("cell"),
            F.transform("qv", lambda x: x.cast("double")).alias("cv"),
        )
    )
    assigned = _assign(train, centroids)
    for _ in range(iters):
        means = (
            assigned.select("cell", F.posexplode("qv").alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg((F.sum("v").cast("double") / F.count("*")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        assigned = _assign(train, means)
        centroids = means
    if train is not q:
        # One full-corpus pass against the final (sample-trained) model —
        # via the Arrow kernel: the declarative _assign's per-row fold
        # (F.aggregate lambda over d terms × k centroids) is interpreted
        # expression-tree evaluation, measured ~30 s for 200k×64×8 at
        # the sf10 rung; the kernel does the same ordered per-dimension
        # accumulation vectorized (bit-identical doubles). Persist the
        # k-row centroid frame first: the kernel collects it eagerly,
        # and callers that use the centroid frame afterwards (the IVF
        # ranking cross join) must hit the cache, not re-run training.
        centroids = centroids.persist()
        assigned = _assign_arrow(q, centroids)
    return q, assigned, centroids


def _assign_arrow(q: DataFrame, centroids: DataFrame) -> DataFrame:
    """Full-corpus argmax assignment as ONE mapInPandas kernel.

    Bit-exact with :func:`_assign` / the SQL oracle: scores accumulate
    per dimension in order (``acc[:,c] += v[d]*C[c,d]`` for d = 0..D-1 —
    the identical double-addition sequence as the ordered left fold /
    DuckDB list_dot_product), c2/2 is one exact halving, and ties break
    to the smallest cell (centroid rows sorted by cell; argmax returns
    the first maximum). Centroids are collected driver-side — k·d
    doubles, the model, not data (same class as the dims probe)."""
    import numpy as np

    rows = sorted(centroids.collect(), key=lambda r: r["cell"])
    if not rows:
        spark = q.sparkSession
        return spark.createDataFrame(
            [], schema="id long, qv array<bigint>, cell long"
        )
    cells = np.array([r["cell"] for r in rows], dtype=np.int64)
    C = np.array([list(r["cv"]) for r in rows], dtype=np.float64)  # k x d
    # c2 via the same ordered left fold (python float add == IEEE add)
    c2 = np.array(
        [_ordered_fold_sq(list(r["cv"])) for r in rows], dtype=np.float64
    )
    dims = C.shape[1]

    def kernel(it):
        import pandas as pd

        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.array([list(v) for v in pdf["qv"]], dtype=np.float64)
            acc = np.zeros((len(pdf), len(cells)), dtype=np.float64)
            for d in range(dims):  # ordered over dims == left fold order
                acc += V[:, d : d + 1] * C[:, d]
            scores = acc - c2 / 2.0
            best = np.argmax(scores, axis=1)  # first max = smallest cell
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "qv": pdf["qv"],
                    "cell": cells[best],
                }
            )

    return q.mapInPandas(kernel, "id long, qv array<bigint>, cell long")


def _ordered_fold_sq(cv: list[float]) -> float:
    acc = 0.0
    for x in cv:
        acc = acc + x * x
    return acc


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int | None = None,
) -> DataFrame:
    """Cluster assignments after ``iters`` Lloyd iterations: [id, cell]."""
    _, assigned, _ = kmeans_fit(emb, k, iters, id_col, vec_col, train_sample)
    return assigned.select("id", "cell")


def cluster_sizes(assignments: DataFrame) -> DataFrame:
    """[cell, n_members] — the diversity histogram."""
    return assignments.groupBy("cell").agg(F.count("*").alias("n_members"))
