"""Arrow-native execution kernels: mapInArrow and iterator pandas UDFs.

Two Python-boundary patterns the rest of the engine doesn't otherwise
exercise, both important at 100 TB:

- ``mapInArrow`` hands the kernel raw ``pyarrow.RecordBatch``es — no
  pandas materialization at all, so a columnar kernel (here: the JL
  +-1-sign projection over int8-quantized embeddings) runs zero-copy
  from the JVM into numpy and back. Use it when the per-batch work is
  pure vectorized arithmetic and pandas' index machinery is overhead.

- the ITERATOR pandas UDF form (``Iterator[pd.Series] ->
  Iterator[pd.Series]``) amortizes expensive per-task initialization
  (compiled regexes, loaded models) across every batch the task sees —
  the per-batch scalar form would re-enter Python per batch but cannot
  hoist init out of the call. This is the canonical shape for
  model-scoring stages.

Both kernels are deterministic and covered by numpy-replay tests;
they deliberately mirror existing JVM-side results (JL projections =
queries/pipeline_queries.JL_SIGNS) so tests can assert equality with
the expression-based path. Reference tie-in: VecOp elementwise
kernels (src/op.rs:18-35) executed at the Arrow boundary.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def jl_project_arrow(
    emb: DataFrame,
    signs: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """[id, y: array<long>] — int8-quantize then +-1-sign-project each
    embedding, computed batch-at-a-time over raw Arrow buffers."""
    import numpy as np

    k = len(signs)
    dim = len(signs[0])
    sign_m = [list(map(int, s)) for s in signs]
    out_schema = f"id long, y array<long>"

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        s = np.array(sign_m, dtype=np.int64)  # (k, dim), built once per task
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            flat = np.asarray(
                batch.column(1).flatten().to_numpy(zero_copy_only=False),
                dtype=np.float64,
            ).reshape(len(ids), dim)
            scale = np.abs(flat).max(axis=1)
            keep = scale > 0
            q = np.trunc(
                flat[keep] / scale[keep][:, None] * 127.0
            ).astype(np.int64)
            y = q @ s.T  # (n, k) exact integers
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids[keep], type=pa.int64()),
                    pa.array(list(y), type=pa.list_(pa.int64())),
                ],
                names=["id", "y"],
            )

    return emb.select(F.col(id_col).cast("long"), vec_col).mapInArrow(
        kernel, out_schema
    )


def token_count_iter_udf() -> "pandas_udf":
    """Iterator-form pandas UDF: whitespace token counter whose regex is
    compiled ONCE per task, then reused across every Arrow batch."""

    @pandas_udf("long")
    def n_tokens(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        ws = re.compile(r"\s+")  # per-task init, amortized over batches
        for s in it:
            yield s.fillna("").map(
                lambda t: len([w for w in ws.sub(" ", t.strip().lower()).split(" ") if w])
            )

    return n_tokens
