"""mapInArrow + iterator pandas UDF kernels: equality with the
JVM-expression JL path and a numpy/pure-Python replay."""

from __future__ import annotations

from pyspark.sql import functions as F

import amorphous_mapreduce_spark.queries_registry  # noqa: F401  (breaks the circular query-module chain)
from amorphous_mapreduce_spark.operators.arrow_kernels import (
    jl_project_arrow,
    token_count_iter_udf,
)
from amorphous_mapreduce_spark.sources import load_table


def test_jl_arrow_matches_numpy(spark, sf_dir):
    import numpy as np

    from amorphous_mapreduce_spark.queries.pipeline_queries import JL_SIGNS

    emb = load_table(spark, sf_dir, "embeddings")
    got = {
        r.id: list(r.y)
        for r in jl_project_arrow(emb, JL_SIGNS).collect()
    }
    signs = np.array(JL_SIGNS, dtype=np.int64)
    want = {}
    for r in emb.collect():
        v = np.array(r.embedding, dtype=np.float64)
        s = np.abs(v).max()
        if s > 0:
            q = np.trunc(v / s * 127.0).astype(np.int64)
            want[r.vec_id] = list(signs @ q)
    assert got == want


def test_jl_arrow_plan_is_arrow_eval(spark, sf_dir):
    from amorphous_mapreduce_spark.queries.pipeline_queries import JL_SIGNS

    df = jl_project_arrow(load_table(spark, sf_dir, "embeddings"), JL_SIGNS)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInArrow" in plan or "PythonMapInArrow" in plan


def test_iterator_udf_counts_tokens(spark, sf_dir):
    import re

    docs = load_table(spark, sf_dir, "documents")
    fn = token_count_iter_udf()
    got = {
        r.doc_id: r.n
        for r in docs.select("doc_id", fn("text").alias("n")).collect()
    }
    for r in docs.collect():
        want = len(
            [w for w in re.sub(r"\s+", " ", r.text.strip().lower()).split(" ") if w]
        )
        assert got[r.doc_id] == want
