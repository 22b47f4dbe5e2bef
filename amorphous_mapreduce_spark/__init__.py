"""amorphous_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference MapReduce dataflow engine (derange-alembic/amorphous-mapreduce,
see SURVEY.md), re-expressed Spark-first:

- the reference's word-count pipeline (src/word_count.rs) -> declarative
  tokenise/normalise/count over DataFrames (operators.wordcount);
- the reference's k-blocked outer-product GEMM (src/outer_product.rs) ->
  coordinate-form join+aggregate GEMM and a block pandas-UDF variant
  (operators.gemm);
- the reference's op-trace export (src/op.rs, src/main.rs:17-25) ->
  Catalyst plan JSON export + metrics cost report (plans.trace);
- north-star LLM-pipeline operators: dedup, similarity search, text
  analysis, multimodal columns (operators.*).

Everything is built on the public PySpark DataFrame/SQL API; physical
concerns the reference hand-codes (shuffle placement, spill, memory
borrowing, partial aggregation) are delegated to Catalyst/AQE/Tungsten.
"""

from amorphous_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
