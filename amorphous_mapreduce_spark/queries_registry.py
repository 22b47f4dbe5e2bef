"""The judge-facing query registry: name -> (Spark builder, DuckDB oracle).

Every operator from SURVEY.md §2 (and the north-star extensions) registers
here. Conventions that make the driver's hash compare pass:

- every computed column is aliased identically in Spark and SQL;
- SUM/AVG over doubles accumulates in DECIMAL(18,2|4) then casts back to
  double — decimal addition is associative, so shuffle/order differences
  between Spark and DuckDB cannot change the result bit pattern;
- array dot products use an ordered left fold in double on both engines;
- every top-k has a total-order tie-break key;
- hashes that must match across engines are MD5-derived
  (functions.hashing.hex_hash64), never murmur3.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(
    name: str, oracle: str | None = None
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    """Decorator: add a query builder (and optional oracle SQL) by name."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(existing: {QUERIES[name].__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from amorphous_mapreduce_spark.queries import (  # noqa: E402,F401
    analysis_queries,
    analytics_queries,
    bpe_queries,
    causal_queries,
    cluster_queries,
    compliance_queries,
    corpus_queries,
    curation_queries,
    dedup_queries,
    dq_queries,
    econ_queries,
    eval_queries,
    forensics_queries,
    gemm_queries,
    inference_queries,
    insight_queries,
    kmeans_queries,
    lakehouse_queries,
    lm_queries,
    mining_queries,
    misc_queries,
    monitor_queries,
    multimodal_queries,
    ordering_queries,
    pipeline_queries,
    relational_queries,
    selection_queries,
    similarity_queries,
    sketch_queries,
    ulm_queries,
    source_queries,
    spatial_queries,
    sql_queries,
    stats_queries,
    streaming_queries,
    subquery_queries,
    temporal_queries,
    text_queries,
    timeseries_queries,
    tpch_extra,
    trend_queries,
    warehouse_queries,
)
