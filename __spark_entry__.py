"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (word-count pipeline, the reference's
core semantics) on sf0.001. ``queries()`` — one entry per implemented
operator from SURVEY.md §2. ``oracle_sql()`` — DuckDB-equivalent SQL per
query; computed columns are aliased identically on both sides and float
aggregations use exact decimal accumulation so value hashes match.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from amorphous_mapreduce_spark import queries_registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's word-count pipeline over documents."""
    return queries_registry.QUERIES["wordcount"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(queries_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(queries_registry.ORACLES)
