"""Sinks: parquet/json/csv/text writers with scale-oriented layouts.

The reference's sinks are a JSON trace file (src/main.rs:22-25) and
conceptual write-back TransOps (G13). Here the sink layer is Spark's
DataSource writers plus the two layout decisions that matter at 100 TB:

- **partitionBy**: directory partitioning on low-cardinality keys so
  downstream scans prune partitions (PartitionFilters in the plan);
- **bucketBy**: pre-shuffled, sorted table layout on join/agg keys so
  repeated joins on the key skip their exchange entirely (the reference's
  static mapper->reducer routing, persisted).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Line-delimited JSON — the reference's trace-file format family."""
    df.write.mode(mode).json(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins/aggregations on ``bucket_cols`` against this table avoid the
    shuffle (co-located partitioning, the reference's fixed tile routing).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def read_json(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.json(path)


def read_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    return (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", "true")
        .csv(path)
    )


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list | None = None
) -> None:
    """ORC writer — the columnar alternative warehouses standardized on
    before parquet; same predicate-pushdown / column-pruning contract
    (Spark's OrcFileFormat supports PushedFilters identically)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
