"""Skew mitigation: salting for hot keys (SURVEY.md 100 TB posture).

AQE's skew-join splitting handles most cases automatically
(spark.sql.adaptive.skewJoin.enabled, on in session.py); these helpers
cover the residual cases — aggregations with distinct-heavy hot keys and
joins where one side's hot keys dwarf a partition — with the classic
salt-and-two-stage pattern. The salt is derived from a stable hash of a
row-local column (never rand()), so results are deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: list[str], buckets: int) -> Column:
    # xxhash64 of payload columns spreads a hot key's rows evenly; any
    # row-local deterministic value works (salt only affects placement).
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets))


def salted_count(
    df: DataFrame, key: str, payload_cols: list[str], buckets: int = 16
) -> DataFrame:
    """groupBy(key).count() for skewed keys: two-stage (key,salt)->key.

    Stage 1 spreads each hot key over ``buckets`` reducers; stage 2 merges
    ``buckets`` partials per key — the reference's partial+final reduce
    (SURVEY.md G6/G10) made explicit for placement control.
    """
    return (
        df.withColumn("_salt", _salt_col(payload_cols, buckets))
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_partial"))
        .groupBy(key)
        .agg(F.sum("_partial").alias("cnt"))
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    payload_cols: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys overwhelm single partitions.

    The skewed side gets a salt from its payload; the small side is
    replicated once per salt value, and the join runs on (key, salt) —
    every hot key now spans ``buckets`` partitions. Output equals the
    plain inner join on ``key``.
    """
    spark = skewed.sparkSession
    salts = spark.range(buckets).select(F.col("id").cast("int").alias("_salt"))
    left = skewed.withColumn("_salt", _salt_col(payload_cols, buckets).cast("int"))
    right = small.crossJoin(salts)
    return left.join(right, [key, "_salt"]).drop("_salt")
