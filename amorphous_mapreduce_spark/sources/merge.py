"""MERGE-style upsert over plain parquet: copy-on-write versioned table.

Production lakehouse formats (Delta/Iceberg/Hudi) aren't available in this
environment, so this module implements the core mechanics directly:

- ``merge_upsert``: pure transform — updates win by key, the rest of the
  base survives (an anti-join + union, both hash-shuffles on the key);
- ``upsert_parquet`` / ``read_latest``: copy-on-write versioned
  directories (``<path>/v=N``): each upsert writes a complete new
  snapshot and becomes latest only when the write finishes, so concurrent
  readers of v=N-1 are never disturbed (snapshot isolation by
  immutability — the same contract the table formats provide, minus
  manifest-level file skipping).

Scale notes: copy-on-write rewrites the full table per upsert — right for
batch ETL refreshes; at 100 TB with small frequent upserts you want a
real table format's merge-on-read instead, and ``merge_upsert`` is
exactly the transform those formats run under the hood.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dedupe_updates(
    updates: DataFrame, keys: list[str], order_cols: list[str] | None = None
) -> DataFrame:
    """Collapse ``updates`` to one row per key, deterministically.

    MERGE semantics require a unique source row per key; an update batch
    with several rows for one key must pick the SAME survivor on every
    run (and on checkpoint replay in the streaming sink). The survivor is
    the greatest row under ``order_cols`` descending (e.g. a ts/sequence
    column = last-writer-wins), tie-broken by the remaining non-key
    columns so the ordering is total. With no orderable columns at all
    (key-only rows) duplicates are content-identical and a plain
    dropDuplicates is already deterministic.
    """
    explicit = list(order_cols or [])
    others = [c for c in updates.columns if c not in keys and c not in explicit]
    ordering = [F.col(c).desc_nulls_last() for c in explicit + others]
    if not ordering:
        return updates.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str] | None = None,
    evolve_schema: bool = False,
) -> DataFrame:
    """Rows of ``updates`` plus base rows whose key has no update.

    ``updates`` is deduped per key first (see ``dedupe_updates``) so the
    result never carries duplicate keys, even for direct callers that
    pass multi-row-per-key batches.

    ``evolve_schema=True`` implements additive schema evolution (the
    Delta/Iceberg ``mergeSchema`` contract): columns new in ``updates``
    are added to the table with NULL for untouched base rows, and
    columns the updates batch omits survive as NULL on updated rows.
    Without the flag a schema mismatch stays a loud AnalysisException —
    silent column drift in a 100 TB table is worse than a failed job.
    """
    updates = dedupe_updates(updates, keys, order_cols)
    survivors = base.join(updates.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(updates, allowMissingColumns=evolve_schema)


def _versions(table_path: str) -> list[int]:
    if not os.path.isdir(table_path):
        return []
    out = []
    for name in os.listdir(table_path):
        m = re.fullmatch(r"v=(\d+)", name)
        if m and os.path.exists(os.path.join(table_path, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(table_path: str) -> int | None:
    vs = _versions(table_path)
    return vs[-1] if vs else None


def read_latest(spark: SparkSession, table_path: str) -> DataFrame:
    """Latest committed snapshot (raises if the table has none)."""
    v = latest_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no committed versions under {table_path}")
    return spark.read.parquet(os.path.join(table_path, f"v={v}"))


def read_version(spark: SparkSession, table_path: str, version: int) -> DataFrame:
    """Time travel: read a specific committed snapshot."""
    return spark.read.parquet(os.path.join(table_path, f"v={version}"))


def upsert_parquet(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
    order_cols: list[str] | None = None,
    evolve_schema: bool = False,
) -> int:
    """Upsert ``updates`` into the versioned table; returns the new version.

    First call (no versions yet) writes the (key-deduped) updates as v=0.
    The _SUCCESS marker gates visibility: a crashed write never becomes
    latest. ``evolve_schema`` adds additive column evolution (see
    ``merge_upsert``) — each snapshot carries the union schema, so time
    travel across the evolution boundary stays well-typed per version.
    """
    v = latest_version(table_path)
    if v is None:
        new_v = 0
        merged = dedupe_updates(updates, keys, order_cols)
    else:
        new_v = v + 1
        merged = merge_upsert(
            read_version(spark, table_path, v),
            updates,
            keys,
            order_cols,
            evolve_schema=evolve_schema,
        )
    merged.write.mode("errorifexists").parquet(
        os.path.join(table_path, f"v={new_v}")
    )
    return new_v


def vacuum(table_path: str, keep_last: int = 2) -> list[int]:
    """Retention: delete all but the newest ``keep_last`` committed
    snapshots (plus any uncommitted crash leftovers older than the
    latest commit). Returns the removed version numbers.

    Readers of a removed version lose time travel to it — same contract
    as Delta/Iceberg VACUUM / expire_snapshots; the latest snapshot is
    never removable (keep_last is clamped to >= 1). Deletion order is
    oldest-first so a crash mid-vacuum leaves a contiguous recent
    window.
    """
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the latest snapshot must survive)")
    committed = _versions(table_path)
    if not committed:
        return []
    cutoff = committed[-keep_last:] if keep_last < len(committed) else committed
    keep = set(cutoff)
    removed: list[int] = []
    # uncommitted leftovers (no _SUCCESS) below the latest commit are
    # crashed writes that can never become latest — reap them too
    latest = committed[-1]
    for name in sorted(os.listdir(table_path)):
        m = re.fullmatch(r"v=(\d+)", name)
        if not m:
            continue
        v = int(m.group(1))
        is_committed = v in committed
        if (is_committed and v not in keep) or (not is_committed and v < latest):
            shutil.rmtree(os.path.join(table_path, name))
            if is_committed:
                removed.append(v)
    return removed


def compact(
    spark: SparkSession, table_path: str, target_partitions: int = 8
) -> int:
    """Small-files compaction: rewrite the latest snapshot as a new
    version with ``target_partitions`` output files. Returns the new
    version number.

    The content is byte-identical (same rows); only the file layout
    changes — the OPTIMIZE/rewrite_data_files contract. Because the
    rewrite is just another committed version, readers pinned to the
    old snapshot are undisturbed and a crash mid-compaction is
    invisible (_SUCCESS gating); pair with ``vacuum`` to reclaim the
    fragmented snapshot afterwards.
    """
    v = latest_version(table_path)
    if v is None:
        raise FileNotFoundError(f"no committed versions under {table_path}")
    new_v = v + 1
    df = read_version(spark, table_path, v)
    df.repartition(target_partitions).write.mode("errorifexists").parquet(
        os.path.join(table_path, f"v={new_v}")
    )
    return new_v
