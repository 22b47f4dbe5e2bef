"""Streaming sink into the versioned parquet table (CDC-style pipeline).

foreachBatch bridges Structured Streaming to the copy-on-write upsert
(sources.merge): each micro-batch merges by key into a new snapshot, so
the table always exposes the latest value per key while readers of prior
snapshots are undisturbed. This is the classic stream-to-lakehouse
pattern with the table format replaced by the in-repo versioned layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from amorphous_mapreduce_spark.sources.merge import upsert_parquet


def stream_upsert(
    stream: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint: str,
    trigger_available_now: bool = True,
    order_cols: list[str] | None = None,
) -> StreamingQuery:
    """Continuously upsert a stream into the versioned table.

    Each micro-batch becomes one table version. Within a batch the
    survivor per key is chosen DETERMINISTICALLY by ``sources.merge.
    dedupe_updates`` (greatest row under ``order_cols`` desc — e.g. a
    ts/sequence column for last-writer-wins — tie-broken by the
    remaining columns), so replaying a batch after a checkpoint restart
    upserts the SAME row, making replay content-idempotent. A plain
    dropDuplicates here would let a different row win on replay.
    """

    def _merge_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_parquet(batch.sparkSession, table_path, batch, keys, order_cols)

    writer = stream.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
