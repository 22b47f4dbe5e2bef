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
) -> StreamingQuery:
    """Continuously upsert a stream into the versioned table.

    Each micro-batch becomes one table version; batch replays (after a
    restart from the checkpoint) are idempotent per key because upsert
    overwrites by key.
    """

    def _merge_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        # last-writer-wins inside the batch: keep one row per key
        deduped = batch.dropDuplicates(keys)
        upsert_parquet(batch.sparkSession, table_path, deduped, keys)

    writer = stream.writeStream.foreachBatch(_merge_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
