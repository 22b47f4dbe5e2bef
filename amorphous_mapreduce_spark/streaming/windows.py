"""Streaming transformations over an events stream.

Each function takes an (already-streaming or batch) DataFrame and returns
the transformed DataFrame — source/sink wiring stays with the caller, so
the same logic is testable in batch and runs under readStream/writeStream
unchanged (Structured Streaming's unified semantics).

Scale notes: watermarks bound state; aggregations are partial+final as in
batch; session windows use Spark's built-in session_window state store
(the stateful analog of the batch lag+cumsum sessionization in
queries.relational_queries.sessionize).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time window stats per event_type.

    [window_start, window_end, event_type, n_events, sum_value]. Late rows
    beyond ``watermark`` are dropped (state stays bounded).
    """
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_event_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user session windows (gap-based) with event counts.

    [user_id, session_start, session_end, n_events] via the built-in
    session_window — dynamic-gap stateful windows, the streaming-native
    form of the reference's bounded-buffer wave accumulation.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream interval join: each left event paired with the right
    events for the same key whose timestamp lands in
    [left.ts, left.ts + max_delay] — the impression->click attribution
    shape. [key, l_ts, r_ts, l_type, r_type].

    Both sides carry watermarks and the join condition bounds r_ts
    relative to l_ts from BOTH directions, so Spark can expire state on
    both sides (unbounded conditions would grow state forever). The join
    itself is an equi-join on ``key`` with the range as a post-filter —
    state is hash-partitioned by key exactly like a batch shuffle join.
    """
    li = left.select(
        F.col(key).alias("k"),
        F.col("ts").alias("l_ts"),
        F.col("event_type").alias("l_type"),
    ).withWatermark("l_ts", watermark)
    ri = right.select(
        F.col(key).alias("k"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("r_type"),
    ).withWatermark("r_ts", watermark)
    cond = (
        (li["k"] == ri["k"])
        & (ri["r_ts"] >= li["l_ts"])
        & (ri["r_ts"] <= li["l_ts"] + F.expr(f"INTERVAL {max_delay}"))
    )
    return li.join(ri, cond).select(
        li["k"].alias(key), "l_ts", "r_ts", "l_type", "r_type"
    )


def streaming_word_counts(lines: DataFrame, text_col: str = "value") -> DataFrame:
    """The reference word-count pipeline as a continuous query.

    Same tokenise/normalise/count as operators.wordcount (W1-W8); under a
    stream source the groupBy maintains incremental state per word
    (update/complete output modes).
    """
    from amorphous_mapreduce_spark.operators.wordcount import word_counts

    return word_counts(lines, text_col=text_col)
