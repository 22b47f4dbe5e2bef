"""Batch-mode registrations of the streaming transforms.

Structured Streaming's unified semantics mean the same transform runs in
batch; registering the batch form gives the stateful operators (windows,
session windows) DuckDB oracles. The streaming execution path itself is
covered by tests/test_streaming.py (readStream -> memory sink parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from amorphous_mapreduce_spark.queries_registry import register
from amorphous_mapreduce_spark.sources import load_table
from amorphous_mapreduce_spark.streaming import (
    sessionized_event_counts,
    windowed_event_stats,
)

HOURLY_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY window_start, window_end, event_type
"""


@register("events_hourly_windows", HOURLY_ORACLE)
def q_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows (streaming op in batch mode):
    window starts align with date_trunc('hour')."""
    return windowed_event_stats(load_table(spark, sf_dir, "events"), window="1 hour")


SESSION_WINDOW_ORACLE = """
WITH lagged AS (
    SELECT user_id, ts, event_id,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events
), flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN prev_ts IS NULL
                  OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                THEN 1 ELSE 0 END AS is_new
    FROM lagged
), sessions AS (
    SELECT user_id, ts,
           SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
"""


@register("events_session_windows", SESSION_WINDOW_ORACLE)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window (gap 30m) cross-checked against the
    relational lag+cumsum sessionisation: session_end = last event + gap."""
    return sessionized_event_counts(load_table(spark, sf_dir, "events"), gap="30 minutes")


SLIDING_ORACLE = """
WITH e AS (
    SELECT time_bucket(INTERVAL '30 minutes', ts) AS b,
           event_type, value,
           unnest([0, 1]) AS k
    FROM events
)
SELECT b - k * INTERVAL '30 minutes' AS window_start,
       b - k * INTERVAL '30 minutes' + INTERVAL '60 minutes' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM e
GROUP BY window_start, window_end, event_type
"""


@register("events_sliding_windows", SLIDING_ORACLE)
def q_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows every 30m (each event lands in 2 overlapping
    windows) — the hopping-window streaming aggregate in batch mode;
    oracle expands the overlap with an unnest of the two slide offsets."""
    return windowed_event_stats(
        load_table(spark, sf_dir, "events"), window="1 hour", slide="30 minutes"
    )
