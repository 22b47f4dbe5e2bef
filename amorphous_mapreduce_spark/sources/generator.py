"""Custom Python Data Source: a deterministic, distributed synthetic
event generator (Spark 4 DataSource V2 Python API).

The reference's scan layer is a line-oriented file reader
(src/word_count.rs:73-88); this module is the engine's answer to "where
does 100 TB of test data come from": a generator source that
materialises nothing — every executor synthesises its own partition
range on demand, so benchmark input scales to any size with zero I/O
and zero storage. Three engine-grade properties:

- **Partition planning**: `partitions()` splits the id range into
  `numPartitions` independent `InputPartition`s — a 1000-executor
  cluster generates 1000 ranges concurrently, no driver bottleneck.
- **Filter pushdown**: `pushFilters` consumes >=/>/<=/</= predicates on
  `event_id` by shrinking the generated range itself (the generator
  analogue of parquet row-group pruning); everything else is left for
  Spark to evaluate.
- **Deterministic + oracle-replayable rows**: fields derive from one
  64-bit LCG step (mod-2^64 wraparound), which numpy reproduces with
  uint64 arithmetic and DuckDB reproduces with HUGEINT modulo — so even
  this non-file source is value-hash-checked against the SQL oracle.

Rows are yielded as pyarrow RecordBatches built from vectorised numpy
(the Arrow fast path — no per-row Python in the scan loop).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

# One LCG step (Knuth's MMIX constants), everything mod 2^64.
LCG_MULT = 6364136223846793005
LCG_ADD = 1442695040888963407
EVENT_TYPES = ("view", "click", "purchase", "scroll")

SCHEMA_DDL = "event_id bigint, user_id bigint, event_type string, value double"


def _gen_batch(start: int, end: int) -> pa.RecordBatch:
    """Vectorised row synthesis for ids [start, end): one uint64 LCG
    step, fields carved out of the hash by modulo/division."""
    i = np.arange(start, end, dtype=np.uint64)
    h = i * np.uint64(LCG_MULT) + np.uint64(LCG_ADD)  # wraps mod 2^64
    user_id = (h % np.uint64(1000)).astype(np.int64)
    etype_idx = ((h // np.uint64(1000)) % np.uint64(4)).astype(np.int64)
    value = ((h // np.uint64(4000)) % np.uint64(100000)).astype(np.float64) / 100.0
    etypes = np.asarray(EVENT_TYPES, dtype=object)[etype_idx]
    return pa.RecordBatch.from_arrays(
        [
            pa.array(i.astype(np.int64)),
            pa.array(user_id),
            pa.array(etypes, type=pa.string()),
            pa.array(value),
        ],
        names=["event_id", "user_id", "event_type", "value"],
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    CHUNK = 65536

    def __init__(self, options):
        self.n_rows = int(options.get("rows", 100000))
        self.n_parts = int(options.get("numPartitions", 8))
        self.lo = 0
        self.hi = self.n_rows

    def pushFilters(self, filters):
        """Consume range predicates on event_id by shrinking the
        generated id range; yield back everything we can't handle."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("event_id",):
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value) + 1)
                    continue
            yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, self.n_parts)
        span = max(1, -(-(hi - lo) // n)) if hi > lo else 1
        parts = []
        s = lo
        while s < hi:
            parts.append(_Range(s, min(s + span, hi)))
            s += span
        return parts or [_Range(0, 0)]

    def read(self, partition: _Range) -> Iterator[pa.RecordBatch]:
        s = partition.start
        while s < partition.end:
            e = min(s + self.CHUNK, partition.end)
            yield _gen_batch(s, e)
            s = e


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Replay the same deterministic rows as a rate-limited stream:
    each microbatch advances the id cursor by `rowsPerBatch`. Offsets
    are plain dicts, so checkpoint/restart resumes exactly."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsPerBatch", 1000))
        self.max_rows = int(options.get("rows", 100000))

    def initialOffset(self):
        return {"next": 0}

    @staticmethod
    def _rows(s: int, e: int):
        if e <= s:
            return iter(())
        batch = _gen_batch(s, e)
        return zip(*(c.to_pylist() for c in batch.columns))

    def read(self, start):
        s = int(start["next"])
        e = min(s + self.rows_per_batch, self.max_rows)
        return self._rows(s, e), {"next": e}

    def readBetweenOffsets(self, start, end):
        return self._rows(int(start["next"]), int(end["next"]))


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA_DDL

    def reader(self, schema: StructType):
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return SyntheticEventsStreamReader(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotently register the source on a session we don't own.
    Python-source filter pushdown is gated behind a (runtime-settable)
    conf the driver's session won't have — set it here, same
    self-healing posture as sources.load_table."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # older/locked session: reader still works, no pushdown
    spark.dataSource.register(SyntheticEventsDataSource)
