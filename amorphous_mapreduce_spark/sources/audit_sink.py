"""Custom Python Data Source WRITER: an audit sink with a two-phase
commit manifest (the G13 sink + G14 trace-export pair, re-expressed as
Spark's DataSourceWriter commit protocol).

Each task writes nothing until `commit()`: executors stream their
partition, fold rows into a tiny summary (count + an order-insensitive
MD5-sum checksum), and send it back as the WriterCommitMessage. Only
the driver's `commit()` — which runs exactly once, after every task
succeeded — writes the manifest file. A failed/speculative task's
output is therefore invisible by construction (`abort()` has nothing
to clean up), which is the exactly-once story object stores need at
1000-executor scale: no temp-file renames, no partial output, commit
metadata proportional to #partitions, not data.

Checksum = sum of per-row MD5 prefixes mod 2^63: associative and
commutative, so it is invariant to row order and partitioning — two
writes of the same DataFrame under different shuffles produce the same
manifest digest (verified in tests).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MOD = 1 << 63


@dataclass
class AuditCommit(WriterCommitMessage):
    n_rows: int
    checksum: int


def _row_digest(row) -> int:
    payload = "|".join(f"{k}={row[k]}" for k in sorted(row.asDict().keys()))
    return int(hashlib.md5(payload.encode("utf-8")).hexdigest()[:15], 16)


class AuditSinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("audit_sink requires option 'path'")

    def write(self, iterator) -> AuditCommit:
        n = 0
        acc = 0
        for row in iterator:
            n += 1
            acc = (acc + _row_digest(row)) % MOD
        return AuditCommit(n_rows=n, checksum=acc)

    def commit(self, messages):
        total = sum(m.n_rows for m in messages)
        digest = 0
        for m in messages:
            digest = (digest + m.checksum) % MOD
        manifest = {
            "total_rows": total,
            "digest": digest,
            "n_partitions": len(messages),
            "partitions": [
                {"rows": m.n_rows, "checksum": m.checksum} for m in messages
            ],
        }
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=2, sort_keys=True)

    def abort(self, messages):
        pass  # nothing was made visible before commit


class AuditSinkDataSource(DataSource):
    @classmethod
    def name(cls):
        return "audit_sink"

    def writer(self, schema, overwrite: bool):
        return AuditSinkWriter(self.options)


def register_audit_sink(spark) -> None:
    spark.dataSource.register(AuditSinkDataSource)


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        return json.load(f)
