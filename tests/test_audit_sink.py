"""Custom DataSourceWriter (sources/audit_sink.py): commit protocol,
order-invariant digests, and failure atomicity."""

from __future__ import annotations

import os
import tempfile

import pytest

from amorphous_mapreduce_spark.sources.audit_sink import (
    read_manifest,
    register_audit_sink,
)


def _write(df, path):
    df.write.format("audit_sink").option("path", path).mode("append").save()


def test_manifest_counts_and_partitions(spark):
    register_audit_sink(spark)
    df = spark.range(1000).repartition(7)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out")
        _write(df, path)
        m = read_manifest(path)
        assert m["total_rows"] == 1000
        assert m["n_partitions"] == 7
        assert sum(p["rows"] for p in m["partitions"]) == 1000


def test_digest_invariant_to_partitioning(spark):
    register_audit_sink(spark)
    df = spark.range(500).selectExpr("id", "id * 3 AS v")
    with tempfile.TemporaryDirectory() as d:
        p1, p2 = os.path.join(d, "a"), os.path.join(d, "b")
        _write(df.repartition(3), p1)
        _write(df.repartition(11, "v"), p2)
        m1, m2 = read_manifest(p1), read_manifest(p2)
        assert m1["digest"] == m2["digest"]
        assert m1["total_rows"] == m2["total_rows"] == 500


def test_digest_sensitive_to_values(spark):
    register_audit_sink(spark)
    with tempfile.TemporaryDirectory() as d:
        p1, p2 = os.path.join(d, "a"), os.path.join(d, "b")
        _write(spark.range(100), p1)
        _write(spark.range(100).selectExpr("id + 1 AS id"), p2)
        assert read_manifest(p1)["digest"] != read_manifest(p2)["digest"]


def test_failed_job_leaves_no_manifest(spark):
    register_audit_sink(spark)
    df = spark.range(100).selectExpr(
        "CASE WHEN id = 50 THEN raise_error('boom') ELSE CAST(id AS STRING) END AS x"
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "out")
        with pytest.raises(Exception):
            _write(df, path)
        assert not os.path.exists(os.path.join(path, "_MANIFEST.json"))
