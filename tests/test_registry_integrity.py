"""Registry-wide integrity: every registered query must build (analyze)
against the smoke fixture, carry an oracle, and expose stable columns.

Build-only (no execution): catches renamed columns, broken imports, and
schema drift in seconds; execution-level correctness is the oracle
battery (tools/check_oracles.py)."""

from __future__ import annotations


def test_every_query_builds_and_has_oracle(spark, sf_dir):
    from amorphous_mapreduce_spark.queries_registry import ORACLES, QUERIES

    assert len(QUERIES) >= 148
    missing_oracles = sorted(set(QUERIES) - set(ORACLES))
    assert missing_oracles == [], f"queries without oracles: {missing_oracles}"
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)  # analysis happens here; no execution
        assert len(df.columns) > 0, name
        # driver compare sorts columns by name: duplicates would collide
        assert len(set(df.columns)) == len(df.columns), (
            f"{name} has duplicate column names: {df.columns}"
        )
