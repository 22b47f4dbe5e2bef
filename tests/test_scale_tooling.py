"""Unit tests for the round-5 scale tooling: adaptive LSH band width and
the sf1 fixture generator's distribution contract."""

from __future__ import annotations

import os

import numpy as np
import pytest

from amorphous_mapreduce_spark.operators.similarity import adaptive_band_bits

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(REPO, "fixtures", "sf1")


def test_adaptive_band_bits_clamps_and_grows():
    # small corpora keep the legacy 4-bit setting (bit-identical results)
    assert adaptive_band_bits(500) == 4
    assert adaptive_band_bits(2_000) == 4
    # each 64x growth past 2^10 buys ~log2 more bits
    assert adaptive_band_bits(20_000) == 8
    assert adaptive_band_bits(200_000) == 11
    # clamped: never wider than 16 bits
    assert adaptive_band_bits(10**12) == 16


def test_adaptive_band_bits_bounds_expected_occupancy():
    # design invariant: expected bucket occupancy n / 2^bits stays within
    # [64, 128) between the clamp floor (2^10) and ceiling (2^23); past
    # the 16-bit ceiling occupancy grows linearly again (raise max_bits
    # or add more planes for corpora beyond ~8M vectors per index shard)
    for n in (10_000, 50_000, 1_000_000, 2**23 - 1):
        bits = adaptive_band_bits(n)
        assert 64 <= n / (1 << bits) < 128
    assert adaptive_band_bits(10_000_000) == 16  # clamped


def test_adaptive_band_bits_matches_duckdb_formula():
    # Spark/Python: bit_length; oracle: length(bin(n)) - 1 — same floor log2
    import duckdb

    con = duckdb.connect()
    for n in (500, 2_000, 20_000, 54_321, 200_000):
        (got,) = con.execute(
            f"SELECT LEAST(16, GREATEST(4, length(bin({n})) - 7))"
        ).fetchone()
        assert got == adaptive_band_bits(n)


@pytest.mark.skipif(not os.path.isdir(SF1), reason="fixtures/sf1 not generated")
def test_sf1_fixture_schema_parity():
    import pyarrow.parquet as pq

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        ref = pq.read_schema(f"/root/testdata/sf0.1/{t}.parquet")
        got = pq.read_schema(os.path.join(SF1, f"{t}.parquet"))
        assert ref.names == got.names, t
        for name in ref.names:
            assert ref.field(name).type == got.field(name).type, (t, name)


@pytest.mark.skipif(not os.path.isdir(SF1), reason="fixtures/sf1 not generated")
def test_sf1_fixture_distribution_contract():
    """The properties queries rely on (FIXTURES.md + make_fixtures
    docstring): 10x row counts, source rule, near-dup construction."""
    import duckdb

    con = duckdb.connect()
    doc = os.path.join(SF1, "documents.parquet")
    n = con.execute(f"SELECT COUNT(*) FROM '{doc}'").fetchone()[0]
    assert n == 50_000
    # exact driver rule: source = src{doc_id % 20}
    bad = con.execute(
        f"SELECT COUNT(*) FROM '{doc}' "
        "WHERE source <> 'src' || CAST(doc_id % 20 AS VARCHAR)"
    ).fetchone()[0]
    assert bad == 0
    # near-dup construction: copies end with ' dup'
    pref = con.execute(
        f"SELECT COUNT(*) FROM (SELECT substr(text, 1, 40) p, COUNT(*) c "
        f"FROM '{doc}' GROUP BY 1 HAVING c > 1)"
    ).fetchone()[0]
    assert pref > 500  # ~4.7% near-dup rate at 50k docs
    emb = os.path.join(SF1, "embeddings.parquet")
    lo, hi = con.execute(
        "SELECT min(s), max(s) FROM (SELECT sqrt(list_sum(list_transform("
        f"embedding, x -> CAST(x AS DOUBLE) * x))) s FROM '{emb}')"
    ).fetchone()
    assert abs(lo - 1.0) < 1e-5 and abs(hi - 1.0) < 1e-5


def test_make_fixtures_deterministic(tmp_path):
    """Re-running the generator at a tiny scale is byte-reproducible."""
    import subprocess
    import sys

    out1, out2 = tmp_path / "a", tmp_path / "b"
    for out in (out1, out2):
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "tools", "make_fixtures.py"),
                "0.01",
                str(out),
            ],
            check=True,
            capture_output=True,
        )
    for t in ("customer", "documents", "embeddings", "events"):
        a = (out1 / f"{t}.parquet").read_bytes()
        b = (out2 / f"{t}.parquet").read_bytes()
        assert a == b, t
