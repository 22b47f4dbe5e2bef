"""intexp primitive + the inequality / G2 / perplexity queries that ride it."""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF_SMOKE


def test_exp2_scaled_cross_engine_and_spec(spark):
    """Spark and DuckDB fragments agree bit-for-bit; result never exceeds
    the true 2^x and stays within the 8-bit-mantissa error bound."""
    from amorphous_mapreduce_spark.functions.intexp import (
        EXP2_SCALE,
        exp2_scaled,
        exp2_scaled_sql,
    )

    vals = [
        -64 * EXP2_SCALE,
        -13 * EXP2_SCALE - 54321,
        -1,
        0,
        1,
        99999,
        EXP2_SCALE,
        7 * EXP2_SCALE + 123456,
        63 * EXP2_SCALE + EXP2_SCALE - 1,
    ]
    sdf = spark.createDataFrame([(v,) for v in vals], "s long").select(
        "s", exp2_scaled("s").alias("y")
    )
    got = {r["s"]: r["y"] for r in sdf.collect()}
    con = duckdb.connect()
    for v in vals:
        duck = con.execute(f"SELECT {exp2_scaled_sql(str(v))}").fetchone()[0]
        assert got[v] == duck, (v, got[v], duck)
        want = 2.0 ** (v / EXP2_SCALE)
        assert got[v] <= want * (1 + 1e-12)
        assert got[v] >= want * (1 - 0.0028)


def test_exp2_scaled_monotone(spark):
    from amorphous_mapreduce_spark.functions.intexp import exp2_scaled

    vals = list(range(-3_000_000, 3_000_000, 123_457))
    rows = (
        spark.createDataFrame([(v,) for v in vals], "s long")
        .select("s", exp2_scaled("s").alias("y"))
        .orderBy("s")
        .collect()
    )
    ys = [r["y"] for r in rows]
    assert all(a <= b for a, b in zip(ys, ys[1:]))


def test_inequality_indices_bounds(spark):
    from amorphous_mapreduce_spark import queries_registry as qr

    rows = qr.QUERIES["inequality_indices"](spark, SF_SMOKE).collect()
    assert rows, "expected one row per segment"
    for r in rows:
        # entropy-family indices are nonnegative; Atkinson(1) in [0, 1)
        assert r["theil_t_bits"] >= 0.0
        assert r["mld_bits"] >= 0.0
        assert 0.0 <= r["atkinson_eps1"] < 1.0
        # AM-GM: geometric mean cannot exceed arithmetic mean (allow the
        # 0.27% truncation slack of the exp2 LUT)
        assert r["geomean_cents"] <= r["mean_cents"] * 1.003


def test_dunning_g2_descending_positive(spark):
    from amorphous_mapreduce_spark import queries_registry as qr
    from amorphous_mapreduce_spark.queries.mining_queries import G2_MIN_COUNT

    rows = qr.QUERIES["dunning_g2_collocations"](spark, SF_SMOKE).collect()
    assert rows
    scores = [r["g2_scaled"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["cnt"] >= G2_MIN_COUNT
        assert r["g2_scaled"] > 0
        assert r["g2_bits"] == pytest.approx(r["g2_scaled"] / 1048576.0)


def test_heldout_perplexity_sane(spark):
    from amorphous_mapreduce_spark import queries_registry as qr

    rows = qr.QUERIES["unigram_heldout_perplexity"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["oov_rate"] <= 1.0
        assert r["h_bits"] > 0.0
        # perplexity == 2^h_bits up to the LUT truncation spec
        assert r["perplexity"] == pytest.approx(
            math.pow(2.0, r["h_bits"]), rel=0.006
        )
        assert r["perplexity"] >= 1.0
