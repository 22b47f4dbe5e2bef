"""Deterministic integer-scaled log2 — libm-free, identical on both engines.

Language-model scores (surprisal, cross-entropy, importance log-ratios)
need a logarithm, but ``ln``/``log2`` go through libm and the JVM and
DuckDB builds are not guaranteed to round identically (a 1-ulp drift
flips a floor). This module computes

    log2_scaled(c)  ~  2^20 * log2(c)  (truncated)    for integer c >= 1

entirely from integer operations: the exponent is the binary-string
length (the ``zipf_octave_profile`` trick, ``length(bin(c)) - 1``) and
the mantissa correction is a table lookup on the top 8 fractional bits —
a 256-entry literal array shared verbatim by the Spark expression and
the DuckDB oracle SQL, so both engines index the exact same integers.

Accuracy: the mantissa is truncated to 8 bits, so the absolute error is
< log2(1 + 1/256) ~ 0.0057 bits — irrelevant for ranking/filter scores,
and EXACTLY reproducible (the approximation itself is the spec).

Bounds: c must satisfy 1 <= c < 2^55 (c * 256 must fit int64).

Reference tie-in: VecOp elementwise-transform semantics
(src/op.rs:18-35) as a deterministic scalar kernel.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

LOG2_SCALE = 1048576  # 2^20 fixed-point unit

# LUT[i] = floor(2^20 * log2(1 + i/256)) for the truncated 8-bit mantissa.
LOG2_LUT: list[int] = [
    int(math.floor(LOG2_SCALE * math.log2(1.0 + i / 256.0))) for i in range(256)
]

_LUT_CSV = ", ".join(str(v) for v in LOG2_LUT)


def _pieces(expr: str, intdiv: str) -> tuple[str, str]:
    c = f"CAST({expr} AS BIGINT)"
    e = f"(length(bin({c})) - 1)"
    pow2e = f"CAST(pow(2, {e}) AS BIGINT)"
    idx = f"(({c} * 256) {intdiv} {pow2e} - 256)"
    return e, idx


def log2_scaled_expr(expr: str) -> str:
    """Spark SQL fragment (for embedding in a larger F.expr string)."""
    e, idx = _pieces(expr, "div")
    return (
        f"CAST(CAST({e} AS BIGINT) * {LOG2_SCALE}"
        f" + element_at(array({_LUT_CSV}), CAST({idx} + 1 AS INT)) AS BIGINT)"
    )


def log2_scaled(expr: str) -> Column:
    """Spark Column: ~2^20 * log2(expr) as BIGINT, for BIGINT expr >= 1."""
    return F.expr(log2_scaled_expr(expr))


def log2_scaled_sql(expr: str) -> str:
    """DuckDB SQL fragment: the identical computation over ``expr``."""
    e, idx = _pieces(expr, "//")
    return (
        f"(CAST({e} AS BIGINT) * {LOG2_SCALE}"
        f" + CAST(([{_LUT_CSV}])[{idx} + 1] AS BIGINT))"
    )
