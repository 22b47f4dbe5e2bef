"""Deterministic integer-scaled exp2 — the inverse of functions/intlog.

``intlog.log2_scaled`` produces scores in 2^20-scaled log2 units.  Turning
such a score back into a plain number (geometric mean, perplexity = 2^H,
Atkinson index = 1 - 2^(-MLD)) needs ``2^x`` for fractional x, which goes
through libm ``exp2`` — not guaranteed to round identically between the
JVM and DuckDB.  This module computes

    exp2_scaled(s)  ~  2^(s / 2^20)   (as an exact double)

entirely from integer operations plus one ``pow(2, <integer>)`` (exact in
both engines — power-of-two doubles are exactly representable, and the
repo already relies on integer-exponent ``pow(2, e)`` in intlog):

- shift s by 64*2^20 so truncating integer division is a floor,
- split into integer part k and 20 fractional bits f,
- look the top 8 bits of f up in a 256-entry literal table
  LUT[i] = floor(2^20 * 2^(i/256)) shared verbatim by both engines,
- return LUT[idx] * pow(2.0, k - 84)  — a small integer times a power of
  two, so the double result is bit-identical on both engines.

Accuracy: the fractional part is truncated to 8 bits, so the relative
error is < 2^(1/256) - 1 ~ 0.27% — fine for indices/perplexities, and
EXACTLY reproducible (the truncation is the spec, mirroring intlog).

Bounds: -64*2^20 <= s < 64*2^20 (i.e. |log2| < 64).

Reference tie-in: VecOp elementwise-transform semantics
(src/op.rs:18-35) as a deterministic scalar kernel.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

EXP2_SCALE = 1048576  # 2^20 fixed-point unit (matches intlog.LOG2_SCALE)

# LUT[i] = floor(2^20 * 2^(i/256)) for the truncated 8-bit fraction.
EXP2_LUT: list[int] = [
    int(math.floor(EXP2_SCALE * (2.0 ** (i / 256.0)))) for i in range(256)
]

_LUT_CSV = ", ".join(str(v) for v in EXP2_LUT)

_SHIFT = 64 * EXP2_SCALE  # makes the truncating div a floor for s >= -64*2^20


def _pieces(expr: str, intdiv: str) -> tuple[str, str]:
    sp = f"(CAST({expr} AS BIGINT) + {_SHIFT})"
    k = f"({sp} {intdiv} {EXP2_SCALE})"
    idx = f"(({sp} % {EXP2_SCALE}) {intdiv} 4096)"
    return k, idx


def exp2_scaled(expr: str) -> Column:
    """Spark Column: ~2^(expr / 2^20) as DOUBLE, for BIGINT expr in
    [-64*2^20, 64*2^20)."""
    k, idx = _pieces(expr, "div")
    return F.expr(
        f"CAST(element_at(array({_LUT_CSV}), CAST({idx} + 1 AS INT)) AS DOUBLE)"
        f" * pow(2.0, {k} - 84)"
    )


def exp2_scaled_sql(expr: str) -> str:
    """DuckDB SQL fragment: the identical computation over ``expr``."""
    k, idx = _pieces(expr, "//")
    return (
        f"(CAST(([{_LUT_CSV}])[{idx} + 1] AS DOUBLE)"
        f" * pow(2.0, {k} - 84))"
    )
