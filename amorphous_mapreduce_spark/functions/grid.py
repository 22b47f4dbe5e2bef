"""2-D grid factorisation helper — the reference's `closest_factor`.

The reference factorises its reducer count into a near-square para_m x
para_n grid for output tiling (src/util.rs:21-61, used at
src/outer_product.rs:162-166). Spark's shuffle partitioning subsumes the
decision for SQL aggregates; this helper exists for explicit block-matrix
control (e.g. choosing a tile grid for gemm_block from a target
parallelism).
"""

from __future__ import annotations

import math


def closest_factor(value: int, factor: float) -> int:
    """The divisor of ``value`` nearest to ``factor``.

    Mirrors src/util.rs:21-61 (search down then up, pick the nearer);
    ties resolve downward, matching the reference's <= comparison.
    """
    if value <= 0:
        raise ValueError("value must be positive")
    lo = None
    for c in range(int(factor), 0, -1):
        if value % c == 0:
            lo = c
            break
    hi = None
    for c in range(max(1, int(math.ceil(factor))), value + 1):
        if value % c == 0:
            hi = c
            break
    if lo is None:
        return hi  # type: ignore[return-value]
    if hi is None:
        return lo
    return lo if (factor - lo) <= (hi - factor) else hi


def reducer_grid(n_reducers: int) -> tuple[int, int]:
    """Near-square (para_m, para_n) with para_m * para_n == n_reducers —
    the reference's output-tile grid (src/outer_product.rs:162-163)."""
    pm = closest_factor(n_reducers, math.sqrt(n_reducers))
    return pm, n_reducers // pm
