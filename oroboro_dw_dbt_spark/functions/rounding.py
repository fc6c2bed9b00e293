"""HALF_UP rounding for numpy kernels — the cross-engine float contract.

Every catalog entry rounds non-integer outputs to 6 decimals so Spark
and DuckDB hash identically (catalog.py). JVM-side that is ``F.round``
(HALF_UP, away from zero); DuckDB's ``round`` matches. ``np.round`` does
NOT: it is round-half-to-even (banker's), so a dyadic midpoint like
0.0078125 rounds to 0.007812 under numpy but 0.007813 under both
engines — a verified divergence (round-4 advice) that also precedes
top-k pruning in the matmul kernels, where a flipped midpoint can flip
a rank. Any Arrow/numpy kernel that feeds a hash-checked result must use
this instead of ``np.round``.
"""

from __future__ import annotations


def np_round_half_up(x, decimals: int = 6):
    """Element-wise round-half-away-from-zero, matching Spark F.round /
    DuckDB round on doubles: sign-aware floor(|x|·10^d + 0.5)/10^d.

    At an exact dyadic midpoint (|x|·10^d representable as ?.5) this
    rounds away from zero — precisely where banker's rounding diverged.
    Off-midpoint values are untouched beyond the one scaling multiply,
    the same primitive DuckDB's multiply-based round performs.
    """
    import numpy as np

    scale = 10.0**decimals
    return np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x)
