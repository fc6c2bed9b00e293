"""GROUPED_AGG pandas UDF kernels (robust per-group statistics).

NOTE: deliberately NO ``from __future__ import annotations`` here —
pandas_udf infers the UDF eval type (scalar vs grouped-agg) from the
REAL type hints (``pd.Series -> float``), and PEP-563 stringified
annotations break that inference (UNSUPPORTED_SIGNATURE).

Determinism contract: values are micro-quantized to int64 before any
accumulation — the sort is exact, the sum is an exact integer sum, and
only the final division is float (single IEEE op, identical on every
engine). The trim boundary is count-based (drop n//10 from each end).

Scale caveat (also in the catalog entry): GROUPED_AGG does NOT
partial-aggregate — each group's values are collected into one task's
Arrow batch. Right tool for bounded groups (series, entities, devices);
for power-law keys use the exact-SQL window spelling the oracle shows.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def trimmed_mean_micro(v: pd.Series) -> float:
    """10%-trimmed mean, micro-quantized exact arithmetic.

    astype(int64) truncates toward zero while the oracle floors; the
    two agree because inputs are non-negative (asserted) — for signed
    data, quantize with np.floor first."""
    assert (v >= 0).all(), "micro-quantization convention needs v >= 0"
    y = (v * 1_000_000 + 0.5).astype("int64").sort_values()
    k = len(y) // 10
    kept = y.iloc[k : len(y) - k]
    return float(int(kept.sum()) / len(kept) / 1_000_000.0)


@pandas_udf("long")
def trimmed_count(v: pd.Series) -> int:
    """Rows surviving the 10% trim on each side."""
    return len(v) - 2 * (len(v) // 10)
