"""Catalog-wide checks: every query runs at sf0.001 and hash-matches its
DuckDB oracle (fast mirror of the driver's sf0.01 gate)."""

from __future__ import annotations

import hashlib
import math

import pytest

from oroboro_dw_dbt_spark.operators import QUERIES
from tests.conftest import SF_SMOKE


def _norm(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    sdf = spec.builder(spark, SF_SMOKE)
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert srows is not None  # rows-only check
        return
    cur = duck.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), "column sets differ"
    assert len(srows) == len(orows), "row counts differ"
    assert _hash(sdf.columns, srows) == _hash(ocols, orows), "value hash differs"
