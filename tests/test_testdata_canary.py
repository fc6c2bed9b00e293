"""Testdata physical-schema canary.

The harness regenerates /root/testdata between rounds, and the parquet
PHYSICAL types have drifted before: in round 4, events.ts changed from
TIMESTAMP(NANOS, tz=UTC) to naive microseconds, which Spark 4 reads as
TIMESTAMP_NTZ — silently breaking timestamp arithmetic in ~40 entries
until `_normalize_ntz` (sources/testdata.py) absorbed it. That failure
surfaced as a wall of hash mismatches with no hint of the cause.

This test pins the Arrow physical type of every column of every fixture
table and, on mismatch, prints the exact per-column diff — turning the
next drift into a one-line diagnosis. If it fires after a regeneration:
1. read the printed diff;
2. decide whether sources/testdata.py needs a new normalization (the
   _normalize_ntz pattern) or the pin below just needs updating;
3. re-run the full mirror (tools/check_correctness.py) before trusting
   any other red test.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

# pinned 2026-08-14 (round 5); matches sf0.001 / sf0.01 / sf0.1
EXPECTED = {
    "customer": {
        "c_custkey": "int64", "c_name": "string", "c_nationkey": "int32",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "documents": {
        "doc_id": "int64", "text": "string", "lang": "string",
        "source": "string", "n_chars": "int64",
    },
    "embeddings": {
        "vec_id": "int64", "embedding": "list<element: float>", "label": "int32",
    },
    "events": {
        "event_id": "int64", "ts": "timestamp[us]", "user_id": "int64",
        "event_type": "string", "value": "double", "props": "string",
    },
    "lineitem": {
        "l_orderkey": "int64", "l_partkey": "int64", "l_suppkey": "int64",
        "l_linenumber": "int32", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": "timestamp[us]",
    },
    "nation": {
        "n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32",
    },
    "orders": {
        "o_orderkey": "int64", "o_custkey": "int64", "o_orderstatus": "string",
        "o_totalprice": "double", "o_orderdate": "timestamp[us]",
        "o_orderpriority": "string",
    },
    "part": {
        "p_partkey": "int64", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int32", "p_retailprice": "double",
    },
    "region": {"r_regionkey": "int32", "r_name": "string"},
    "supplier": {
        "s_suppkey": "int64", "s_name": "string", "s_nationkey": "int32",
        "s_acctbal": "double",
    },
}

SF_DIRS = [d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
           if os.path.isdir(d)]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_physical_types_unchanged(sf_dir):
    diffs: list[str] = []
    for table, want in EXPECTED.items():
        path = f"{sf_dir}/{table}.parquet"
        if not os.path.exists(path):
            diffs.append(f"{table}: file missing at {path}")
            continue
        schema = pq.read_schema(path)
        got = {n: str(schema.field(n).type) for n in schema.names}
        for col in want.keys() | got.keys():
            w, g = want.get(col), got.get(col)
            if w != g:
                diffs.append(f"{table}.{col}: pinned {w!r} -> now {g!r}")
    assert not diffs, (
        "TESTDATA PHYSICAL SCHEMA DRIFTED (regenerated between rounds?):\n  "
        + "\n  ".join(diffs)
        + "\nSee tests/test_testdata_canary.py docstring for the recovery steps."
    )
