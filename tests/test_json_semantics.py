"""ev_json_typed's cross-engine validity contract on ADVERSARIAL input.

The sf fixtures contain only well-formed props, so the driver gate can
never exercise the malformed path — round 4's advice showed the old
definition (struct IS NOT NULL) was unfalsifiable there. This test runs
the Spark expression and the DuckDB oracle predicate over a hand-built
set of malformed / mis-typed / edge documents and asserts they agree
row-by-row on BOTH output columns.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.operators.events_suite import _json_typed_struct

DOCS = [
    '{"k": 3}',            # well-formed, typed
    '{"k": -2147483648}',  # int32 min boundary
    '{"k": null}',         # explicit null k: valid
    '{"j": 9}',            # k absent: valid
    "{}",                  # empty object: valid
    '{not json',           # syntax error
    '{"k": "abc"}',        # string where int declared
    '{"k": "12"}',         # numeric string: NO coercion either side
    "{'k': 5}",            # single quotes: spec-invalid
    "[1, 2]",              # valid JSON, not an object
    "null",                # valid JSON null document
    "17",                  # valid JSON scalar document
    "",                    # empty string
    None,                  # SQL NULL
    '{"k": 1.5}',          # float where int declared
    '{"k": 3000000000}',   # int32 overflow
    '{"k": {"a": 1}}',     # nested object where int declared
    '{"k": 3, "extra": "x"}',  # unknown field tolerated
]

ORACLE_PREDICATE = """
WITH j AS (
      SELECT i, props,
             CASE WHEN json_valid(props)
                  THEN json_type(CAST(props AS JSON)) = 'OBJECT'
                  ELSE false END AS is_obj,
             CASE WHEN json_valid(props)
                  THEN json_type(CAST(props AS JSON), '$.k') END AS kt,
             CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS ks
      FROM docs
    )
    SELECT i,
           CASE WHEN is_obj AND kt IN ('BIGINT', 'UBIGINT')
                THEN TRY_CAST(ks AS INT) END AS k,
           COALESCE(is_obj AND (kt IS NULL OR kt = 'NULL'
                    OR (kt IN ('BIGINT', 'UBIGINT')
                        AND TRY_CAST(ks AS INT) IS NOT NULL)), false) AS is_valid
    FROM j ORDER BY i
"""


@pytest.fixture(scope="module")
def spark_rows(spark):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(DOCS)], "i int, props string"
    )
    parsed = df.withColumn("p", _json_typed_struct(F.col("props")))
    out = parsed.select(
        "i",
        F.col("p.k").alias("k"),
        (F.col("p").isNotNull() & F.col("p._corrupt_record").isNull()).alias(
            "is_valid"
        ),
    )
    return {r["i"]: (r["k"], r["is_valid"]) for r in out.collect()}


def test_spark_and_oracle_agree_on_adversarial_docs(spark_rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (i INT, props VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [(i, d) for i, d in enumerate(DOCS)]
    )
    oracle = {i: (k, v) for i, k, v in con.execute(ORACLE_PREDICATE).fetchall()}
    diffs = {
        DOCS[i]: {"spark": spark_rows[i], "oracle": oracle[i]}
        for i in range(len(DOCS))
        if spark_rows[i] != oracle[i]
    }
    assert not diffs, f"engine disagreement: {diffs}"


def test_malformed_detected(spark_rows):
    """The round-4 unfalsifiability: '{not json' must now read invalid."""
    assert spark_rows[DOCS.index('{not json')] == (None, False)
    assert spark_rows[DOCS.index('{"k": "abc"}')] == (None, False)
    assert spark_rows[DOCS.index("[1, 2]")] == (None, False)


def test_valid_objects_pass(spark_rows):
    assert spark_rows[DOCS.index('{"k": 3}')] == (3, True)
    assert spark_rows[DOCS.index('{"j": 9}')] == (None, True)
    assert spark_rows[DOCS.index('{"k": null}')] == (None, True)
