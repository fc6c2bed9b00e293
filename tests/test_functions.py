"""Unit tests for the BigQuery-dialect shims — one per trap row in
SURVEY §2.8-2.10 (D2 ANSI-throw, D3 year semantics, G2 haversine)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from oroboro_dw_dbt_spark.functions import (
    age_from_mm_yyyy,
    bq_date_diff_year,
    coalesce_trim,
    format_date_mmdd,
    safe_parse_date,
    st_distance_meters,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_safe_parse_date_valid(spark):
    assert str(one(spark, safe_parse_date(F.lit("2020-02-29")))) == "2020-02-29"


def test_safe_parse_date_malformed_returns_null_not_error(spark):
    # ANSI mode is ON (Spark 4 default) — plain to_date would throw here.
    assert one(spark, safe_parse_date(F.lit("2021-02-30"))) is None
    assert one(spark, safe_parse_date(F.lit("garbage"))) is None
    assert one(spark, safe_parse_date(F.lit(None).cast("string"))) is None


def test_bq_date_diff_year_boundary_semantics(spark):
    # 2020-12-31 → 2021-01-01 crosses one boundary: BigQuery says 1,
    # elapsed-years semantics would say 0 (ref: user_base.sql:50-53).
    d = bq_date_diff_year(
        F.lit("2021-01-01").cast("date"), F.lit("2020-12-31").cast("date")
    )
    assert one(spark, d) == 1


def test_format_date_mmdd(spark):
    assert one(spark, format_date_mmdd(F.lit("2026-08-13").cast("date"))) == "0813"


def test_coalesce_trim(spark):
    assert one(spark, coalesce_trim(F.lit("  x "), F.lit("fb"))) == "x"
    assert one(spark, coalesce_trim(F.lit(None).cast("string"), F.lit("fb"))) == "fb"


def test_haversine_known_distance(spark):
    # JFK (40.6413, -73.7781) → LHR (51.4700, -0.4543) ≈ 5,540 km.
    d = st_distance_meters(
        F.lit(40.6413), F.lit(-73.7781), F.lit(51.4700), F.lit(-0.4543)
    )
    v = one(spark, d)
    assert v == pytest.approx(5_540_000, rel=0.01)


def test_haversine_zero(spark):
    assert one(spark, st_distance_meters(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0))) == 0.0


def test_age_from_mm_yyyy_adjustment(spark):
    today = F.lit("2026-08-13").cast("date")
    # birthday month already passed this year → no adjustment
    assert one(spark, age_from_mm_yyyy(F.lit("03/2000"), today)) == 26
    # birthday month not yet reached → −1
    assert one(spark, age_from_mm_yyyy(F.lit("11/2000"), today)) == 25
    # same month: MMDD compare is 0813 vs 1101 → reference counts full year
    assert one(spark, age_from_mm_yyyy(F.lit("08/2000"), today)) == 26
    # malformed → NULL end-to-end (SAFE.PARSE_DATE path)
    assert one(spark, age_from_mm_yyyy(F.lit("13/2000"), today)) is None
    assert one(spark, age_from_mm_yyyy(F.lit(None).cast("string"), today)) is None
