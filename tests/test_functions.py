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
    st_distance_meters_geodesic,
)


def _vincenty_m(lat1, lon1, lat2, lon2):
    """Iterative Vincenty inverse on WGS84 — the accuracy reference
    (sub-mm) that the closed-form Lambert column must stay within 50 m of."""
    a, f = 6378137.0, 1 / 298.257223563
    b = (1 - f) * a
    L = math.radians(lon2 - lon1)
    U1 = math.atan((1 - f) * math.tan(math.radians(lat1)))
    U2 = math.atan((1 - f) * math.tan(math.radians(lat2)))
    sinU1, cosU1, sinU2, cosU2 = math.sin(U1), math.cos(U1), math.sin(U2), math.cos(U2)
    lam = L
    for _ in range(200):
        sinl, cosl = math.sin(lam), math.cos(lam)
        sin_sigma = math.hypot(cosU2 * sinl, cosU1 * sinU2 - sinU1 * cosU2 * cosl)
        if sin_sigma == 0:
            return 0.0
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cosl
        sigma = math.atan2(sin_sigma, cos_sigma)
        sin_alpha = cosU1 * cosU2 * sinl / sin_sigma
        cos2_alpha = 1 - sin_alpha**2
        cos2sm = cos_sigma - 2 * sinU1 * sinU2 / cos2_alpha if cos2_alpha else 0.0
        C = f / 16 * cos2_alpha * (4 + f * (4 - 3 * cos2_alpha))
        lam_prev = lam
        lam = L + (1 - C) * f * sin_alpha * (
            sigma + C * sin_sigma * (cos2sm + C * cos_sigma * (-1 + 2 * cos2sm**2))
        )
        if abs(lam - lam_prev) < 1e-12:
            break
    u2 = cos2_alpha * (a**2 - b**2) / b**2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    B = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    d_sigma = B * sin_sigma * (
        cos2sm
        + B / 4 * (
            cos_sigma * (-1 + 2 * cos2sm**2)
            - B / 6 * cos2sm * (-3 + 4 * sin_sigma**2) * (-3 + 4 * cos2sm**2)
        )
    )
    return b * A * (sigma - d_sigma)


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


def test_geodesic_matches_vincenty_within_50m(spark):
    # City pairs spanning short hops, transcontinental, transequatorial,
    # and near-antipodal legs; haversine is off by up to ~34 km on these,
    # Lambert must stay within its documented ~10 m (50 m asserted).
    pairs = [
        (48.8566, 2.3522, 51.5074, -0.1278),      # Paris–London
        (40.7128, -74.0060, 34.0522, -118.2437),  # NYC–LA
        (-33.8688, 151.2093, 35.6762, 139.6503),  # Sydney–Tokyo
        (59.33, 18.07, -34.61, -58.38),           # Stockholm–Buenos Aires
        (1.29, 103.85, 1.30, 103.86),             # ~1.5 km hop
        (45.0, 0.0, -45.0, 179.0),                # near-antipodal
        (0.0, 0.0, 0.0, 1.0),                     # equatorial degree
    ]
    df = spark.createDataFrame(pairs, "lat1 double, lon1 double, lat2 double, lon2 double")
    rows = df.select(
        "*",
        st_distance_meters_geodesic("lat1", "lon1", "lat2", "lon2").alias("g"),
        st_distance_meters("lat1", "lon1", "lat2", "lon2").alias("h"),
    ).collect()
    for r in rows:
        v = _vincenty_m(r.lat1, r.lon1, r.lat2, r.lon2)
        assert abs(r.g - v) < 50.0, (r.lat1, r.lon1, r.lat2, r.lon2, r.g, v)
        # and it must dominate the sphere everywhere it matters
        assert abs(r.g - v) <= abs(r.h - v) + 1e-6


def test_geodesic_zero_and_null(spark):
    assert one(
        spark,
        st_distance_meters_geodesic(F.lit(10.0), F.lit(20.0), F.lit(10.0), F.lit(20.0)),
    ) == 0.0
    assert one(
        spark,
        st_distance_meters_geodesic(
            F.lit(None).cast("double"), F.lit(20.0), F.lit(10.0), F.lit(20.0)
        ),
    ) is None


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
