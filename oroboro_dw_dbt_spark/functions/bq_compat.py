"""BigQuery-dialect compatibility shims as native Column expressions.

Every function here stays inside Catalyst/whole-stage-codegen — plain
Column expression trees, no Python UDFs — so they cost the same as
built-ins at any scale. Each encodes one dialect trap from SURVEY §2.8-2.10:

- ``safe_parse_date``    — BigQuery ``SAFE.PARSE_DATE`` returns NULL on
  malformed input; Spark 4 runs ANSI mode by default where ``to_date``
  THROWS. We use ``try_to_date`` (ref: models/marts/user_base.sql:52).
- ``bq_date_diff_year``  — BigQuery ``date_diff(a, b, year)`` counts
  *year boundaries* (= ``year(a) - year(b)``), not full elapsed years.
  Spark's ``date_diff(YEAR, ...)`` counts elapsed years → different
  answer whenever only the boundary was crossed
  (ref: models/marts/user_base.sql:50-53).
- ``format_date_mmdd``   — BigQuery ``format_date('%m%d', d)`` →
  ``date_format(d, 'MMdd')`` (ref: models/marts/user_base.sql:54).
- ``st_distance_meters`` — BigQuery ``st_distance(st_geogpoint(...))``
  geodesic meters → haversine on a WGS84 mean-radius sphere. Error vs
  BigQuery's S2 geodesic < 0.6% — callers near hard thresholds must
  treat the boundary as fuzzy (ref: models/intermediate/locations_clean.sql:48).
- ``st_distance_meters_geodesic`` — the higher-accuracy fallback for
  rows near such thresholds (e.g. the 10-mile cutoff in
  locations_clean.sql:63): Lambert's first-order flattening correction
  on the WGS84 ellipsoid, ~10 m accuracy vs the true geodesic (vs up
  to ~0.56% for the sphere), still a pure Column tree.
- ``coalesce_trim``      — the reference's single Jinja macro
  (ref: macros/utils.sql:1-3).
- ``age_from_mm_yyyy``   — the full age derivation from a ``'MM/YYYY'``
  birthday string (ref: models/marts/user_base.sql:48-54).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # IUGG mean Earth radius


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def safe_parse_date(c: Column | str, fmt: str = "yyyy-MM-dd") -> Column:
    """``SAFE.PARSE_DATE``: NULL (never error) on malformed input."""
    return F.try_to_date(_col(c), fmt)


def bq_date_diff_year(a: Column | str, b: Column | str) -> Column:
    """``date_diff(a, b, YEAR)`` with BigQuery boundary-count semantics."""
    return F.year(_col(a)) - F.year(_col(b))


def format_date_mmdd(c: Column | str) -> Column:
    """``format_date('%m%d', d)`` → 'MMdd' string (e.g. '0431')."""
    return F.date_format(_col(c), "MMdd")


def coalesce_trim(value: Column | str, fallback: Column | str) -> Column:
    """``coalesce(trim(value), fallback)`` (ref: macros/utils.sql:1-3)."""
    return F.coalesce(F.trim(_col(value)), _col(fallback))


def st_distance_meters(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Great-circle distance in meters (haversine, codegen-friendly).

    2·R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2)))
    """
    phi1, phi2 = F.radians(_col(lat1)), F.radians(_col(lat2))
    dphi = F.radians(_col(lat2) - _col(lat1))
    dlmb = F.radians(_col(lon2) - _col(lon1))
    a = (
        F.pow(F.sin(dphi / 2), 2)
        + F.cos(phi1) * F.cos(phi2) * F.pow(F.sin(dlmb / 2), 2)
    )
    return 2 * F.lit(EARTH_RADIUS_M) * F.asin(F.sqrt(a))


WGS84_A_M = 6378137.0  # semi-major axis
WGS84_F = 1.0 / 298.257223563  # flattening


def st_distance_meters_geodesic(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Ellipsoidal distance in meters — Lambert's formula (1942).

    Haversine on REDUCED latitudes β = atan((1−f)·tanφ) gives the
    central angle σ; the flattening correction is

        X = (σ − sinσ)·sin²P·cos²Q / cos²(σ/2)
        Y = (σ + sinσ)·cos²P·sin²Q / sin²(σ/2)
        d = a·(σ − f/2·(X + Y)),   P = (β₁+β₂)/2, Q = (β₂−β₁)/2

    Accuracy ~10 m over any distance (undefined exactly at antipodes,
    like every non-iterative formula). Use when a business rule sits on
    a hard distance threshold; elsewhere the cheaper haversine matches
    the reference within its documented 0.6%."""
    f = WGS84_F
    b1 = F.atan((1 - f) * F.tan(F.radians(_col(lat1))))
    b2 = F.atan((1 - f) * F.tan(F.radians(_col(lat2))))
    dlmb = F.radians(_col(lon2) - _col(lon1))
    h = F.pow(F.sin((b2 - b1) / 2), 2) + F.cos(b1) * F.cos(b2) * F.pow(F.sin(dlmb / 2), 2)
    sigma = 2 * F.asin(F.least(F.lit(1.0), F.sqrt(h)))
    p, q = (b1 + b2) / 2, (b2 - b1) / 2
    x = (sigma - F.sin(sigma)) * F.pow(F.sin(p), 2) * F.pow(F.cos(q), 2) / F.pow(F.cos(sigma / 2), 2)
    y = (sigma + F.sin(sigma)) * F.pow(F.cos(p), 2) * F.pow(F.sin(q), 2) / F.pow(F.sin(sigma / 2), 2)
    dist = F.lit(WGS84_A_M) * (sigma - (f / 2) * (x + y))
    return F.when(sigma == 0, F.lit(0.0)).otherwise(dist)


def age_from_mm_yyyy(birthday: Column | str, today: Column | None = None) -> Column:
    """Age in years from a ``'MM/YYYY'`` text birthday.

    Re-derives user_base.sql:48-54 exactly:
      1. birth_date = SAFE.PARSE_DATE('%Y-%m-%d', concat(substr(b,4,4),'-',substr(b,1,2),'-01'))
      2. raw_age    = date_diff(current_date, birth_date, year)   [boundary count]
      3. subtract 1 if format_date('%m%d', current_date) < format_date('%m%d', birth_date)

    ``today`` is injectable for deterministic tests (defaults to
    ``current_date()``).
    """
    b = _col(birthday)
    today = F.current_date() if today is None else today
    birth_date = safe_parse_date(
        F.concat(F.substring(b, 4, 4), F.lit("-"), F.substring(b, 1, 2), F.lit("-01"))
    )
    raw_age = bq_date_diff_year(today, birth_date)
    pre_birthday = format_date_mmdd(today) < format_date_mmdd(birth_date)
    return F.when(pre_birthday, raw_age - 1).otherwise(raw_age)
