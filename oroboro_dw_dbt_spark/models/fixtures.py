"""Deterministic fixture tables for the reference's 14 raw sources.

The reference models run over Django-style raw tables (user_user,
educator_classroom, location_location, ... — ref: models/sources.yml:3-20;
column schemas in FIXTURES.md). The driver's correctness gate only knows
the TPC-H-ish testdata tables, so each raw source is DERIVED from them
with pure deterministic SQL — the same text runs unchanged on Spark SQL
(over temp views of the parquet tables) and on DuckDB (as a CTE prefix
in the oracle query). One source of truth, zero drift.

The derivations encode the edge cases FIXTURES.md calls for: mixed-case /
padded emails (computed-key join J7), the literal 'educatorst1@example.com',
'test' names (is_test_user), NULL + malformed 'MM/YYYY' birthdays
(SAFE.PARSE_DATE null path), multi-select race/gender strings, NULL and
dangling location FKs, duplicate invite-code rows (fan-out collapsed by
the GROUP BY dedup), venues with 2 type rows (assembly re-fan-out), ≥2
distinct city components (the `multiple` CTE), a >10-mile nearest city
(city_replace heuristics incl. street / plus-code / 'county' / ave
patterns), a country whose long_name equals a state display_name (the
state-nulling branch), and 'Seoul' venues (special case; its exact CASE
branch needs s ≡ 108 mod 210, first exercised at sf0.1).

Deviation (documented): FIXTURES.md suggests a user with TWO widget API
keys; that fan-out would break the reference's own uniqueness test on
(user_id, partner_id, site_id) (marts_schema.yml:13-15 — see SURVEY §5),
so keys are unique per user here and the J1 fan-out hazard is covered by
the `j1_left_fanout` catalog query instead.

Dialect subset used (verified identical on Spark 4.1.2 + DuckDB 1.0):
CAST(x AS STRING), ||, lpad, md5, try_cast, %, CASE, comparison on
numerics/strings, UNION ALL, SELECT DISTINCT.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from oroboro_dw_dbt_spark.sources.testdata import load_table

# --- users (from customer; id = c_custkey) -------------------------------
_USER_USER = """
SELECT
  c_custkey AS id,
  md5(CAST(c_custkey AS STRING)) AS uuid,
  CASE WHEN c_custkey % 29 = 0 THEN 'Test'
       WHEN c_custkey % 31 = 0 THEN ' tEsTer '
       ELSE 'User' || CAST(c_custkey AS STRING) END AS first_name,
  CASE WHEN c_custkey % 43 = 0 THEN 'La Test'
       ELSE 'Cust' || CAST(c_custkey AS STRING) END AS last_name,
  CASE WHEN c_custkey = 1 THEN 'educatorst1@example.com'
       WHEN c_custkey % 7 = 0 THEN 'USER' || CAST(c_custkey AS STRING) || '@Example.com'
       WHEN c_custkey % 11 = 0 THEN '  user' || CAST(c_custkey AS STRING) || '@example.com '
       ELSE 'user' || CAST(c_custkey AS STRING) || '@example.com' END AS email,
  CASE WHEN c_custkey % 41 = 0 THEN NULL
       WHEN c_custkey % 4 = 0 THEN 'E'
       WHEN c_custkey % 4 = 1 THEN 'CL'
       WHEN c_custkey % 4 = 2 THEN 'CL'
       ELSE 'IL' END AS type,
  CASE WHEN c_custkey % 17 = 0 THEN NULL
       WHEN c_custkey % 10 = 0 THEN 'White'
       WHEN c_custkey % 10 = 1 THEN 'Hispanic or Latinx'
       WHEN c_custkey % 10 = 2 THEN 'Black or African American'
       WHEN c_custkey % 10 = 3 THEN 'South Asian'
       WHEN c_custkey % 10 = 4 THEN 'East Asian'
       WHEN c_custkey % 10 = 5 THEN 'Native Hawaiian or other Pacific Islander'
       WHEN c_custkey % 10 = 6 THEN 'Native American or Alaska Native'
       WHEN c_custkey % 10 = 7 THEN 'Other'
       WHEN c_custkey % 10 = 8 THEN 'Prefer not to say'
       ELSE 'White,Black or African American' END AS race_ethnicity,
  CASE WHEN c_custkey % 19 = 0 THEN NULL
       WHEN c_custkey % 6 = 0 THEN 'Man'
       WHEN c_custkey % 6 = 1 THEN 'Woman'
       WHEN c_custkey % 6 = 2 THEN 'Non-binary'
       WHEN c_custkey % 6 = 3 THEN 'Prefer not to say'
       WHEN c_custkey % 6 = 4 THEN 'Man,Woman'
       ELSE 'Prefer to self-describe' END AS gender,
  CASE WHEN c_custkey % 23 = 0 THEN 'self-described' ELSE NULL END AS self_describe_gender,
  try_cast(CAST(1995 + c_custkey % 30 AS STRING) || '-'
           || lpad(CAST(1 + c_custkey % 12 AS STRING), 2, '0')
           || '-01 00:00:00' AS TIMESTAMP) AS date_joined,
  c_acctbal > 0 AS is_active,
  c_custkey % 97 = 0 AS is_staff,
  CASE WHEN c_custkey % 13 = 0 THEN 'unknown'
       WHEN c_custkey % 19 = 0 THEN NULL
       ELSE lpad(CAST(1 + c_custkey % 12 AS STRING), 2, '0')
            || '/' || CAST(1950 + c_custkey % 55 AS STRING) END AS birthday,
  CASE WHEN c_custkey % 5 = 0 THEN NULL
       WHEN c_custkey % 37 = 0 THEN 999999
       ELSE 1 + c_custkey % 40 END AS location_id
FROM customer
"""

# --- widget API keys (unique per user — see module docstring) ------------
_WIDGET = """
SELECT c_custkey * 10 AS id, c_custkey AS user_id
FROM customer WHERE c_custkey % 50 = 0
"""

# --- partner / site hierarchy (from nation) ------------------------------
_USER_PARTNER = """
SELECT n_nationkey + 1 AS id, n_name AS name FROM nation
"""

# even site per partner (classroom-attached) + odd site (partner-code-attached):
# keeps route-1/2/3 sites and route-4 sites disjoint so the mart's
# (user_id, partner_id, site_id) uniqueness invariant stays satisfiable.
_USER_SITE = """
SELECT (n_nationkey + 1) * 2 AS id,
       'Site ' || CAST((n_nationkey + 1) * 2 AS STRING) AS name,
       n_nationkey + 1 AS partner_id
FROM nation
UNION ALL
SELECT (n_nationkey + 1) * 2 + 1 AS id,
       'Site ' || CAST((n_nationkey + 1) * 2 + 1 AS STRING) AS name,
       n_nationkey + 1 AS partner_id
FROM nation
"""

_CLASSROOM = """
SELECT p_partkey AS id,
       'Class ' || CAST(p_partkey AS STRING) AS name,
       CASE WHEN p_partkey % 17 = 0 THEN NULL
            ELSE (1 + p_partkey % 25) * 2 END AS site_id
FROM part WHERE p_partkey <= 240
"""

# route 1: one classroom per CL learner (id % 4 = 1)
_MEMBERSHIP = """
SELECT c_custkey AS user_id, 1 + c_custkey % 240 AS classroom_id
FROM customer WHERE c_custkey % 4 = 1 AND c_custkey % 41 != 0
"""

# route 2: one classroom per educator (id % 4 = 0)
_EDUCATORS = """
SELECT c_custkey AS user_id, 1 + c_custkey % 240 AS classroom_id
FROM customer WHERE c_custkey % 4 = 0 AND c_custkey % 41 != 0
"""

# route 3: invitations — matched CL users (case-noised email), ghost
# emails (no user), and IL-targeted emails (dropped by the type filter)
_INVITATION = """
SELECT 'uSER' || CAST(c_custkey AS STRING) || '@EXAMPLE.COM  ' AS email,
       1 + c_custkey % 240 AS classroom_id
FROM customer WHERE c_custkey % 8 = 2
UNION ALL
SELECT 'ghost' || CAST(c_custkey AS STRING) || '@nowhere.com' AS email,
       1 + c_custkey % 240 AS classroom_id
FROM customer WHERE c_custkey % 16 = 6
UNION ALL
SELECT 'user' || CAST(c_custkey AS STRING) || '@example.com' AS email,
       1 + c_custkey % 240 AS classroom_id
FROM customer WHERE c_custkey % 8 = 7
"""

# duplicate code ROWS (same value) for id % 4 = 0: the fan-out the
# reference's GROUP BY 1..9 dedup collapses (stacked_users_partners.sql:98)
_CLASSROOM_CODE = """
SELECT 'CC' || CAST(p_partkey AS STRING) AS code, p_partkey AS classroom_id
FROM part WHERE p_partkey <= 240
UNION ALL
SELECT 'CC' || CAST(p_partkey AS STRING) AS code, p_partkey AS classroom_id
FROM part WHERE p_partkey <= 240 AND p_partkey % 4 = 0
"""

# partner codes on ODD sites (or NULL); duplicated rows for id % 5 = 0
_PARTNER_CODE = """
SELECT n_nationkey + 1 AS id,
       'PC' || CAST(n_nationkey + 1 AS STRING) AS code,
       n_nationkey + 1 AS partner_id,
       CASE WHEN (n_nationkey + 1) % 3 = 0 THEN NULL
            ELSE (n_nationkey + 1) * 2 + 1 END AS site_id
FROM nation
UNION ALL
SELECT n_nationkey + 1 AS id,
       'PC' || CAST(n_nationkey + 1 AS STRING) AS code,
       n_nationkey + 1 AS partner_id,
       CASE WHEN (n_nationkey + 1) % 3 = 0 THEN NULL
            ELSE (n_nationkey + 1) * 2 + 1 END AS site_id
FROM nation WHERE (n_nationkey + 1) % 5 = 0
"""

# route 4: join actions for CL users (id % 4 = 2, every 3rd), non-'userjoins'
# rows (filtered), and IL-user actions (dropped by the type filter)
_JOIN_ACTION = """
SELECT c_custkey AS user_id,
       1 + c_custkey % 25 AS partner_invite_code_id,
       CASE WHEN c_custkey % 9 = 0 THEN 'other' ELSE 'userjoins' END AS action_type
FROM customer WHERE c_custkey % 4 = 2 AND c_custkey % 3 = 0
UNION ALL
SELECT c_custkey AS user_id,
       1 + c_custkey % 25 AS partner_invite_code_id,
       'userjoins' AS action_type
FROM customer WHERE c_custkey % 4 = 3 AND c_custkey % 5 = 0
"""

# --- location graph (venues from supplier; component bands 1e5..4e5) -----
# venue s: display_name by s % 9 exercises every city_replace heuristic
# branch (street number, plus-code, 'county', \bave\b, keep-as-is), plus
# 'Seoul' for s % 30 = 18; lat/lon NULL for s % 13 = 0 (rows dropped at
# the scoring filter). City components sit ~3 mi away (j=0) and ~100 mi
# (j=1) — except s % 10 = 7 venues whose NEAREST city is ~35 mi (> the
# 10-mile threshold, safely outside the ±1% haversine-vs-S2 band).
#
# Determinism contract (r3, kills the driver-gate unrounded-float class):
# every fractional constant is a dyadic rational (0.75 = 3/4, 1.25 = 5/4,
# 0.03125 = 2^-5, 0.5, 1.5, 2.0, 2.5, 3.0, 8.0, 12.0), so the arithmetic
# is EXACT in IEEE-754 double — no engine-dependent decimal-literal
# precision/scale inference, no rounding residue — and every lat/lon is
# explicitly CAST(... AS DOUBLE) so Spark and DuckDB both hand back the
# same Python float (never decimal.Decimal with engine-version-dependent
# scale) with bit-identical value and repr.
_LOCATION = """
SELECT s_suppkey AS id,
       CASE WHEN s_suppkey % 30 = 18 THEN 'Seoul'
            WHEN s_suppkey % 9 = 0 THEN 'Springfield'
            WHEN s_suppkey % 9 = 1 THEN 'Riverton Heights'
            WHEN s_suppkey % 9 = 2 THEN 'Lakeside Ave'
            WHEN s_suppkey % 9 = 3 THEN 'Brookfield'
            WHEN s_suppkey % 9 = 4 THEN 'Maple Grove'
            WHEN s_suppkey % 9 = 5 THEN 'Harborview'
            WHEN s_suppkey % 9 = 6 THEN '123 Main St'
            WHEN s_suppkey % 9 = 7 THEN '87g8+2x plaza'
            ELSE 'Clark County' END AS display_name,
       CASE WHEN s_suppkey % 30 = 18 THEN 'Seoul Proper'
            ELSE 'Venue ' || CAST(s_suppkey AS STRING) END AS long_name,
       CAST(CASE WHEN s_suppkey % 13 = 0 THEN NULL
            ELSE (s_suppkey % 120) * 0.75 - 40 END AS DOUBLE) AS latitude,
       CAST(CASE WHEN s_suppkey % 13 = 0 THEN NULL
            ELSE (s_suppkey % 250) * 1.25 - 120 END AS DOUBLE) AS longitude,
       'loc-' || CAST(s_suppkey AS STRING) AS slug
FROM supplier
UNION ALL
SELECT 100000 + s_suppkey * 4 AS id,
       'CityA-' || CAST(s_suppkey % 20 AS STRING) AS display_name,
       'CityA-' || CAST(s_suppkey % 20 AS STRING) || ' City' AS long_name,
       CAST(CASE WHEN s_suppkey % 13 = 0 THEN NULL
            ELSE (s_suppkey % 120) * 0.75 - 40
                 + CASE WHEN s_suppkey % 10 = 7 THEN 0.5 ELSE 0.03125 END END AS DOUBLE) AS latitude,
       CAST(CASE WHEN s_suppkey % 13 = 0 THEN NULL
            ELSE (s_suppkey % 250) * 1.25 - 120 + 0.03125 END AS DOUBLE) AS longitude,
       'city-a-' || CAST(s_suppkey AS STRING) AS slug
FROM supplier WHERE s_suppkey % 7 != 3
UNION ALL
SELECT 100000 + s_suppkey * 4 + 1 AS id,
       'CityB-' || CAST(s_suppkey % 20 AS STRING) AS display_name,
       'CityB-' || CAST(s_suppkey % 20 AS STRING) || ' City' AS long_name,
       CAST(CASE WHEN s_suppkey % 13 = 0 THEN NULL
            ELSE (s_suppkey % 120) * 0.75 - 40 + 1.5 END AS DOUBLE) AS latitude,
       CAST(CASE WHEN s_suppkey % 13 = 0 THEN NULL
            ELSE (s_suppkey % 250) * 1.25 - 120 + 1.5 END AS DOUBLE) AS longitude,
       'city-b-' || CAST(s_suppkey AS STRING) AS slug
FROM supplier WHERE s_suppkey % 3 != 0 AND s_suppkey % 7 != 3
UNION ALL
SELECT DISTINCT 200000 + s_suppkey % 15 AS id,
       'State' || CAST(s_suppkey % 15 AS STRING) AS display_name,
       'State' || CAST(s_suppkey % 15 AS STRING) || ' Province' AS long_name,
       CAST((s_suppkey % 15) * 2.0 - 10 AS DOUBLE) AS latitude,
       CAST((s_suppkey % 15) * 3.0 - 50 AS DOUBLE) AS longitude,
       'state-' || CAST(s_suppkey % 15 AS STRING) AS slug
FROM supplier
UNION ALL
SELECT DISTINCT 300000 + s_suppkey % 25 AS id,
       'County' || CAST(s_suppkey % 25 AS STRING) AS display_name,
       'County' || CAST(s_suppkey % 25 AS STRING) || ' County' AS long_name,
       CAST((s_suppkey % 25) * 1.5 - 15 AS DOUBLE) AS latitude,
       CAST((s_suppkey % 25) * 2.5 - 60 AS DOUBLE) AS longitude,
       'county-' || CAST(s_suppkey % 25 AS STRING) AS slug
FROM supplier
UNION ALL
SELECT DISTINCT 400000 + s_suppkey % 6 AS id,
       'Country' || CAST(s_suppkey % 6 AS STRING) AS display_name,
       CASE WHEN s_suppkey % 6 = 0 THEN 'State3'
            ELSE 'Country' || CAST(s_suppkey % 6 AS STRING) || ' Republic' END AS long_name,
       CAST((s_suppkey % 6) * 8.0 - 20 AS DOUBLE) AS latitude,
       CAST((s_suppkey % 6) * 12.0 - 30 AS DOUBLE) AS longitude,
       'country-' || CAST(s_suppkey % 6 AS STRING) AS slug
FROM supplier
"""

_ADDRESS_COMPONENTS = """
SELECT s_suppkey AS from_location_id, 100000 + s_suppkey * 4 AS to_location_id
FROM supplier WHERE s_suppkey % 7 != 3
UNION ALL
SELECT s_suppkey AS from_location_id, 100000 + s_suppkey * 4 + 1 AS to_location_id
FROM supplier WHERE s_suppkey % 3 != 0 AND s_suppkey % 7 != 3
UNION ALL
SELECT s_suppkey AS from_location_id, 200000 + s_suppkey % 15 AS to_location_id
FROM supplier WHERE s_suppkey % 6 != 1
UNION ALL
SELECT s_suppkey AS from_location_id, 300000 + s_suppkey % 25 AS to_location_id
FROM supplier WHERE s_suppkey % 6 != 2
UNION ALL
SELECT s_suppkey AS from_location_id, 400000 + s_suppkey % 6 AS to_location_id
FROM supplier
"""

# venue type by s % 5 (3/4 = city-ish, 1 = country, 2 = out-of-set, filtered);
# s % 24 = 9 venues get a SECOND type row (the J11 re-fan-out, deduped by
# the score ranking — the type-1 row nulls city+state so scores never tie)
_LOCATION_TYPES = """
SELECT s_suppkey AS location_id,
       CASE WHEN s_suppkey % 5 = 0 THEN 3
            WHEN s_suppkey % 5 = 1 THEN 4
            WHEN s_suppkey % 5 = 2 THEN 1
            WHEN s_suppkey % 5 = 3 THEN 2
            ELSE 4 END AS locationtype_id
FROM supplier
UNION ALL
SELECT s_suppkey AS location_id, 1 AS locationtype_id
FROM supplier WHERE s_suppkey % 24 = 9
UNION ALL
SELECT 100000 + s_suppkey * 4 AS location_id, 3 AS locationtype_id
FROM supplier WHERE s_suppkey % 7 != 3
UNION ALL
SELECT 100000 + s_suppkey * 4 + 1 AS location_id, 4 AS locationtype_id
FROM supplier WHERE s_suppkey % 3 != 0 AND s_suppkey % 7 != 3
UNION ALL
SELECT DISTINCT 200000 + s_suppkey % 15 AS location_id, 7 AS locationtype_id
FROM supplier
UNION ALL
SELECT DISTINCT 300000 + s_suppkey % 25 AS location_id, 8 AS locationtype_id
FROM supplier
UNION ALL
SELECT DISTINCT 400000 + s_suppkey % 6 AS location_id, 1 AS locationtype_id
FROM supplier
"""

FIXTURE_SQL: dict[str, str] = {
    "user_user": _USER_USER,
    "widget_widgetuserapikey": _WIDGET,
    "user_partner": _USER_PARTNER,
    "user_site": _USER_SITE,
    "educator_classroom": _CLASSROOM,
    "educator_classroomlearnermembership": _MEMBERSHIP,
    "educator_classroom_educators": _EDUCATORS,
    "educator_classroominvitation": _INVITATION,
    "educator_classroominvitecode": _CLASSROOM_CODE,
    "user_partnerinvitecode": _PARTNER_CODE,
    "action_userjoinsaction": _JOIN_ACTION,
    "location_location": _LOCATION,
    "location_location_address_components": _ADDRESS_COMPONENTS,
    "location_location_types": _LOCATION_TYPES,
}

_BASE_TABLES = ("customer", "supplier", "nation", "part")


def register_fixture_views(spark: SparkSession, sf_dir: str) -> None:
    """Register testdata base views + all 14 derived raw-source views."""
    for t in _BASE_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    for name, sql in FIXTURE_SQL.items():
        spark.sql(sql).createOrReplaceTempView(name)


def fixture_cte_prefix() -> str:
    """`WITH a AS (...), b AS (...)` prefix for the DuckDB oracle."""
    parts = [f"{name} AS ({sql})" for name, sql in FIXTURE_SQL.items()]
    return "WITH " + ",\n".join(parts)
