"""DuckDB-dialect oracle SQL for the three reference models.

Each oracle = the shared fixture CTE prefix (fixtures.py — the SAME text
Spark executes) + an independent SQL re-statement of the model semantics
in DuckDB dialect. Dialect shims applied (SURVEY §5 "dialect shim"):

- ``SAFE.PARSE_DATE``            → ``try_cast(... AS DATE)``
- ``date_diff(a, b, year)``      → ``year(a) - year(b)`` (boundary count)
- ``format_date('%m%d', d)``     → ``strftime(d, '%m%d')``
- ``st_distance(st_geogpoint())``→ inline haversine (same formula and
  radius as functions.st_distance_meters, so both engines agree bitwise
  on the same double inputs)
- ``regexp_contains``            → ``regexp_matches``
- ``regexp_replace(... )``       → needs the ``'g'`` flag in DuckDB
- ``current_date``               → pinned ``DATE '<anchor>'``
- BigQuery QUALIFY               → DuckDB QUALIFY (supported natively)

ref: models/intermediate/stacked_users_partners.sql,
models/intermediate/locations_clean.sql, models/marts/user_base.sql.
"""

from __future__ import annotations

from oroboro_dw_dbt_spark.models.fixtures import fixture_cte_prefix
from oroboro_dw_dbt_spark.models.reference_models import ANCHOR_DATE


def _hav_miles(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2 * 6371008.8 * asin(sqrt("
        f"pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2))) / 1609.34"
    )


_ATTR_9 = """educator_id, learner_id, site_id, site_name, partner_id, partner_name,
partner_code, classroom_id, classroom_name, classroom_code"""

_STACKED_CTES = """
attributions AS (
  SELECT NULL AS educator_id, eclm.user_id AS learner_id,
         ec.site_id, us.name AS site_name,
         up.id AS partner_id, up.name AS partner_name, upic.code AS partner_code,
         ec.id AS classroom_id, ec.name AS classroom_name, ecic.code AS classroom_code
  FROM educator_classroomlearnermembership eclm
  LEFT JOIN educator_classroom ec ON ec.id = eclm.classroom_id
  LEFT JOIN user_site us ON ec.site_id = us.id
  LEFT JOIN user_partner up ON us.partner_id = up.id
  LEFT JOIN user_partnerinvitecode upic ON upic.partner_id = up.id
  LEFT JOIN educator_classroominvitecode ecic ON ecic.classroom_id = ec.id

  UNION ALL

  SELECT ece.user_id, NULL,
         ec.site_id, us.name,
         up.id, up.name, upic.code,
         ec.id, ec.name, ecic.code
  FROM educator_classroom_educators ece
  LEFT JOIN educator_classroom ec ON ece.classroom_id = ec.id
  LEFT JOIN user_site us ON ec.site_id = us.id
  LEFT JOIN user_partner up ON us.partner_id = up.id
  LEFT JOIN user_partnerinvitecode upic ON upic.partner_id = up.id
  LEFT JOIN educator_classroominvitecode ecic ON ecic.classroom_id = ec.id

  UNION ALL

  SELECT NULL, uu.id,
         ec.site_id, us.name,
         up.id, up.name, upic.code,
         ec.id, ec.name, ecic.code
  FROM educator_classroominvitation eci
  JOIN user_user uu
    ON lower(trim(uu.email)) = lower(trim(eci.email)) AND uu.type != 'IL'
  JOIN educator_classroom ec ON ec.id = eci.classroom_id
  LEFT JOIN user_site us ON ec.site_id = us.id
  LEFT JOIN user_partner up ON us.partner_id = up.id
  LEFT JOIN user_partnerinvitecode upic ON upic.partner_id = up.id
  LEFT JOIN educator_classroominvitecode ecic ON ecic.classroom_id = ec.id

  UNION ALL

  SELECT NULL, uu.id,
         upic.site_id, us.name,
         up.id, up.name, upic.code,
         NULL, NULL, NULL
  FROM action_userjoinsaction a
  JOIN user_user uu ON uu.id = a.user_id AND uu.type != 'IL'
  JOIN user_partnerinvitecode upic ON a.partner_invite_code_id = upic.id
  LEFT JOIN user_partner up ON up.id = upic.partner_id
  LEFT JOIN user_site us ON upic.site_id = us.id
  WHERE a.action_type = 'userjoins'
),
stacked_final AS (
  SELECT educator_id AS user_id, partner_id, partner_name, partner_code,
         classroom_id, classroom_name, classroom_code, site_id, site_name
  FROM attributions WHERE educator_id IS NOT NULL
  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9

  UNION ALL

  SELECT learner_id, partner_id, partner_name, partner_code,
         classroom_id, classroom_name, classroom_code, site_id, site_name
  FROM attributions WHERE learner_id IS NOT NULL
  GROUP BY 1, 2, 3, 4, 5, 6, 7, 8, 9
)
"""

_DIST = _hav_miles("city.latitude", "city.longitude", "fl.latitude", "fl.longitude")

_LOCATIONS_CTES = f"""
location_components AS (
  SELECT llac.from_location_id, tl.id AS to_location_id, tl.display_name,
         tl.long_name, tl.latitude, tl.longitude, t.locationtype_id
  FROM location_location_address_components llac
  JOIN location_location tl ON llac.to_location_id = tl.id
  JOIN location_location_types t ON llac.to_location_id = t.location_id
  WHERE t.locationtype_id IN (1, 3, 4, 7, 8)

  UNION ALL

  SELECT fl.id, fl.id, fl.display_name, fl.long_name,
         fl.latitude, fl.longitude, t.locationtype_id
  FROM location_location fl
  JOIN location_location_types t ON fl.id = t.location_id
  WHERE t.locationtype_id IN (1, 3, 4, 7, 8)
),
multi AS (
  SELECT from_location_id
  FROM location_components
  WHERE locationtype_id IN (3, 4) AND from_location_id != to_location_id
  GROUP BY from_location_id
  HAVING count(DISTINCT display_name) > 1
),
city_candidates AS (
  SELECT fl.id AS from_location_id, city.to_location_id,
         city.display_name AS city,
         city.latitude AS city_latitude, city.longitude AS city_longitude,
         fl.display_name AS original_locale,
         fl.latitude AS og_latitude, fl.longitude AS og_longitude,
         {_DIST} AS distance_from_origin
  FROM multi
  JOIN location_location fl ON fl.id = multi.from_location_id
  JOIN location_components city
    ON city.from_location_id = fl.id AND city.locationtype_id IN (3, 4)
  WHERE fl.latitude IS NOT NULL AND fl.longitude IS NOT NULL
    AND city.latitude IS NOT NULL AND city.longitude IS NOT NULL
),
replace_cte AS (
  SELECT from_location_id,
         CASE WHEN distance_from_origin > 10
                AND NOT regexp_matches(lower(original_locale), '\\d{{1,5}}\\s+\\w+')
                AND NOT regexp_matches(lower(original_locale), '^[0-9a-z]{{4}}\\+[0-9a-z]{{2,}}')
                AND NOT regexp_matches(lower(original_locale), '\\bst\\b|\\bave\\b|\\brd\\b|\\bdr\\b|\\bln\\b')
                AND NOT lower(original_locale) LIKE '%county%'
              THEN original_locale ELSE city END AS city_replace,
         CASE WHEN distance_from_origin > 10 THEN og_latitude
              ELSE city_latitude END AS city_latitude_replace,
         CASE WHEN distance_from_origin > 10 THEN og_longitude
              ELSE city_longitude END AS city_longitude_replace
  FROM city_candidates
  QUALIFY row_number() OVER (
    PARTITION BY from_location_id
    ORDER BY distance_from_origin ASC, to_location_id ASC) = 1
),
best_country AS (
  SELECT from_location_id, display_name, long_name
  FROM location_components WHERE locationtype_id = 1
  QUALIFY row_number() OVER (
    PARTITION BY from_location_id ORDER BY to_location_id) = 1
),
best_state AS (
  SELECT from_location_id, display_name
  FROM location_components WHERE locationtype_id = 7
  QUALIFY row_number() OVER (
    PARTITION BY from_location_id ORDER BY to_location_id) = 1
),
best_county AS (
  SELECT from_location_id, display_name
  FROM location_components WHERE locationtype_id = 8
  QUALIFY row_number() OVER (
    PARTITION BY from_location_id ORDER BY to_location_id) = 1
),
best_city AS (
  SELECT from_location_id, display_name, latitude, longitude
  FROM location_components WHERE locationtype_id IN (3, 4)
  QUALIFY row_number() OVER (
    PARTITION BY from_location_id ORDER BY to_location_id) = 1
),
loc_flat AS (
  SELECT fl.id AS from_location_id,
         fl.display_name AS original_locale,
         CASE WHEN rp.city_replace IS NOT NULL THEN rp.city_replace
              WHEN ty.locationtype_id = 1 THEN NULL
              WHEN bci.display_name IS NOT NULL THEN bci.display_name
              WHEN fl.display_name = 'Seoul' THEN fl.display_name
              ELSE NULL END AS city,
         coalesce(rp.city_latitude_replace, bci.latitude, fl.latitude) AS city_latitude,
         coalesce(rp.city_longitude_replace, bci.longitude, fl.longitude) AS city_longitude,
         bco.display_name AS county,
         CASE WHEN ty.locationtype_id = 1 THEN NULL
              WHEN bst.display_name = bcn.long_name THEN NULL
              WHEN bst.display_name IS NOT NULL THEN bst.display_name
              ELSE NULL END AS state,
         bcn.long_name AS country,
         fl.latitude AS latitude, fl.longitude AS longitude
  FROM location_location fl
  LEFT JOIN replace_cte rp ON fl.id = rp.from_location_id
  LEFT JOIN best_county bco ON fl.id = bco.from_location_id
  LEFT JOIN best_state bst ON fl.id = bst.from_location_id
  LEFT JOIN best_country bcn ON fl.id = bcn.from_location_id
  LEFT JOIN location_location_types ty ON fl.id = ty.location_id
  LEFT JOIN best_city bci ON fl.id = bci.from_location_id
),
loc_scored AS (
  SELECT loc_flat.*,
         (CASE WHEN city IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN city_latitude IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN city_longitude IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN county IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN state IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN country IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN latitude IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN longitude IS NOT NULL THEN 1 ELSE 0 END) AS score
  FROM loc_flat
  WHERE latitude IS NOT NULL AND longitude IS NOT NULL
),
locations_final AS (
  -- float-output quantization mirrored from locations_clean_df: round the
  -- two double outputs to 6 dp on both engines (value-preserving — fixture
  -- lat/lon are exact dyadic rationals, see fixtures.py)
  SELECT from_location_id, original_locale, city, county, state, country,
         ROUND(city_latitude, 6) AS city_latitude,
         ROUND(city_longitude, 6) AS city_longitude
  FROM loc_scored
  -- tiebreak deviation mirrored from reference_models.locations_clean_df:
  -- the reference orders by score DESC only; both engines pin the same
  -- total order over the output columns so tied rows resolve identically
  QUALIFY row_number() OVER (
    PARTITION BY from_location_id
    ORDER BY score DESC,
             city ASC NULLS LAST,
             state ASC NULLS LAST,
             county ASC NULLS LAST,
             country ASC NULLS LAST,
             city_latitude ASC NULLS LAST,
             city_longitude ASC NULLS LAST) = 1
)
"""


def _users_cte(anchor: str) -> str:
    birth_date = (
        "try_cast(substr(uu.birthday, 4, 4) || '-'"
        " || substr(uu.birthday, 1, 2) || '-01' AS DATE)"
    )
    return f"""
users AS (
  SELECT
    uu.id AS user_id,
    uu.uuid,
    uu.first_name,
    uu.last_name,
    uu.email,
    uu.type AS user_type,
    CASE WHEN w.id IS NOT NULL THEN 'Widget Account'
         WHEN uu.type = 'E' THEN 'Advisors'
         WHEN uu.type = 'CL' THEN 'Cohort Learners'
         WHEN uu.type = 'IL' THEN 'Independent Learners' END AS user_type_full_name,
    CASE WHEN regexp_replace(lower(trim(uu.first_name)), '\\s+', '', 'g') LIKE '%test%'
           OR regexp_replace(lower(trim(uu.last_name)), '\\s+', '', 'g') LIKE '%test%'
           OR regexp_replace(lower(trim(uu.email)), '\\s+', '', 'g') LIKE '%test%'
           OR uu.email LIKE 'educatorst1@example.com'
         THEN true ELSE false END AS is_test_user,
    uu.race_ethnicity,
    CASE
      WHEN lower(uu.race_ethnicity) LIKE '%prefer not to say%'
           OR uu.race_ethnicity IS NULL THEN 'Prefer Not To Say'
      WHEN ((CASE WHEN uu.race_ethnicity LIKE '%White%' THEN 1 ELSE 0 END)
          + (CASE WHEN uu.race_ethnicity LIKE '%Hispanic%'
                    OR uu.race_ethnicity LIKE '%Latinx%' THEN 1 ELSE 0 END)
          + (CASE WHEN uu.race_ethnicity LIKE '%Black%'
                    OR uu.race_ethnicity LIKE '%African American%' THEN 1 ELSE 0 END)
          + (CASE WHEN uu.race_ethnicity LIKE '%South Asian%'
                    OR uu.race_ethnicity LIKE '%East Asian%' THEN 1 ELSE 0 END)
          + (CASE WHEN uu.race_ethnicity LIKE '%Native Hawaiian or other Pacific Islander%' THEN 1 ELSE 0 END)
          + (CASE WHEN uu.race_ethnicity LIKE '%Native American or Alaska Native' THEN 1 ELSE 0 END)
          + (CASE WHEN uu.race_ethnicity LIKE '%Other%' THEN 1 ELSE 0 END)) > 1
        THEN 'Multiracial'
      WHEN uu.race_ethnicity LIKE 'Hispanic or Latinx' THEN 'Hispanic'
      WHEN uu.race_ethnicity LIKE 'Black or African American' THEN 'Black'
      WHEN uu.race_ethnicity LIKE '%South Asian%'
           OR uu.race_ethnicity LIKE '%East Asian%' THEN 'Asian'
      WHEN uu.race_ethnicity LIKE 'Native Hawaiian or other Pacific Islander'
        THEN 'Native Hawaiian or other Pacific Islander'
      WHEN uu.race_ethnicity LIKE 'Native American or Alaska Native'
        THEN 'Native American or Alaska Native'
      WHEN uu.race_ethnicity LIKE 'White' THEN 'White'
      WHEN uu.race_ethnicity LIKE 'Other' THEN 'Other'
      ELSE 'Other' END AS race,
    uu.gender,
    uu.self_describe_gender,
    CASE
      WHEN uu.gender LIKE '%Prefer not to say%' OR uu.gender IS NULL THEN 'Prefer Not To Say'
      WHEN uu.gender LIKE '%Prefer to self-describe%' THEN 'Prefer Not To Say'
      WHEN uu.gender LIKE '%Man%' AND uu.gender LIKE '%Woman%' THEN 'Prefer Not To Say'
      WHEN uu.gender LIKE '%Man%' THEN 'Man'
      WHEN uu.gender LIKE '%Woman%' THEN 'Woman'
      ELSE 'Non-binary' END AS gender_sum,
    uu.date_joined,
    uu.is_active,
    CASE WHEN uu.is_active = false THEN 'deactivated' ELSE 'active' END AS account_status,
    uu.is_staff,
    CASE WHEN uu.birthday IS NULL THEN NULL
         ELSE (year(DATE '{anchor}') - year({birth_date}))
              - CASE WHEN strftime(DATE '{anchor}', '%m%d')
                          < substr(uu.birthday, 1, 2) || '01'
                     THEN 1 ELSE 0 END END AS age,
    uu.location_id
  FROM user_user uu
  LEFT JOIN widget_widgetuserapikey w ON w.user_id = uu.id
)
"""


def stacked_users_partners_oracle() -> str:
    return (
        f"{fixture_cte_prefix()},\n{_STACKED_CTES}\n"
        "SELECT * FROM stacked_final"
    )


def locations_clean_oracle() -> str:
    return (
        f"{fixture_cte_prefix()},\n{_LOCATIONS_CTES}\n"
        "SELECT * FROM locations_final"
    )


def user_base_oracle(anchor: str = ANCHOR_DATE) -> str:
    return f"""{fixture_cte_prefix()},
{_STACKED_CTES},
{_LOCATIONS_CTES},
{_users_cte(anchor)}
SELECT
  users.*,
  coalesce(loc.country, 'Prefer Not To Say') AS country,
  coalesce(loc.state, 'Prefer Not To Say') AS state,
  coalesce(loc.county, 'Prefer Not To Say') AS county,
  coalesce(loc.city, 'Prefer Not To Say') AS city,
  loc.city_latitude,
  loc.city_longitude,
  upf.partner_id,
  CASE
    WHEN upf.partner_name IS NULL AND users.user_type = 'CL'
      THEN 'No Partner associated with this account'
    WHEN upf.partner_name IS NULL AND users.user_type = 'E'
      THEN 'No Partner associated with this account'
    WHEN users.user_type = 'IL' THEN NULL
    ELSE upf.partner_name END AS partner_name,
  upf.partner_code,
  upf.classroom_id,
  upf.classroom_name,
  upf.classroom_code,
  upf.site_id,
  upf.site_name
FROM users
LEFT JOIN stacked_final upf ON users.user_id = upf.user_id
LEFT JOIN locations_final loc ON users.location_id = loc.from_location_id
"""
