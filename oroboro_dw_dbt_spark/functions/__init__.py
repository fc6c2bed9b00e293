from oroboro_dw_dbt_spark.functions.bq_compat import (  # noqa: F401
    age_from_mm_yyyy,
    bq_date_diff_year,
    coalesce_trim,
    format_date_mmdd,
    safe_parse_date,
    st_distance_meters,
    st_distance_meters_geodesic,
)
