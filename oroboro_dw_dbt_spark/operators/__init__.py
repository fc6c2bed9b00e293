from oroboro_dw_dbt_spark.operators.catalog import QUERIES, QuerySpec, oracle_sql_map, queries_map, query  # noqa: F401

# Importing these modules populates the catalog.
from oroboro_dw_dbt_spark.operators import (  # noqa: F401,E402
    analytics_suite,
    events_suite,
    extended_suite,
    pipeline_suite,
    reference_suite,
    relational,
    scalar,
    scale_suite,
    tpch_suite,
    training_suite,
)
